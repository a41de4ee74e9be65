"""Randomized adversarial parity for the embeddings-family queries: exact
duplicate vectors (cosine ties, broken by id), negated vectors, tiny
norms, duplicated QUERY vectors — run through the real
queries()/oracle_sql() surface on a tmp embeddings.parquet."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = ["ann_cosine", "ann_rank", "ann_lsh", "ann_ivf",
           "embedding_neardup", "label_centroids", "kmeans_embed"]


def _embeddings(seed: int, n: int = 400, d: int = 64) -> pa.Table:
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 1, (n, d))
    # exact duplicates of the first query vector (cosine == 1 rank ties)
    dup = rng.random(n) < 0.06
    v[dup] = v[0]
    # negations (cosine == -1) and tiny norms
    neg = (~dup) & (rng.random(n) < 0.05)
    v[neg] = -v[1]
    tiny = (~dup) & (~neg) & (rng.random(n) < 0.04)
    v[tiny] *= 1e-3
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(v.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, n).astype(np.int32)),
    })


@pytest.mark.parametrize("seed", [13, 31])
def test_embeddings_family_random_parity(ray_session, seed, tmp_path):
    import duckdb

    import __ray_entry__ as e

    t = _embeddings(seed)
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
    for name in QUERIES:
        r = e.queries()[name](sf)
        got = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
        exp = con.execute(e.oracle_sql()[name]).df()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        exp = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        assert got.shape == exp.shape, f"{name}: {got.shape} vs {exp.shape}"
        for c in cols:
            gv, ev = got[c].to_numpy(), exp[c].to_numpy()
            if gv.dtype.kind == "O" or ev.dtype.kind == "O":
                assert (gv.astype(object) == ev.astype(object)).all(), f"{name}.{c}"
            elif gv.dtype.kind == "f" or ev.dtype.kind == "f":
                assert np.array_equal(gv.astype(np.float64),
                                      ev.astype(np.float64),
                                      equal_nan=True), f"{name}.{c}"
            else:
                assert (gv.astype(np.int64) == ev.astype(np.int64)).all(), \
                    f"{name}.{c}"
