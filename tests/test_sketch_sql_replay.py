"""Property tests for the generated sketch-replay SQL (pipelines/query_defs):
the DuckDB CTE chains must reproduce the numpy sketch kernels bit-for-bit on
RANDOM ASCII corpora — not just the driver's fixture tables.  Pure
DuckDB+numpy (no Ray session), so regressions in the generators surface in
seconds.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geotrellis_contrib_ray.pipelines.query_defs import (
    embedding_lsh_cte,
    minhash_bands_cte,
    quantized_embed_cte,
    quantized_score_sql,
    simhash_cte,
)
from geotrellis_contrib_ray.stages.ann import SCORE_SCALE, _quantized_scores
from geotrellis_contrib_ray.stages.dedup import (
    MinHashLSH,
    SimHash,
    integer_planes,
    quantize_embeddings,
)


def _random_corpus(seed: int, n: int = 40) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yz", "", "Qr7!",
             "the quick", "lazy-dog", "42", "#@%"]
    texts = []
    for _ in range(n):
        k = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(vocab, size=k)) if k else "")
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_minhash_bands_cte_matches_sketcher(seed):
    t = _random_corpus(seed)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    o = con.execute(
        f"WITH {minhash_bands_cte()} SELECT doc_id, band_id, band_hash "
        "FROM mh_bands ORDER BY doc_id, band_id").df()
    r = MinHashLSH()(t).to_pandas().sort_values(
        ["doc_id", "band_id"]).reset_index(drop=True)
    assert len(r) == len(o)
    assert (r["doc_id"].values == o["doc_id"].values).all()
    assert (r["band_hash"].values == o["band_hash"].values.astype(np.int64)).all()


@pytest.mark.parametrize("seed", [3, 11])
def test_simhash_cte_matches_sketcher(seed):
    t = _random_corpus(seed)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    o = con.execute(
        f"WITH {simhash_cte()} SELECT doc_id, h FROM sh_sig ORDER BY doc_id").df()
    r = SimHash()(t).to_pandas()
    r = r[r["sh_valid"]].sort_values("doc_id").reset_index(drop=True)
    assert len(r) == len(o)
    assert (r["simhash"].values == o["h"].values.astype(np.int64)).all()


def _random_embeddings(seed: int, n: int = 50, dim: int = 16) -> pa.Table:
    rng = np.random.default_rng(seed)
    emb = (rng.standard_normal((n, dim)) * 0.4).astype(np.float32)
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": pa.array([row for row in emb])})


@pytest.mark.parametrize("seed", [5, 19])
def test_embedding_lsh_cte_matches_quantized_buckets(seed):
    t = _random_embeddings(seed)
    dim = 16
    con = duckdb.connect()
    con.register("embeddings", t.to_pandas())
    o = con.execute(
        f"WITH {embedding_lsh_cte(dim=dim, n_planes=5, n_bands=3)} "
        "SELECT vec_id, band, bucket FROM el_buckets ORDER BY vec_id, band").df()
    emb = np.stack([np.asarray(x, np.float64) for x in t["embedding"].to_pylist()])
    q = quantize_embeddings(emb)
    planes = integer_planes(dim, 5, 3)
    weights = 1 << np.arange(5, dtype=np.int64)
    for b, mat in enumerate(planes):
        mine = ((q @ mat) > 0).astype(np.int64) @ weights
        got = o[o["band"] == b].sort_values("vec_id")["bucket"].values.astype(np.int64)
        assert (mine == got).all(), f"band {b} bucket mismatch"


def test_quantized_score_sql_matches_python():
    rng = np.random.default_rng(2)
    emb = (rng.standard_normal((30, 8)) * 0.5).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(30, dtype=np.int64)),
                  "embedding": pa.array([row for row in emb])})
    con = duckdb.connect()
    con.register("embeddings", t.to_pandas())
    score = quantized_score_sql("d.dot", "nq.d", "nv.d")
    o = con.execute(f"""
WITH {quantized_embed_cte()},
el_n AS (SELECT vec_id, SUM(q * q) AS d FROM el_q GROUP BY vec_id),
ann_dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, SUM(a.q * b.q) AS dot
  FROM el_q a JOIN el_q b ON b.i = a.i WHERE a.vec_id < 3 GROUP BY 1, 2)
SELECT d.query_id, d.vec_id, {score} AS score
FROM ann_dots d
JOIN el_n nq ON nq.vec_id = d.query_id
JOIN el_n nv ON nv.vec_id = d.vec_id
ORDER BY 1, 2""").df()
    q = quantize_embeddings(emb.astype(np.float64))
    d = (q * q).sum(axis=1)
    for qi in range(3):
        dots = q @ q[qi]
        mine = _quantized_scores(dots, d, int(d[qi]))
        got = o[o["query_id"] == qi].sort_values("vec_id")["score"].values.astype(np.int64)
        assert (mine == got).all()


def test_minhash_sketcher_vs_naive_python_ints():
    """Independent-reference check (defends against a bug shared by the
    vectorized kernel AND its SQL twin through their common constants):
    recompute shingle hashes and signatures with plain python ints."""
    sk = MinHashLSH(num_perm=8, bands=4, shingle_k=5)
    texts = ["hello world, hello", "abcdefgh", "xy", "aaaaa aaaaa"]
    from geotrellis_contrib_ray.stages.dedup import _shingle_hashes

    arrs = _shingle_hashes(pa.array(texts, pa.string()), 5)
    M64 = 1 << 64
    for t, got in zip(texts, arrs):
        raw = t.encode()
        naive = []
        for i in range(max(0, len(raw) - 4)):
            acc = 0
            for b in raw[i:i + 5]:
                acc = (acc * 1000003 + b) % M64
            naive.append(acc)
        assert [int(x) for x in got] == naive, t
    MERS = (1 << 61) - 1
    sigs = sk._signatures([a for a in arrs if len(a)])
    k = 0
    for a in arrs:
        if not len(a):
            continue
        for p in range(8):
            expect = min((((int(sk.a[p]) * int(x)) % M64 + int(sk.b[p])) % M64) % MERS
                         for x in a)
            assert int(sigs[k][p]) == expect
        k += 1


def test_simhash_vs_naive_python():
    from geotrellis_contrib_ray.stages.dedup import SimHash, _shingle_hashes

    texts = ["the quick brown fox", "zzzz", "a b a b a b"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = SimHash()(t)
    arrs = _shingle_hashes(pa.array(texts, pa.string()), 4)
    for i, sh in enumerate(arrs):
        if not len(sh):
            continue
        votes = [0] * 64
        for x in sh:
            for j in range(64):
                votes[j] += 1 if (int(x) >> j) & 1 else -1
        expect = sum(1 << j for j in range(64) if votes[j] > 0)
        got = int(out["simhash"][i].as_py()) & ((1 << 64) - 1)
        assert got == expect, i
