"""Randomized adversarial parity for the event-family queries: hot users,
heavy timestamp ties, negative values, single-event users — spilled to a
tmp events.parquet and run through the REAL queries()/oracle_sql() pair,
i.e. the exact surface the driver grades, on layouts the generator-made
testdata never produces."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = ["window_funcs", "moving_stats", "funnel_stages",
           "cohort_retention", "user_actions_outer", "user_paths",
           "user_first_last", "event_windows", "sessionize",
           "sliding_windows", "window_distinct", "asof_join",
           "interval_join", "interval_join_bucketed"]


def _random_events(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    # one hot user owns ~30% of rows; a band of single-event users
    uid = rng.integers(0, 120, n).astype(np.int64)
    uid[rng.random(n) < 0.3] = 7
    uid[:40] = np.arange(1000, 1040)  # 40 singleton users
    day = 86_400_000_000
    ts = rng.integers(0, 5 * day, n)
    ts = (ts // 1_000_000) * 1_000_000  # second-resolution -> heavy ties
    return pa.table({
        "event_id": pa.array(rng.permutation(n).astype(np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(uid),
        "event_type": pa.array(
            rng.choice(["view", "click", "purchase", "signup", "error"], n),
            pa.string()),
        "value": pa.array(rng.uniform(-5.0, 5.0, n)),
        "props": pa.array(["{}"] * n, pa.string()),
    })


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_event_family_random_parity(ray_session, seed, tmp_path):
    import duckdb

    import __ray_entry__ as e

    t = _random_events(seed)
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
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
            if gv.dtype.kind == "O":
                assert (gv == ev).all(), f"{name}.{c}"
            elif gv.dtype.kind == "f" or ev.dtype.kind == "f":
                assert np.array_equal(gv.astype(np.float64),
                                      ev.astype(np.float64),
                                      equal_nan=True), f"{name}.{c}"
            else:
                assert (gv.astype(np.int64) == ev.astype(np.int64)).all(), \
                    f"{name}.{c}"
