"""Randomized adversarial parity for the relational (orders / lineitem /
customer) queries: a hot orderkey with hundreds of lineitems, orders with
no lineitems, orphan lineitems, orders whose custkey has no customer,
negative / zero / halfway-cent prices, sparse shuffled huge keys — run
through the real queries()/oracle_sql() surface on tmp parquet tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = [
    "lineitem_pricing", "price_histogram", "orders_by_segment",
    "order_lineitem_join", "orders_left_join", "orders_no_lineitem",
    "customer_order_totals", "skew_join", "semi_bloom",
    "quantile_price", "quantile_price_cont", "graph_rank",
]

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD"]
FLAGS = ["A", "N", "R"]


def _prices(rng, n):
    """Adversarial doubles: negatives, zeros, halfway cents, tiny, large."""
    p = rng.uniform(-500.0, 50_000.0, n)
    p[rng.random(n) < 0.05] = 0.0
    half = rng.random(n) < 0.1
    p[half] = np.round(p[half]) + 0.005
    p[rng.random(n) < 0.02] = 9_999_999.99
    return p


def _tables(seed: int):
    rng = np.random.default_rng(seed)
    n_c, n_o, n_l = 150, 1200, 4000
    custkey = rng.permutation(np.arange(1, 4 * n_c, 4))[:n_c].astype(np.int64)
    customer = pa.table({
        "c_custkey": pa.array(custkey),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_c), pa.string()),
    })
    # sparse, shuffled, huge orderkeys; ~10% of orders reference a custkey
    # that does NOT exist (chain joins must drop them on both engines)
    okey = rng.permutation(
        rng.choice(np.arange(1, 1 << 40, 997, dtype=np.int64), n_o,
                   replace=False))
    ocust = rng.choice(custkey, n_o)
    orphan_cust = rng.random(n_o) < 0.1
    ocust[orphan_cust] = 2  # never a real custkey (keys are 1 mod 4)
    orders = pa.table({
        "o_orderkey": pa.array(okey),
        "o_custkey": pa.array(ocust),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_o), pa.string()),
        "o_totalprice": pa.array(np.abs(_prices(rng, n_o))),
    })
    # lineitems: one HOT orderkey owns ~10%; ~5% orphans (no such order);
    # ~25% of orders get NO lineitems (anti-join / left-join rows)
    lkey = rng.choice(okey[: (3 * n_o) // 4], n_l).astype(np.int64)
    lkey[rng.random(n_l) < 0.10] = okey[0]
    lkey[rng.random(n_l) < 0.05] = np.int64(12345)  # orphan, not an orderkey
    # suppliers: small domain with a HOT supplier (~15% of lines) — the
    # co-order graph gets a hub node for graph_rank
    skey = rng.choice(np.arange(0, 37, dtype=np.int64), n_l)
    skey[rng.random(n_l) < 0.15] = np.int64(7)
    lineitem = pa.table({
        "l_orderkey": pa.array(lkey),
        "l_suppkey": pa.array(skey),
        "l_extendedprice": pa.array(_prices(rng, n_l)),
        "l_quantity": pa.array(np.abs(_prices(rng, n_l)) % 50.0),
        "l_discount": pa.array(rng.uniform(0.0, 0.1, n_l)),
        "l_returnflag": pa.array(rng.choice(FLAGS, n_l), pa.string()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_l), pa.string()),
    })
    return customer, orders, lineitem


@pytest.mark.parametrize("seed", [3, 29])
def test_relational_family_random_parity(ray_session, seed, tmp_path):
    import duckdb

    import __ray_entry__ as e

    customer, orders, lineitem = _tables(seed)
    sf = str(tmp_path)
    pq.write_table(customer, f"{sf}/customer.parquet")
    pq.write_table(orders, f"{sf}/orders.parquet")
    pq.write_table(lineitem, f"{sf}/lineitem.parquet")
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
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
