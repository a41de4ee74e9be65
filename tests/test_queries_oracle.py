"""Driver-contract mirror: run every queries() entry against its oracle_sql()
via DuckDB on the same parquet dir, compare row counts + sorted values.

This is the same comparison the external driver performs at sf0.01; here we
run at sf0.001 for speed (values are scale-independent logic).
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# queries that need a bigger sf to produce rows (none currently)
SF_OVERRIDE: dict[str, str] = {}


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical column order + sort.  Deliberately does NOT coerce float to
    int (or vice versa): the external driver hashes values dtype-sensitively,
    so an int64 column that comes back float64 must FAIL here too.  Only
    width/signedness within the integer family is normalized."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.unsignedinteger):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _query_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    sf_dir = SF_OVERRIDE.get(name, SF_DIR)
    got = _normalize(_to_pandas(e.queries()[name](sf_dir)))
    exp = _normalize(_oracle(e.oracle_sql()[name], sf_dir))
    if name in SF_OVERRIDE:
        assert len(exp) > 0, f"{name}: oracle empty even at override sf"
    assert list(got.columns) == list(exp.columns), f"{name}: columns {got.columns} vs {exp.columns}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        # dtype-kind parity is part of the driver's hash check: an int64
        # oracle column vs a float64 Ray column is a FAIL even if values match
        assert np.issubdtype(got[c].dtype, np.floating) == np.issubdtype(
            exp[c].dtype, np.floating
        ), f"{name}: column {c} dtype kind {got[c].dtype} vs oracle {exp[c].dtype}"
        if np.issubdtype(got[c].dtype, np.floating):
            assert np.allclose(got[c], exp[c].astype(np.float64), rtol=0, atol=0), (
                f"{name}: column {c} differs (exact float compare)"
            )
        else:
            assert got[c].tolist() == exp[c].tolist(), f"{name}: column {c} differs"


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    qs = e.queries()
    orc = e.oracle_sql()
    for name in set(qs) - set(orc):
        df = _to_pandas(qs[name](SF_DIR))
        assert len(df) >= 0 and len(df.columns) > 0, name


def test_entry_runs(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert set(df.columns) == {"zone_name", "parent_cell", "n_spans"}
