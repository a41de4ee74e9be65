import numpy as np
import pyarrow as pa
import pytest

from geotrellis_contrib_ray.stages.joins import bucketed_hash_join, native_hash_join


def _sides():
    import ray.data as rd

    rng = np.random.default_rng(5)
    left = pa.table(
        {
            "k": rng.integers(0, 500, 5000).astype(np.int64),
            "v": np.arange(5000, dtype=np.int64),
        }
    )
    right = pa.table(
        {
            "k": np.arange(500, dtype=np.int64),
            "w": (np.arange(500, dtype=np.int64) * 10),
        }
    )
    return rd.from_arrow(left), rd.from_arrow(right), left, right


def test_bucketed_join_matches_pandas(ray_session):
    lds, rds, lt, rt = _sides()
    got = (
        bucketed_hash_join(lds, rds, on="k", buckets=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        lt.to_pandas()
        .merge(rt.to_pandas(), on="k")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert got[["k", "v", "w"]].astype(np.int64).equals(exp[["k", "v", "w"]].astype(np.int64))


def test_native_join_same_result(ray_session):
    lds, rds, lt, rt = _sides()
    got = (
        native_hash_join(lds, rds, on="k", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        lt.to_pandas().merge(rt.to_pandas(), on="k").sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert got[["k", "v", "w"]].astype(np.int64).equals(exp[["k", "v", "w"]].astype(np.int64))


def test_bucketed_join_preserves_dtypes(ray_session):
    """Regression: the pandas per-bucket merge used to null-pad int64 columns
    and hand back float64 (the order_lineitem_join driver hash-fail)."""
    lds, rds, _, _ = _sides()
    out = bucketed_hash_join(lds, rds, on="k", buckets=8).to_pandas()
    assert out["v"].dtype == np.int64
    assert out["w"].dtype == np.int64


def test_asof_join_float_right_value(ray_session):
    """Regression: asof_join hardcoded int64 null-padding; a float right
    value column must survive with its own dtype."""
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import asof_join

    left = rd.from_arrow(
        pa.table({"u": [1, 1, 2], "t": [10, 20, 15]})
    )
    right = rd.from_arrow(
        pa.table({"u": [1, 1, 2], "t": [5, 18, 3], "score": [0.5, 1.5, 2.5]})
    )
    out = (
        asof_join(left, right, by="u", on="t", right_value="score", buckets=4)
        .to_pandas()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    assert out["score"].dtype == np.float64
    assert out["score"].tolist() == [0.5, 1.5, 2.5]


def test_shared_column_guard(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"k": [1], "x": [1]}))
    b = rd.from_arrow(pa.table({"k": [1], "x": [2]}))
    with pytest.raises(ValueError, match="rename shared"):
        bucketed_hash_join(a, b, on="k")
