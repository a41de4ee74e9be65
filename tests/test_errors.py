import numpy as np
import pyarrow as pa

from geotrellis_contrib_ray.stages.errors import quarantine_map_batches, split_quarantine


def test_quarantine_isolates_poison_rows(ray_session):
    import ray.data as rd

    # defined inside the test so cloudpickle ships it by value (workers can't
    # import the tests package)
    def poisoned_fn(batch: pa.Table) -> pa.Table:
        vals = batch["v"].to_numpy(zero_copy_only=False)
        if np.any(vals % 97 == 13):  # poison rows: v ≡ 13 (mod 97)
            raise ValueError("poison value")
        return batch.append_column("double", pa.array(vals * 2))

    n = 2000
    ds = rd.from_arrow(pa.table({"v": np.arange(n, dtype=np.int64)}))
    out = quarantine_map_batches(ds, poisoned_fn)
    clean, poison = split_quarantine(out)
    cdf = clean.to_pandas().sort_values("v").reset_index(drop=True)
    pdf = poison.to_pandas().sort_values("v").reset_index(drop=True)
    expected_poison = [v for v in range(n) if v % 97 == 13]
    assert pdf["v"].tolist() == expected_poison
    assert pdf["error"].str.contains("poison value").all()
    assert pdf["double"].isna().all()  # fn outputs nulled for quarantined rows
    assert len(cdf) == n - len(expected_poison)
    assert (cdf["double"] == cdf["v"] * 2).all()


def test_quarantine_clean_batch_single_call(ray_session):
    import ray.data as rd

    calls = {"n": 0}

    def counting(batch: pa.Table) -> pa.Table:
        calls["n"] += 1
        return batch

    ds = rd.from_arrow(pa.table({"v": np.arange(100, dtype=np.int64)}))
    out = quarantine_map_batches(ds, counting)
    df = out.to_pandas()
    assert len(df) == 100 and df["error"].isna().all()


def test_quarantine_poison_first_keeps_transformed_types(ray_session):
    """Regression (ADVICE r2): when fn TRANSFORMS a column's dtype and the
    first emitted part is a poison slice (input-typed), the type union must
    still come from the SUCCESS parts — good rows' transformed values were
    being nulled out when bisect order put a poison part first."""
    import pyarrow.compute as pc
    import ray.data as rd

    from geotrellis_contrib_ray.stages.errors import (
        quarantine_map_batches,
        split_quarantine,
    )

    # poison rows FIRST so the first bisected part that survives is poison
    t = pa.table({"v": pa.array(["boom", "boom", "1", "2", "3", "4"], pa.string())})

    def to_int(b: pa.Table) -> pa.Table:
        vals = [int(x) for x in b["v"].to_pylist()]  # raises on "boom"
        return pa.table({"v": pa.array(vals, pa.int64())})

    ds = rd.from_arrow(t).repartition(1)
    out = quarantine_map_batches(ds, to_int)
    clean, poison = split_quarantine(out)
    got = clean.to_pandas().sort_values("v").reset_index(drop=True)
    # the union type must be the SUCCESS type (int64) and values intact
    assert got["v"].tolist() == [1, 2, 3, 4]
    assert poison.count() == 2


def test_quarantine_all_poison_keeps_input(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.stages.errors import quarantine_map_batches

    t = pa.table({"v": pa.array(["a", "b"], pa.string())})

    def boom(b: pa.Table) -> pa.Table:
        raise RuntimeError("nope")

    out = quarantine_map_batches(rd.from_arrow(t), boom).to_pandas()
    assert out["v"].tolist() == ["a", "b"]
    assert out["error"].notna().all()
