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
