"""Skew handling: explicit salting for hot keys in wide operations.

North-star requirement: "groupby-aggregate shuffles on cell keys with
explicit salting for skewed hot cells".  Two layers:

1. Associative *aggregations* (count/sum/min/max) are already skew-immune
   here because every wide op is fed by an in-batch partial aggregation —
   a hot key contributes ONE row per block to the shuffle regardless of its
   row count (see stages/spatial.py).

2. Associative *group reductions* that go through ``map_groups`` (keep-first,
   merge-reduce) get the salted two-phase below: phase 1 reduces
   (key, salt) sub-groups — a hot key's rows split across ``salt_buckets``
   reducers — phase 2 reduces the <= salt_buckets partials per key.
   Requires the reduce to be associative + commutative across sub-groups
   (the caller asserts this by choosing this path).

``detect_hot_keys`` gives the cheap pre-pass: per-batch partial counts ->
tiny groupby -> keys above a threshold; cold keys can skip the salt (salt=0)
so phase 2 is a near-no-op for them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def detect_hot_keys(ds, keys: list[str], threshold: int) -> set:
    """Cheap skew census: partial per-batch counts, tiny final groupby,
    return the key tuples whose total count exceeds ``threshold``."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys).group_by(keys, use_threads=False).aggregate(
            [(keys[0], "count")]
        )
        return g.rename_columns(keys + ["pcnt"])

    from .agg import salted_group_reduce

    counts = salted_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        keys, [("pcnt", "sum", "n")],
    ).to_pandas()
    hot = counts[counts["n"] > threshold]
    if len(keys) == 1:
        return set(hot[keys[0]].tolist())
    return set(map(tuple, hot[keys].to_numpy()))


def salted_map_groups(
    ds,
    keys: list[str],
    reduce_fn,
    *,
    salt_buckets: int = 16,
    hot_keys: set | None = None,
    batch_format: str = "pandas",
):
    """Two-phase salted group reduction for an associative ``reduce_fn``
    (pandas group in -> pandas rows out, same schema both phases).

    Phase 1 groups on keys + ``_salt`` (hot keys split across buckets, cold
    keys all land in _salt=0); phase 2 re-reduces per key.  When ``hot_keys``
    is None every key is salted (uniform protection)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if hot_keys is None:
            salt = np.arange(n, dtype=np.int64) % salt_buckets
        else:
            if len(keys) == 1:
                kv = batch[keys[0]].to_numpy(zero_copy_only=False)
                is_hot = np.isin(kv, list(hot_keys)) if hot_keys else np.zeros(n, bool)
            else:
                kvs = list(zip(*[batch[k].to_numpy(zero_copy_only=False) for k in keys]))
                is_hot = np.array([kv in hot_keys for kv in kvs])
            salt = np.where(is_hot, np.arange(n, dtype=np.int64) % salt_buckets, 0)
        return batch.append_column("_salt", pa.array(salt))

    def phase1(g):
        out = reduce_fn(g.drop(columns=["_salt"]))
        return out

    def phase2(g):
        return reduce_fn(g)

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    partials = salted.groupby(keys + ["_salt"]).map_groups(phase1, batch_format=batch_format)
    return partials.groupby(keys).map_groups(phase2, batch_format=batch_format)


def dedup_keep_first_salted(ds, id_col: str = "doc_id", key_col: str = "fingerprint",
                            salt_buckets: int = 16, hot_threshold: int | None = None):
    """Skew-safe exact-dedup keep-first: a key with millions of duplicates
    (the classic boilerplate-document hot key) reduces across salt_buckets
    workers instead of one."""

    def keep_first(g):
        return g.sort_values(id_col, kind="mergesort").head(1)

    hot = (
        detect_hot_keys(ds, [key_col], hot_threshold) if hot_threshold is not None else None
    )
    return salted_map_groups(ds, [key_col], keep_first, salt_buckets=salt_buckets, hot_keys=hot)
