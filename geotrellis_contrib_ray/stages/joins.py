"""Join strategies for the engine.

Three tiers, picked by side sizes (README scale rules):
1. broadcast — small side via ray.put, lookup inside map_batches (see
   __ray_entry__.q_orders_by_segment);
2. native hash join — ``Dataset.join`` (hash-partitioned on the key), used
   when both sides are large and the Ray version ships it;
3. bucketed hash join — the portable fallback: hash both sides into B
   buckets, tag the side, union, groupby(bucket) and pandas-merge within the
   bucket.  Works on any Ray version; B and the optional per-key salt are
   the documented skew knobs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def native_hash_join(left, right, on: str, *, num_partitions: int = 32, join_type: str = "inner"):
    """Tier-2: Ray's built-in hash-partitioned join."""
    return left.join(right, join_type, num_partitions, on=(on,))


def bucketed_hash_join(left, right, on: str, *, buckets: int = 32, how: str = "inner"):
    """Tier-3 portable partitioned hash join.

    Shuffle payload is both sides' projected rows exactly once; each bucket
    joins locally with a pandas merge.  Hot join keys can be salted by
    raising ``buckets`` (key -> bucket is a modular hash, so a single key
    never splits — skew-sensitive callers should pre-aggregate or use the
    broadcast tier for dimension-shaped sides)."""

    # align schemas for the union: each side padded with typed null columns
    # for the other side's exclusive fields
    lschema = left.schema()
    rschema = right.schema()
    lcols = set(lschema.names)
    rcols = set(rschema.names)
    lonly = sorted(lcols - rcols)
    ronly = sorted(rcols - lcols)
    shared = (lcols & rcols) - {on}
    if shared:
        raise ValueError(f"rename shared non-key columns before joining: {sorted(shared)}")
    all_cols = [on] + lonly + ronly  # key first, stable order
    type_of = {}
    for name, t in zip(lschema.names, lschema.types):
        type_of[name] = t
    for name, t in zip(rschema.names, rschema.types):
        type_of.setdefault(name, t)

    def tag(side: int, missing: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch[on].to_numpy(zero_copy_only=False)
            bucket = (keys.astype(np.int64) * np.int64(2654435761)) % buckets
            cols = {}
            for c in all_cols:
                if c in missing:
                    cols[c] = pa.nulls(len(batch), type_of[c])
                else:
                    cols[c] = batch[c]
            t = pa.table(cols)
            return t.append_column("_bucket", pa.array(bucket)).append_column(
                "_side", pa.array(np.full(len(batch), side, dtype=np.int8))
            )

        return f

    tagged = left.map_batches(tag(0, ronly), batch_format="pyarrow", batch_size=None).union(
        right.map_batches(tag(1, lonly), batch_format="pyarrow", batch_size=None)
    )

    def per_bucket(g):
        import pandas as pd

        lg = g[g["_side"] == 0].drop(columns=["_side", "_bucket"] + ronly, errors="ignore")
        rg = g[g["_side"] == 1].drop(columns=["_side", "_bucket"] + lonly, errors="ignore")
        if len(lg) == 0 or len(rg) == 0:
            if how == "inner":
                cols = [c for c in g.columns if c not in ("_side", "_bucket")]
                return pd.DataFrame({c: pd.Series([], dtype=g[c].dtype) for c in cols})
        return lg.merge(rg, on=on, how=how)

    return tagged.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def asof_join(left, right, *, by: str, on: str, right_value: str, buckets: int = 32):
    """As-of join (custom operator the Dataset API lacks): for each left row,
    the latest right row of the same ``by`` key with right.on <= left.on.

    Scale shape: hash-bucket both sides on ``by`` (a key's rows never split),
    union, groupby(bucket), per-bucket ``pd.merge_asof`` over sorted frames.
    Inner semantics: left rows with no prior right row are dropped — matches
    ``ASOF JOIN`` in SQL.  Partitioning assumption: one bucket's rows fit a
    worker (raise ``buckets`` for skewed key spaces)."""

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch[by].to_numpy(zero_copy_only=False)
            bucket = (keys.astype(np.int64) * np.int64(2654435761)) % buckets
            cols = {by: batch[by], on: batch[on]}
            if side == 1:
                cols[right_value] = batch[right_value]
            else:
                cols[right_value] = pa.nulls(len(batch), pa.int64())
            t = pa.table(cols)
            return t.append_column("_bucket", pa.array(bucket)).append_column(
                "_side", pa.array(np.full(len(batch), side, dtype=np.int8))
            )

        return f

    tagged = left.map_batches(tag(0), batch_format="pyarrow", batch_size=None).union(
        right.map_batches(tag(1), batch_format="pyarrow", batch_size=None)
    )

    def per_bucket(g):
        import pandas as pd

        lg = g[g["_side"] == 0][[by, on]].sort_values(on, kind="mergesort")
        rg = g[g["_side"] == 1][[by, on, right_value]].sort_values(on, kind="mergesort")
        if len(lg) == 0 or len(rg) == 0:
            return pd.DataFrame(
                {
                    by: pd.Series([], dtype=np.int64),
                    on: pd.Series([], dtype=np.int64),
                    right_value: pd.Series([], dtype=np.int64),
                }
            )
        out = pd.merge_asof(lg, rg, on=on, by=by)
        out = out.dropna(subset=[right_value])
        out[right_value] = out[right_value].astype(np.int64)
        return out[[by, on, right_value]]

    return tagged.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
