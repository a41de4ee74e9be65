"""Stream-shaped windowed aggregation over the events table.

Ray Data is batch; event-time tumbling windows become groupby on a computed
window key (floor(epoch/size)) with per-batch partial aggregation.  Double
sums are carried as integer cents (floor(value*100)) so the DuckDB oracle is
bit-exact regardless of summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def tumbling_window_agg(ds, window_sec: int = 3600):
    """Per (event_type, window) counts + integer-cent value sums.

    Output: event_type, window_start (epoch sec), n_events, sum_cents."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        win = (ts // 1_000_000) // window_sec * window_sec
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": win,
                "cents": cents,
            }
        )
        g = t.group_by(["event_type", "window_start"], use_threads=False).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["event_type", "window_start", "psum", "pcnt"])

    from ray.data.aggregate import Sum

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
    return part.groupby(["event_type", "window_start"]).aggregate(
        Sum("psum", alias_name="sum_cents"), Sum("pcnt", alias_name="n_events")
    )


def sessionize(ds, gap_sec: int = 1800):
    """Session windows per user: sort-within-group, split on ts gaps > gap.

    Partitioning assumption: one user's events fit in one group (holds for
    per-user event counts << block size; for pathological users, pre-split by
    day).  Output: user_id, session_start, n_events."""

    def per_user(g):
        import pandas as pd

        g = g.sort_values("ts", kind="mergesort")
        # normalize to epoch seconds regardless of pandas ns/us unit
        secs = pd.Series(
            g["ts"].to_numpy().astype("datetime64[s]").astype(np.int64), index=g.index
        )
        new_session = (secs.diff().fillna(gap_sec + 1) > gap_sec).cumsum()
        out = (
            pd.DataFrame({"secs": secs, "sess": new_session})
            .groupby("sess")
            .agg(session_start=("secs", "min"), n_events=("secs", "size"))
            .reset_index(drop=True)
        )
        out["user_id"] = np.int64(g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["user_id", "session_start", "n_events"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sliding_window_agg(ds, size_sec: int = 3600, hop_sec: int = 1800):
    """Sliding (hopping) event-time windows: each event lands in
    size/hop overlapping windows (vectorized repeat + shift), then the same
    partial-agg -> tiny-groupby shape as the tumbling path.

    Output: event_type, window_start, n_events, sum_cents."""
    k = size_sec // hop_sec

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        secs = ts // 1_000_000
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        n = len(secs)
        offs = np.repeat(np.arange(k, dtype=np.int64), n)
        secs_r = np.tile(secs, k)
        ws = (secs_r // hop_sec - offs) * hop_sec
        t = pa.table(
            {
                "event_type": pa.array(np.tile(et, k).astype(object), pa.string()),
                "window_start": ws,
                "cents": np.tile(cents, k),
            }
        )
        g = t.group_by(["event_type", "window_start"], use_threads=False).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["event_type", "window_start", "psum", "pcnt"])

    from ray.data.aggregate import Sum

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return part.groupby(["event_type", "window_start"]).aggregate(
        Sum("psum", alias_name="sum_cents"), Sum("pcnt", alias_name="n_events")
    )
