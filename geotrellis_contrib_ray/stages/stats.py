"""Distribution statistics over discrete columns: exact distributed
quantiles (percentile_disc semantics) — the quality-cutoff primitive a
training-data pipeline uses to pick filtering thresholds.

Scale shape: quantiles are HOLISTIC (nondecomposable) aggregates, but over
a DISCRETE value domain they reduce to a value histogram — per-batch
pyarrow counts, one groupby((group, value)).sum whose shuffle moves one row
per distinct value per group per block, then a per-group cumsum selection
over the tiny histogram.  The histogram side is bounded by the value
domain, not the corpus (n_chars: thousands of distinct values at any
corpus size), so this is exact at 10^12 rows with a KB-sized wide step —
no sampling, no t-digest approximation.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def top_k_per_group(ds, group_col: str, order_col: str, k: int,
                    tie_col: str, ascending: bool = False,
                    carry_cols: tuple = ()):
    """Top-k rows per group by (order_col, tie_col): per-batch partial top-k
    PER GROUP (the shuffle moves <= k rows per group per block, never the
    corpus), then a per-group merge.  Ties at the kth value are broken by
    ascending tie_col — the same total order as the SQL
    ``row_number() OVER (PARTITION BY g ORDER BY v [DESC], t)`` oracle.

    Output: (group_col, order_col, tie_col, *carry_cols) of the winners —
    ``carry_cols`` ride along untouched (any dtype; selected via Arrow
    take, so they never pass through numpy)."""
    cols = [group_col, order_col, tie_col, *carry_cols]

    def partial(b: pa.Table) -> pa.Table:
        b = b.select(cols)
        gv = b[group_col].to_numpy(zero_copy_only=False)
        ov = b[order_col].to_numpy(zero_copy_only=False)
        tv = b[tie_col].to_numpy(zero_copy_only=False)
        key = ov if ascending else -ov
        order = np.lexsort((tv, key, gv))  # group, then (value, tie)
        g = gv[order]
        grp_start = np.r_[True, g[1:] != g[:-1]]
        idx = np.arange(len(g))
        start = np.maximum.accumulate(np.where(grp_start, idx, 0))
        keep = (idx - start) < k
        return b.take(pa.array(order[keep]))

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def merge(g):
        scols = [order_col, tie_col]
        asc = [ascending, True]
        return g.sort_values(scols, ascending=asc, kind="mergesort").head(k)

    return part.groupby(group_col).map_groups(merge, batch_format="pandas")


def grouped_quantiles(ds, value_col: str, qs: tuple[float, ...],
                      group_col: str | None = None):
    """Exact quantile_disc per group: for each q, the smallest value whose
    cumulative count reaches ceil(q * n) (index ceil(q*n)-1 of the sorted
    multiset — DuckDB quantile_disc / Postgres percentile_disc, verified
    empirically against DuckDB on boundary cases).

    Output: (group_col?, q:float64, value: <value_col type>).
    Partitioning assumption: one GROUP's histogram fits a worker (domain-
    bounded, not corpus-bounded)."""
    from ray.data.aggregate import Sum

    gcols = [group_col] if group_col else []

    def partial(b: pa.Table) -> pa.Table:
        g = (
            b.select(gcols + [value_col])
            .group_by(gcols + [value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(gcols + [value_col, "pcnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(gcols + [value_col])
        .aggregate(Sum("pcnt", alias_name="cnt"))
    )

    qarr = np.asarray(sorted(qs), dtype=np.float64)

    def select(g):
        vals = g[value_col].to_numpy()
        cnts = g["cnt"].to_numpy().astype(np.int64)
        o = np.argsort(vals, kind="mergesort")
        v, c = vals[o], cnts[o]
        cum = np.cumsum(c)
        n = int(cum[-1])
        # ranks: ceil(q*n) with integer-safe ceil on the float product
        ranks = np.array([int(math.ceil(q * n)) for q in qarr], dtype=np.int64)
        ranks = np.clip(ranks, 1, n)
        idx = np.searchsorted(cum, ranks, side="left")
        cols = {}
        if group_col:
            cols[group_col] = np.repeat(g[group_col].to_numpy()[:1], len(qarr))
        cols["q"] = qarr
        cols["value"] = v[idx]
        return pa.table(cols)

    if group_col:
        return hist.groupby(group_col).map_groups(select, batch_format="pandas")
    # global: the histogram is domain-bounded (small) — one final task
    return hist.repartition(1).map_batches(
        lambda b: select(b.to_pandas()), batch_format="pyarrow", batch_size=None
    )
