"""Bounded-fanout distributed group-reduce (fast groupby.aggregate swap-in).

Measured in this sandbox: Ray's ``groupby(keys).aggregate(...)`` sort-based
path costs ~10-15 s for ~500k rows / ~30k groups REGARDLESS of key layout
(packed single int64 key with Sum+Max: 10.5 s; 4-col key with Sum: 15.2 s —
the per-task AggregateMap/Reduce machinery dominates, not the key compare).
The same total reduction expressed as ONE groupby over a bounded
deterministic key-hash salt (<= ``salt`` groups) with a vectorized
lexsort + ``np.*.reduceat`` inside each group measures ~0.26 s — 40x.

Correctness: the salt is a pure function of the FULL key, so every row of a
given key lands in exactly one salted group and the in-group reduction is
total (not partial).  Group count is bounded by ``salt`` (default 64), so
the ~1 ms/group python overhead of map_groups stays bounded (CLAUDE.md
gotcha) while skew is spread by the hash.

At 100 TB this is the same single all-to-all as groupby.aggregate — rows
move once, keyed by hash(key) % salt — with ``salt`` sized ~4x the cluster
reduce-task slots.  Callers should still pre-aggregate per batch upstream
when the reduction collapses rows (same rule as everywhere else).

Ops: sum / min / max / count / first; ``carry`` columns must be pure
functions of the key (constant within each group; first value is taken).
Key columns may be int/uint/float64 or utf8.  Integer key columns must be
NON-NULL (a nullable int degrades to float64 through numpy, changing the
output dtype — driver_group_rollup refuses such keys loudly); null keys in
string/float columns group together, matching groupby(dropna=False).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _col_hash(arr: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized uint64 hash of one key column (no python per row)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        from .text import hash_utf8_array

        return hash_utf8_array(arr).view(np.uint64)
    v = arr.to_numpy(zero_copy_only=False)
    if v.dtype.kind == "f":
        # canonicalize before the bit view: -0.0 == 0.0 must hash equal,
        # and every NaN payload must land in one group
        v = v + 0.0
        v = np.where(np.isnan(v), np.nan, v)
        v = v.view(np.uint64)
        return v
    return v.astype(np.int64, copy=False).view(np.uint64)


def _add_salt(keys: list[str], salt: int):
    from ..util import strip_schema_metadata

    def add(b: pa.Table) -> pa.Table:
        # metadata-bearing schemas (the parquet b'pandas' blob) are
        # unhashable and defeat Ray's shuffle schema-dedup cache — strip
        # here, the chokepoint every salted wide op passes through
        b = strip_schema_metadata(b)
        h = np.zeros(len(b), dtype=np.uint64)
        for k in keys:
            h = (h * _MIX) ^ _col_hash(b[k])
        return b.append_column("_gsalt", pa.array(
            (h % np.uint64(salt)).astype(np.int64)))

    return add


def _sort_codes(vals: np.ndarray) -> np.ndarray:
    """int sort codes for one key column.  Nulls group TOGETHER (one code),
    matching Ray's groupby().aggregate(): pandas factorize handles None in
    object columns and NaN in float columns as a single group — np.unique
    would crash on None-vs-str comparison, and raw float codes would keep
    every NaN row separate (NaN != NaN)."""
    if vals.dtype == object or vals.dtype.kind in "US" or (
        vals.dtype.kind == "f" and np.isnan(vals.astype(np.float64, copy=False)).any()
    ):
        import pandas as pd

        codes, _ = pd.factorize(vals, use_na_sentinel=False)
        return codes
    return vals


def _default_shuffle_partitions() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus // 2)


_OPS = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def _reduce_columns(get, keys: list[str],
                    aggs: list[tuple[str | None, str, str]],
                    carry: tuple[str, ...] = ()) -> pa.Table:
    """One total in-memory group-reduce: ``get(col) -> np.ndarray``.
    Vectorized lexsort + reduceat; shared by the salted shuffle tier and
    the driver-combine tier."""
    kvals = [get(k) for k in keys]
    codes = [_sort_codes(v) for v in kvals]
    order = np.lexsort(tuple(reversed(codes)))
    n = len(order)
    if n == 0:
        # typed empty result (change[0] below would IndexError); output
        # dtypes come from the same out_col path as the non-empty case
        st = np.zeros(0, dtype=np.int64)
        lens = np.zeros(0, dtype=np.int64)
    else:
        sorted_codes = [c[order] for c in codes]
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in sorted_codes:
            change[1:] |= c[1:] != c[:-1]
        st = np.nonzero(change)[0]
        lens = np.diff(np.r_[st, n])

    def out_col(vals):
        picked = vals[order][st]
        if picked.dtype == object or picked.dtype.kind in "US":
            return pa.array(picked.astype(object), pa.string())
        return pa.array(picked)

    cols: dict[str, pa.Array] = {k: out_col(v) for k, v in zip(keys, kvals)}
    for c in carry:
        cols[c] = out_col(get(c))
    for src, op, alias in aggs:
        if op == "count":
            cols[alias] = pa.array(lens.astype(np.int64))
        elif op == "first":
            cols[alias] = out_col(get(src))
        else:
            v = get(src)[order]
            if n == 0:
                # reduceat on an empty index array raises; keep the dtype
                cols[alias] = pa.array(v[:0])
            else:
                cols[alias] = pa.array(_OPS[op].reduceat(v, st))
    return pa.table(cols)


def driver_group_rollup(ds, keys: list[str],
                        aggs: list[tuple[str | None, str, str]],
                        *, carry: tuple[str, ...] = (),
                        max_partial_rows: int = 4_000_000,
                        schema: "pa.Schema | None" = None,
                        stats_sink: dict | None = None) -> pa.Table:
    """FINAL-rollup tier for bounded group counts: combine per-block partial
    rows on the driver, with NO all-to-all at all.

    Input contract: ``ds`` rows are already per-block partials (each block
    group-reduced inside the upstream ``map_batches``), so the stream is at
    most ``blocks x groups`` rows.  This is the classic global-aggregate
    tree-combine — Ray's own global ``.sum()`` funnels partials to one task
    the same way — and beats a sort-shuffle ``groupby.aggregate`` by its
    entire fixed cost (~2.5 s per wide step here) when the group count is a
    small constant (returnflags, priorities, langs...).

    At 100 TB the driver still only touches blocks x groups rows; the
    ``max_partial_rows`` guard trips if a caller misuses it for an unbounded
    key (use :func:`salted_group_reduce` there instead).

    ``aggs`` ops are the COMBINE ops (a partial ``count`` combines as
    ``sum``).  Returns a pyarrow.Table with dtypes preserved.
    """
    import ray

    # materialize() then pull block refs: consuming the stream via
    # to_arrow_refs()/take_all() directly measures ~1-1.8 s SLOWER than
    # materialize() on the identical plan in this sandbox
    mat = ds.materialize()
    if stats_sink is not None:
        # the upstream plan's per-operator stats are only reachable here —
        # the caller gets back a plain Table (benchmarks read this to report
        # the real stage breakdown instead of the FromArrow wrapper's)
        stats_sink["stats"] = mat.stats()
    tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    if not tables:
        # typed empty result; a BLOCK-LESS materialized dataset (rd.range(0)
        # upstream) returns schema() None — callers with such upstreams pass
        # ``schema`` (the PARTIAL's schema) so key dtypes survive; the final
        # int64 fallback is for unknown agg aliases only
        s = schema if schema is not None else mat.schema()
        names = list(keys) + list(carry) + [a for _, _, a in aggs]
        t = dict(zip(s.names, s.types)) if s is not None and getattr(s, "names", None) else {}
        return pa.schema([(n, t.get(n, pa.int64())) for n in names]).empty_table()
    part = pa.concat_tables(tables)
    if part.num_rows > max_partial_rows:
        raise ValueError(
            f"driver_group_rollup collected {part.num_rows} partial rows — "
            "group count is not bounded; use salted_group_reduce")

    def get(c):
        col = part[c]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if c in keys and pa.types.is_integer(arr.type) and arr.null_count:
            # to_numpy on a nullable int column degrades to float64+NaN and
            # the output key dtype silently changes — refuse loudly instead
            # (the "dtypes preserved" contract; string/float keys group
            # nulls fine via the factorize path in _sort_codes)
            raise ValueError(
                f"driver_group_rollup key column {c!r} is integer with "
                "nulls — fill or cast it before the rollup (int keys must "
                "be non-null to preserve the output dtype)")
        return arr.to_numpy(zero_copy_only=False)

    return _reduce_columns(get, keys, aggs, carry)


def salted_group_reduce(ds, keys: list[str],
                        aggs: list[tuple[str | None, str, str]],
                        *, salt: int = 64, carry: tuple[str, ...] = (),
                        shuffle_partitions: int | None = None):
    """groupby(keys) total reduction via one bounded-salt shuffle.

    ``aggs``: (source_col, op, alias) with op in sum|min|max|count|first
    (source_col is ignored for count).  ``carry``: columns constant within
    each key group, passed through (first value).  Returns a Dataset with
    columns keys + carry + aliases; dtypes are preserved (int sums stay
    int64, strings stay utf8 — empty results keep utf8 via explicit types).

    ``shuffle_partitions``: Ray's sort-shuffle cost scales with the BLOCK
    count of its input (measured here: 0.82 s at 64 blocks vs 0.22 s at 8
    for the same 500k rows), so the input is narrowly repartitioned to
    ~cluster_CPUs/2 partitions before the wide step by default — enough
    reduce-side parallelism for the <= ``salt`` groups, without the
    64x64 task-matrix fixed cost.  Scales with the cluster (more nodes ->
    more partitions); pass an explicit value for very large reductions.
    """
    def reduce_groups(g):
        return _reduce_columns(lambda c: g[c].to_numpy(), keys, aggs, carry)

    parts = shuffle_partitions or _default_shuffle_partitions()
    return (
        ds.map_batches(_add_salt(keys, salt), batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .repartition(parts)
        .groupby("_gsalt")
        .map_groups(reduce_groups, batch_format="pandas")
    )


def _finalize_subtotals(reduced, keys: list[str], value_col: str | None,
                        total_label: str, has_grand_total: bool,
                        value_type: "pa.DataType | None") -> pa.Table:
    """Pull the bounded subtotal table to the driver and restore the SQL
    GROUPING SETS contract on EMPTY input: the () grouping set emits one
    row even over zero rows — count 0 and a NULL sum (SQL SUM over nothing
    is NULL) — while a zero-block upstream produces nothing at all.  On
    non-empty input every batch emits the () row, so this is a no-op."""
    tables = [t for t in reduced.iter_batches(batch_size=None,
                                              batch_format="pyarrow")]
    names = keys + ["n"] + ([f"sum_{value_col}"] if value_col else [])
    if tables:
        return pa.concat_tables(tables).select(names)
    fields = [(k, pa.string()) for k in keys] + [("n", pa.int64())]
    if value_col:
        fields.append((f"sum_{value_col}",
                       value_type if value_type is not None else pa.int64()))
    schema = pa.schema(fields)
    if not has_grand_total:
        return schema.empty_table()
    cols = {k: pa.array([total_label], pa.string()) for k in keys}
    cols["n"] = pa.array([0], pa.int64())
    if value_col:
        cols[f"sum_{value_col}"] = pa.array(
            [None], value_type if value_type is not None else pa.int64())
    return pa.table({n: cols[n] for n in names})


def rollup_counts(ds, keys: list[str], value_col: str | None = None,
                  total_label: str = "__all__",
                  empty_sum_type: "pa.DataType | None" = None):
    """GROUPING-SETS rollup — the warehouse subtotal op: counts (and an
    optional value sum) for every PREFIX of ``keys``: (k1, k2, ..., kn),
    (k1, ..., k(n-1)), ..., (k1), ().  Coarser levels replace the rolled-up
    key with ``total_label`` (Arrow groupbys drop null keys; a sentinel
    keeps every subtotal row addressable and matches the twin's coalesce).

    ONE shuffle: each batch pre-aggregates every level locally (n+1 tiny
    group_bys over the already-reduced finest level), the tagged rows ride
    one bounded-salt reduce.  Output: keys..., n (count)[, sum_<value_col>]."""
    aggs = [([], "count_all")] if value_col is None else [([], "count_all"), (value_col, "sum")]

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # the total_label sentinel is a string: non-string key columns would
        # make coarser levels string-typed while the finest keeps the native
        # type, and pa.concat_tables raises a confusing mixed-schema error —
        # fail with the actual contract instead (cast keys upstream)
        for k in keys:
            kt = b.schema.field(k).type
            if not (pa.types.is_string(kt) or pa.types.is_large_string(kt)):
                raise TypeError(
                    f"rollup_counts requires string-typed key columns (the "
                    f"'{total_label}' subtotal sentinel is a string); column "
                    f"{k!r} is {kt} — cast it before the rollup")
        sel = keys + ([value_col] if value_col else [])
        finest = (b.select(sel).group_by(keys, use_threads=False)
                  .aggregate(aggs))
        names = keys + ["pn"] + (["ps"] if value_col else [])
        finest = finest.rename_columns(names)
        outs = [finest]
        cur = finest
        for lvl in range(len(keys) - 1, -1, -1):
            gk = keys[:lvl]
            sub_aggs = [("pn", "sum")] + ([("ps", "sum")] if value_col else [])
            if gk:
                g = cur.group_by(gk, use_threads=False).aggregate(sub_aggs)
                g = g.rename_columns(gk + ["pn"] + (["ps"] if value_col else []))
            else:
                cols = {"pn": pa.array([int(pc.sum(cur["pn"]).as_py() or 0)], pa.int64())}
                if value_col:
                    # keep the grand-total ps in the FINEST level's column
                    # type: `as_py() or 0` would coerce a float 0.0 sum to
                    # int 0 and split the concat schema int64-vs-float64
                    ps_type = cur.schema.field("ps").type
                    s = pc.sum(cur["ps"]).as_py()
                    cols["ps"] = pa.array([0 if s is None else s], ps_type)
                g = pa.table(cols)
            for k in keys[lvl:]:
                g = g.append_column(k, pa.array([total_label] * len(g), pa.string()))
            outs.append(g.select(keys + ["pn"] + (["ps"] if value_col else [])))
            cur = outs[-1] if gk else cur
        aligned = [t.select(keys + ["pn"] + (["ps"] if value_col else [])) for t in outs]
        return pa.concat_tables(aligned)

    specs = [("pn", "sum", "n")] + ([("ps", "sum", f"sum_{value_col}")] if value_col else [])
    reduced = salted_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        keys, specs, salt=64)
    return _finalize_subtotals(reduced, keys, value_col, total_label,
                               has_grand_total=True, value_type=empty_sum_type)


def grouping_sets_counts(ds, keys: list[str], sets: list[tuple[str, ...]],
                         value_col: str | None = None,
                         total_label: str = "__all__",
                         empty_sum_type: "pa.DataType | None" = None):
    """General GROUPING SETS / CUBE — :func:`rollup_counts` restricted to
    key PREFIXES, generalized to ANY list of key subsets (``CUBE(a, b)`` =
    all four subsets).  Same one-shuffle plan: each batch reduces to the
    finest level once, every requested set aggregates FROM that finest
    local partial (any subset is derivable from it), rolled-up keys get the
    string sentinel, and all tagged rows ride one bounded-salt reduce.

    ``sets`` must be unique subsets of ``keys`` (duplicates would
    double-count).  Same string-key contract as rollup_counts (the sentinel
    is a string).  Output: keys..., n[, sum_<value_col>]."""
    seen = set()
    for st in sets:
        t = tuple(k for k in keys if k in st)
        if set(st) - set(keys):
            raise ValueError(f"grouping set {st} has keys outside {keys}")
        if t in seen:
            raise ValueError(f"duplicate grouping set {st}")
        seen.add(t)
    aggs = [([], "count_all")] if value_col is None else [([], "count_all"), (value_col, "sum")]

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for k in keys:
            kt = b.schema.field(k).type
            if not (pa.types.is_string(kt) or pa.types.is_large_string(kt)):
                raise TypeError(
                    f"grouping_sets_counts requires string-typed key columns "
                    f"(the {total_label!r} sentinel is a string); column "
                    f"{k!r} is {kt} — cast it before the rollup")
        sel = keys + ([value_col] if value_col else [])
        finest = (b.select(sel).group_by(keys, use_threads=False)
                  .aggregate(aggs))
        finest = finest.rename_columns(keys + ["pn"] + (["ps"] if value_col else []))
        out_cols = keys + ["pn"] + (["ps"] if value_col else [])
        sub_aggs = [("pn", "sum")] + ([("ps", "sum")] if value_col else [])
        outs = []
        for st in sets:
            gk = [k for k in keys if k in st]
            if len(gk) == len(keys):
                g = finest
            elif gk:
                g = finest.group_by(gk, use_threads=False).aggregate(sub_aggs)
                g = g.rename_columns(gk + ["pn"] + (["ps"] if value_col else []))
            else:
                cols = {"pn": pa.array(
                    [int(pc.sum(finest["pn"]).as_py() or 0)], pa.int64())}
                if value_col:
                    ps_type = finest.schema.field("ps").type
                    s = pc.sum(finest["ps"]).as_py()
                    cols["ps"] = pa.array([0 if s is None else s], ps_type)
                g = pa.table(cols)
            for k in keys:
                if k not in gk:
                    g = g.append_column(
                        k, pa.array([total_label] * len(g), pa.string()))
            outs.append(g.select(out_cols))
        return pa.concat_tables(outs)

    specs = [("pn", "sum", "n")] + ([("ps", "sum", f"sum_{value_col}")] if value_col else [])
    reduced = salted_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        keys, specs, salt=64)
    return _finalize_subtotals(reduced, keys, value_col, total_label,
                               has_grand_total=(() in (tuple(
                                   k for k in keys if k in st) for st in sets)),
                               value_type=empty_sum_type)


def pivot_counts(ds, row_key: str, col_key: str, categories: list[str],
                 prefix: str = "n_", other_alias: str = "other") -> pa.Table:
    """Wide pivot — one row per ``row_key`` value, one count column per
    listed ``col_key`` category plus an ``other`` bucket (the warehouse
    crosstab: SUM(CASE WHEN col=cat THEN 1 ELSE 0 END) per category).

    NULL ``col_key`` counts NOWHERE (neither a category nor other),
    matching the SQL CASE/NOT-IN twin's null semantics.  Scale shape: the
    category list is a fixed parameter and row_key is bounded (langs,
    segments), so each batch reduces to <= |row_key| partial rows via ONE
    Arrow group_by over int64 indicators and the driver combines partials —
    ZERO all-to-all (driver_group_rollup tier rule).

    Returns pa.Table: row_key, {prefix}{cat}..., {prefix}{other_alias},
    sorted by row_key."""
    from ..util import strip_schema_metadata

    aliases = [f"{prefix}{c}" for c in categories] + [f"{prefix}{other_alias}"]

    def partial(b: pa.Table) -> pa.Table:
        b = strip_schema_metadata(b)
        col = b[col_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        matched = np.zeros(len(b), dtype=bool)
        ind = {}
        for c, alias in zip(categories, aliases):
            m = pc.fill_null(pc.equal(col, c), False).to_numpy(
                zero_copy_only=False).astype(bool)
            ind[alias] = m.astype(np.int64)
            matched |= m
        ind[aliases[-1]] = (valid & ~matched).astype(np.int64)
        t = pa.table({row_key: b[row_key], **{a: pa.array(v) for a, v in ind.items()}})
        g = t.group_by(row_key, use_threads=False).aggregate(
            [(a, "sum") for a in aliases])
        return g.rename_columns([row_key] + aliases)

    out = driver_group_rollup(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        [row_key], [(a, "sum", a) for a in aliases])
    return out.sort_by(row_key)


def key_set_ops(ds, key: str, in_a_expr, in_b_expr) -> pa.Table:
    """Distinct-key EXCEPT / INTERSECT between two row predicates over ONE
    corpus scan: per-batch, each key group reduces to (key, max(in_a),
    max(in_b)) int64 flags; the bounded-group driver rollup max-combines
    them; the driver emits (key, op) rows for op in {'except','intersect'}
    (except = in A, not in B; intersect = in both).

    ``in_a_expr`` / ``in_b_expr``: callables batch -> boolean np.ndarray.
    Key count must be bounded (langs, segments) — the driver tier rule."""
    from ..util import strip_schema_metadata

    def partial(b: pa.Table) -> pa.Table:
        b = strip_schema_metadata(b)
        a = np.asarray(in_a_expr(b), dtype=bool)
        bb = np.asarray(in_b_expr(b), dtype=bool)
        t = pa.table({key: b[key],
                      "_a": pa.array(a.astype(np.int64)),
                      "_b": pa.array(bb.astype(np.int64))})
        g = t.group_by(key, use_threads=False).aggregate(
            [("_a", "max"), ("_b", "max")])
        return g.rename_columns([key, "_a", "_b"])

    flags = driver_group_rollup(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        [key], [("_a", "max", "_a"), ("_b", "max", "_b")])
    ka = flags[key].to_numpy(zero_copy_only=False)
    fa = flags["_a"].to_numpy(zero_copy_only=False).astype(bool)
    fb = flags["_b"].to_numpy(zero_copy_only=False).astype(bool)

    def nsort(v):
        # a NULL key is one distinct value in SQL set ops (EXCEPT/INTERSECT
        # treat NULLs as equal) — keep it, sorting None last
        return np.array(sorted(v, key=lambda x: (x is None, x)), dtype=object)

    exc = nsort(ka[fa & ~fb].astype(object))
    inter = nsort(ka[fa & fb].astype(object))
    return pa.table({
        key: pa.array(np.concatenate([exc, inter]).astype(object), pa.string()),
        "op": pa.array(["except"] * len(exc) + ["intersect"] * len(inter),
                       pa.string()),
    })
