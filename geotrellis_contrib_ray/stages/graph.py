"""Distributed graph stages: connected components over candidate-pair edges,
and near-dup CLUSTER resolution built on them.

The pair emitters in ``stages/dedup.py`` stop at candidate PAIRS; real
dedup needs transitive closure (A~B, B~C => one cluster, keep one doc).
This module closes that gap Ray-Data-first:

* ``star_edges`` — turns a (id, key_hash) keying Dataset into edges
  (member -> per-key min id).  Emission is LINEAR in key-group size (a
  star, not a clique), via the same salted-group + sorted-run-detection
  pattern as ``dedup.minhash_candidate_pairs`` (grouping by the raw hash
  would make one ~1 ms python group per key — see CLAUDE.md).
* ``connected_components`` — min-label propagation: per round ONE narrow
  bucketed hash join of the (node, nbr) edge list against the (node, label)
  table plus one groupby-min; rounds bounded by component diameter (or
  O(log d) with ``pointer_jump=True``, one extra label self-join/round).
  Only int64 pairs ever cross a shuffle; document bodies never move.
  Labels are materialized once per round (16 bytes/node — the narrow
  state table, NOT the corpus), which also keeps the per-round lineage
  flat instead of a recompute tower.
* ``neardup_clusters`` — documents -> shared prefix/suffix-key star edges
  -> components -> (doc_id, cluster_id); cluster_id is the min doc_id of
  the component, so ``doc_id == cluster_id`` marks the canonical keeper.

Reference scope anchor: the reference collapses exact-duplicate windows via
``.toMap`` (vlm/src/test/scala/.../RasterSourceSpec.scala window dedup);
transitive near-dup clustering is the training-data-scale extension of that
semigroup collapse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joins import bucketed_hash_join


def star_edges(keyed, id_col: str = "doc_id", hash_col: str = "key_hash",
               group_salt: int = 256):
    """(id, key_hash) rows -> star edges (src=member, dst=per-key min id),
    member != min, one edge per (row, key) — linear in key-group size.

    Groups are salted DOWN to ``group_salt`` partitions (equal hashes still
    co-locate; bounded group count); equal-hash runs are detected vectorized
    inside each group.  Partitioning assumption: one salted group fits a
    worker — scale ``group_salt`` with the corpus.
    """

    def add_salt(b: pa.Table) -> pa.Table:
        kh = b[hash_col].to_numpy(zero_copy_only=False)
        salt = (kh.view(np.uint64) % np.uint64(group_salt)).astype(np.int64)
        return b.append_column("_gsalt", pa.array(salt))

    salted = keyed.map_batches(add_salt, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
    from .agg import _default_shuffle_partitions

    # sort-shuffle fixed cost scales with input block count — coalesce narrow
    salted = salted.repartition(_default_shuffle_partitions())

    def emit(g):
        ids = g[id_col].to_numpy()
        hashes = g[hash_col].to_numpy()
        order = np.lexsort((ids, hashes))
        h = hashes[order]
        starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
        ends = np.r_[starts[1:], len(h)]
        sids = ids[order]
        # per-run min = first element (ids ascending within a run)
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        mins = sids[starts][run_of]
        keep = sids != mins
        if not keep.any():
            z = pa.array([], pa.int64())
            return pa.table({"src": z, "dst": z})
        return pa.table({
            "src": pa.array(sids[keep].astype(np.int64)),
            "dst": pa.array(mins[keep].astype(np.int64)),
        })

    return salted.groupby("_gsalt").map_groups(emit, batch_format="pandas")


def connected_components(edges, nodes, id_col: str = "node",
                         max_rounds: int = 50, pointer_jump: bool = True,
                         buckets: int | None = None,
                         driver_threshold: int = 1_000_000,
                         carry_cols: tuple[str, ...] = ()):
    """Label every node with the MIN node id of its connected component.

    ``edges``: Dataset (src, dst) — direction ignored (symmetrized here).
    ``nodes``: Dataset with unique ``id_col`` (every node, incl. isolated).
    Returns Dataset (node, label, *carry_cols), one row per node —
    ``carry_cols`` are extra ``nodes`` columns passed through the label
    pass, so callers never pay a separate corpus⋈labels join to get node
    attributes next to their cluster label (the driver tier carries them
    through the narrow apply; the distributed tier re-attaches them with
    one bucketed join, which that tier's caller would otherwise run
    itself).

    TWO TIERS, picked by edge count (the candidate-pair edge set after star
    compression is usually ≪ the corpus — exactly the economics of the
    broadcast join tier):
    * edges <= ``driver_threshold``: union-find at the driver over the
      edge list only (16 bytes/edge; 1M edges = 16 MB), the touched-node
      label map broadcast once via ``ray.put`` — label APPLICATION stays a
      distributed narrow pass over ``nodes``.  Measured 37 s -> ~2 s at
      sf0.1 against the shuffle loop.
    * bigger graphs: distributed min-label propagation — per round one
      bucketed Arrow join (msgs = edges ⋈ labels on src) plus one
      groupby-min; exact convergence by carrying the previous label and
      counting strict decreases (labels fall monotonically).
      ``pointer_jump=True`` adds label := label(label) per round (one
      label self-join), O(diameter) -> O(log diameter) rounds for chains.
    """
    import ray

    i64 = pa.int64()
    edges_mat = edges.materialize()
    n_edges = edges_mat.count()

    if n_edges <= driver_threshold:
        edge_schema = pa.schema([("src", i64), ("dst", i64)])
        blocks = [t for t in ray.get(edges_mat.to_arrow_refs()) if t.num_rows]
        if blocks:
            # empty blocks can surface with null-typed columns — drop them
            # and cast the rest instead of trusting block-schema agreement
            et = pa.concat_tables([t.select(["src", "dst"]).cast(edge_schema)
                                   for t in blocks])
            srcs = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dsts = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            srcs = dsts = np.zeros(0, np.int64)
        touched = np.unique(np.concatenate([srcs, dsts]))
        index = {int(v): i for i, v in enumerate(touched)}
        parent = np.arange(len(touched), dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = int(parent[x])
            return x

        for a, b in zip(srcs, dsts):
            ra, rb = find(index[int(a)]), find(index[int(b)])
            if ra != rb:
                # union by MIN NODE ID so the root is the component minimum
                if touched[ra] < touched[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.array([find(i) for i in range(len(touched))], np.int64)
        label_of = touched[roots]
        lookup_ref = ray.put((touched, label_of))

        def apply_labels(b: pa.Table) -> pa.Table:
            keys, labs = ray.get(lookup_ref)
            ids = b[id_col].combine_chunks().cast(i64).to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                out = ids
            else:
                pos = np.clip(np.searchsorted(keys, ids), 0, len(keys) - 1)
                hit = keys[pos] == ids
                out = np.where(hit, labs[pos], ids)
            cols = {"node": pa.array(ids), "label": pa.array(out)}
            for c in carry_cols:
                cols[c] = b[c]
            return pa.table(cols)

        return nodes.map_batches(apply_labels, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)

    def to_sym(b: pa.Table) -> pa.Table:
        src = b["src"].combine_chunks().cast(i64)
        dst = b["dst"].combine_chunks().cast(i64)
        return pa.table({"node": pa.concat_arrays([src, dst]),
                         "nbr": pa.concat_arrays([dst, src])})

    sym = edges_mat.map_batches(to_sym, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None).materialize()
    sym_schema = pa.schema([("node", i64), ("nbr", i64)])

    def init_labels(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().cast(i64)
        return pa.table({"node": ids, "label": ids})

    labels = nodes.map_batches(init_labels, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None).materialize()
    label_schema = pa.schema([("node", i64), ("label", i64)])
    from .joins import default_join_partitions

    # Bound the label table's block count: groupby/sort stages emit one
    # output block per INPUT block, and the join feeds blocks back in — left
    # unbounded the count DOUBLES per round (measured 3→7→15→31→63), making
    # per-round task overhead exponential.  A fixed repartition keeps every
    # round the same shape.
    label_parts = buckets if buckets is not None else default_join_partitions()

    for _ in range(max_rounds):
        joined = bucketed_hash_join(
            sym, labels, on="node", buckets=buckets,
            schemas=(sym_schema, label_schema),
        )

        def as_msgs(b: pa.Table) -> pa.Table:
            # _old sentinel (int64 max) instead of null: the min-reduce
            # below is a vectorized reduceat (no null skipping needed) and
            # every node contributes exactly one real _old via withold
            return pa.table({
                "node": b["nbr"].combine_chunks(),
                "label": b["label"].combine_chunks(),
                "_old": pa.array(np.full(len(b), np.iinfo(np.int64).max, np.int64)),
            })

        msgs = joined.map_batches(as_msgs, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)

        def carry_old(b: pa.Table) -> pa.Table:
            return b.append_column("_old", b["label"])

        withold = labels.map_batches(carry_old, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
        # min-label per node: one group per NODE, so Ray's native aggregate
        # pays its per-group cost over the whole node table every round —
        # the bounded-salt reduceat plan does the same total min in one
        # bounded shuffle (stages/agg.py measurements)
        from .agg import salted_group_reduce

        agg = salted_group_reduce(
            withold.union(msgs), ["node"],
            [("label", "min", "label"), ("_old", "min", "_old")],
        )

        if pointer_jump:
            # label := label(label): left (node, _old, ptr=label) ⋈ right
            # (ptr=node, _jlabel=label) on ptr — plabel <= ptr always, so the
            # jumped label is just plabel.
            def as_left(b: pa.Table) -> pa.Table:
                return pa.table({"lnode": b["node"].combine_chunks(),
                                 "_old": b["_old"].combine_chunks(),
                                 "ptr": b["label"].combine_chunks()})

            def as_right(b: pa.Table) -> pa.Table:
                return pa.table({"ptr": b["node"].combine_chunks(),
                                 "_jlabel": b["label"].combine_chunks()})

            agg = agg.materialize()
            left = agg.map_batches(as_left, batch_format="pyarrow",
                                   zero_copy_batch=True, batch_size=None)
            right = agg.map_batches(as_right, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None)
            jumped = bucketed_hash_join(
                left, right, on="ptr", buckets=buckets,
                schemas=(pa.schema([("lnode", i64), ("_old", i64), ("ptr", i64)]),
                         pa.schema([("ptr", i64), ("_jlabel", i64)])),
            )

            def finish_jump(b: pa.Table) -> pa.Table:
                return pa.table({"node": b["lnode"].combine_chunks(),
                                 "label": b["_jlabel"].combine_chunks(),
                                 "_old": b["_old"].combine_chunks()})

            agg = jumped.map_batches(finish_jump, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)

        agg = agg.materialize()

        def changed_rows(b: pa.Table) -> pa.Table:
            m = pc.less(b["label"], b["_old"])
            return pa.table({"n": pa.array([pc.sum(m).as_py() or 0], i64)})

        changed = sum(
            r["n"] for r in
            agg.map_batches(changed_rows, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None).take_all()
        )

        def drop_old(b: pa.Table) -> pa.Table:
            return b.select(["node", "label"])

        labels = (
            agg.map_batches(drop_old, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
            .repartition(label_parts)
            .materialize()
        )
        if changed == 0:
            break

    if carry_cols:
        # big-graph tier: re-attach node attributes with one bucketed join
        from .joins import bucketed_hash_join as _bhj

        def as_nodes(b: pa.Table) -> pa.Table:
            cols = {"node": b[id_col].combine_chunks().cast(i64)}
            for c in carry_cols:
                cols[c] = b[c]
            return pa.table(cols)

        node_attrs = nodes.map_batches(as_nodes, batch_format="pyarrow",
                                       zero_copy_batch=True, batch_size=None)
        nschema = nodes.schema()
        ntypes = dict(zip(nschema.names, nschema.types))
        joined = _bhj(
            labels, node_attrs, on="node",
            schemas=(label_schema,
                     pa.schema([("node", i64)] + [(c, ntypes[c]) for c in carry_cols])),
        )

        # the join emits right-only columns in SORTED name order — reorder
        # to (node, label, *carry_cols) so both tiers return one schema and
        # positional renames downstream stay correct
        def reorder(b: pa.Table) -> pa.Table:
            return b.select(["node", "label", *carry_cols])

        return joined.map_batches(reorder, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
    return labels


def neardup_clusters(ds, key_len: int = 10, id_col: str = "doc_id",
                     text_col: str = "text", group_salt: int = 256,
                     max_rounds: int = 50, pointer_jump: bool = True,
                     buckets: int | None = None,
                     driver_threshold: int = 1_000_000,
                     carry_cols: tuple[str, ...] = ()):
    """Transitive near-dup clusters: docs sharing a ``key_len``-char PREFIX
    or SUFFIX are connected; output (doc_id, cluster_id) for EVERY doc
    (singletons label themselves), cluster_id = min doc_id of the component.

    SQL twin (oracle_sql['dedup_clusters']): substr keys + star edges to the
    per-key min + WITH RECURSIVE min-label reach.  Prefix and suffix keys
    share ONE key space (a prefix of A equal to the suffix of B is an edge),
    exactly as the SQL UNION ALL of both key forms into a single GROUP BY.
    """
    from .text import hash_utf8_array

    def keys(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.cast(pa.string())
        ids = b[id_col].combine_chunks().cast(pa.int64())
        # NULL texts carry NO keys (edgeless singletons, like the twin's
        # NULL substr keys) — hashing them would alias NULL with '' (the
        # FNV-basis collision the r4 ADVICE flagged on incremental dedup)
        mask = pc.is_valid(texts)
        texts = texts.filter(mask)
        ids = ids.filter(mask)
        pre = pc.utf8_slice_codeunits(texts, 0, key_len)
        suf = pc.utf8_slice_codeunits(texts, -key_len)
        kh = np.concatenate([hash_utf8_array(pre), hash_utf8_array(suf)])
        return pa.table({
            id_col: pa.concat_arrays([ids, ids]),
            "key_hash": pa.array(kh, pa.int64()),
        })

    keyed = ds.map_batches(keys, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    edges = star_edges(keyed, id_col=id_col, hash_col="key_hash",
                       group_salt=group_salt)
    nodes = ds.select_columns([id_col, *carry_cols])
    labels = connected_components(edges, nodes, id_col=id_col,
                                  max_rounds=max_rounds,
                                  pointer_jump=pointer_jump, buckets=buckets,
                                  driver_threshold=driver_threshold,
                                  carry_cols=carry_cols)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["doc_id", "cluster_id", *carry_cols])

    return labels.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def iterative_rank(edges, iters: int = 3, scale: int = 1_000_000,
                   damp_num: int = 17, damp_den: int = 20,
                   spill_dir: str | None = None, tier: str = "shuffle",
                   max_broadcast_nodes: int = 4_000_000):
    """Fixed-point iterative rank propagation (PageRank shape) over a
    directed edge Dataset (src:int64, dst:int64) — the canonical iterative
    distributed algorithm: r_{t+1}(v) = base + sum over in-edges (u->v) of
    floor(damp_num * r_t(u) / (damp_den * deg_out(u))), with
    base = (damp_den - damp_num) * scale // damp_den and r_0 = scale.

    ALL integer arithmetic (floor divisions of positive int64) so an
    unrolled SQL CTE chain replays it bit-for-bit — no float summation-order
    divergence, unlike textbook float PageRank.

    Two tiers, identical result set (pinned by a forced-tier parity test):

    - ``shuffle`` (default; any node count): the edge+degree projection is
      consumed once per iteration, so it is SPILLED TO PARQUET once (the
      persist-shared-projection rule — a corpus-wide edge set must not pin
      the object store); each iteration is one bucketed hash join (ranks
      ride the shuffle, 16 B/row) plus one salted reduce of per-batch
      pre-aggregated contribution partials.
    - ``broadcast`` (node count <= max_broadcast_nodes AND source-set ==
      dst-set, i.e. undirected callers): ranks+degrees live in one
      broadcast numpy pair (ray.put per iteration); each iteration is a
      NARROW pass over the spilled (src, dst) projection with per-batch
      exact int64 reduceat partials and a bounded-group driver rollup —
      zero per-iteration shuffles (measured 18.9 -> ~6 s sf0.1@32 for the
      co-order graph; the wide steps left are the caller's edge build).
      Falls back to shuffle if either precondition fails.

    Rank mass is conserved (~nodes * scale), so hub sums stay inside int64.
    Returns (node:int64, r:int64) — a Dataset (shuffle) or pa.Table
    (broadcast) — over every node that appears as an edge source (callers
    wanting undirected semantics pass both edge directions, making
    source-set == node-set)."""
    import os
    import tempfile

    from ..util import strip_schema_metadata
    from .agg import salted_group_reduce

    base = (damp_den - damp_num) * scale // damp_den
    i64 = pa.int64()
    dn = np.int64(damp_num)
    dd = np.int64(damp_den)

    if tier == "broadcast":
        import ray
        import ray.data as rd

        from .agg import driver_group_rollup

        # one-time spill of the raw (src, dst) projection — consumed by the
        # degree pass + every iteration
        out_dir = spill_dir or tempfile.mkdtemp(prefix="iterrank_", dir="/tmp")
        edges.map_batches(strip_schema_metadata, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None).write_parquet(out_dir)

        def _edges_raw():
            return rd.read_parquet(out_dir, columns=["src", "dst"]).map_batches(
                strip_schema_metadata, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=None)

        # ONE pass: per-batch out-degree AND in-degree partials per node
        def deg_partial(b: pa.Table) -> pa.Table:
            parts = []
            for col, alias in (("src", "cs"), ("dst", "cd")):
                g = (b.select([col]).group_by(col, use_threads=False)
                     .aggregate([([], "count_all")]))
                z = np.zeros(g.num_rows, np.int64)
                c = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
                parts.append(pa.table({
                    "node": g[col],
                    "cs": pa.array(c if alias == "cs" else z),
                    "cd": pa.array(z if alias == "cs" else c)}))
            return pa.concat_tables(parts)

        try:
            degs = driver_group_rollup(
                _edges_raw().map_batches(deg_partial, batch_format="pyarrow",
                                         zero_copy_batch=True, batch_size=None),
                ["node"], [("cs", "sum", "cs"), ("cd", "sum", "cd")],
                max_partial_rows=4 * max_broadcast_nodes)
            nodes = degs["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        except ValueError:
            # partial-row guard tripped — node domain is NOT bounded (the
            # auto gate was optimistic); take the any-scale plan
            nodes = None
        if nodes is None or len(nodes) > max_broadcast_nodes:
            return iterative_rank(_edges_raw(), iters=iters, scale=scale,
                                  damp_num=damp_num, damp_den=damp_den,
                                  tier="shuffle")
        cs = degs["cs"].to_numpy(zero_copy_only=False).astype(np.int64)
        cd = degs["cd"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes, cs, cd = nodes[order], cs[order], cd[order]
        if (cs == 0).any() or (cd == 0).any():
            # directed graphs where the rank domain SHRINKS per iteration
            # (the shuffle tier's group-by-dst semantics) are out of this
            # tier's contract — take the general plan
            return iterative_rank(_edges_raw(), iters=iters, scale=scale,
                                  damp_num=damp_num, damp_den=damp_den,
                                  tier="shuffle")

        static_ref = ray.put((nodes, cs))
        ranks = np.full(len(nodes), scale, np.int64)
        nparts = len(nodes)
        for _ in range(iters):
            r_ref = ray.put(ranks)

            def contrib_partial(b: pa.Table, _r=r_ref) -> pa.Table:
                nd, deg_arr = ray.get(static_ref)
                r = ray.get(_r)
                src = b["src"].to_numpy(zero_copy_only=False)
                dst = b["dst"].to_numpy(zero_copy_only=False)
                si = np.searchsorted(nd, src)
                c = (dn * r[si]) // (dd * deg_arr[si])
                di = np.searchsorted(nd, dst)
                oo = np.argsort(di, kind="stable")
                dio, co = di[oo], c[oo]
                st = np.nonzero(np.r_[True, dio[1:] != dio[:-1]])[0]
                sums = np.add.reduceat(co, st) if len(co) else co
                return pa.table({"node": pa.array(nd[dio[st]]),
                                 "c": pa.array(sums.astype(np.int64))})

            part = driver_group_rollup(
                _edges_raw().map_batches(contrib_partial, batch_format="pyarrow",
                                         zero_copy_batch=True, batch_size=None),
                ["node"], [("c", "sum", "c")],
                max_partial_rows=4 * max_broadcast_nodes)
            pn = part["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            pc_ = part["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            ranks = np.full(nparts, base, np.int64)
            ranks[np.searchsorted(nodes, pn)] += pc_
        return pa.table({"node": pa.array(nodes), "r": pa.array(ranks)})

    # --- shuffle tier -------------------------------------------------------
    # degree + one-time parquet spill of the (src, dst, d) projection
    deg = salted_group_reduce(edges, ["src"], [(None, "count", "d")])
    ed = bucketed_hash_join(
        edges, deg, on="src",
        schemas=(pa.schema([("src", i64), ("dst", i64)]),
                 pa.schema([("src", i64), ("d", i64)])))
    out_dir = spill_dir or tempfile.mkdtemp(prefix="iterrank_", dir="/tmp")
    ed.map_batches(strip_schema_metadata, batch_format="pyarrow",
                   zero_copy_batch=True, batch_size=None).write_parquet(out_dir)
    if not any(f.name.endswith(".parquet") for f in os.scandir(out_dir)):
        # zero-block edge set (empty graph): no nodes, no ranks
        import ray.data as rd

        return rd.range(0)

    def _edges_deg():
        import ray.data as rd

        return rd.read_parquet(out_dir, columns=["src", "dst", "d"]).map_batches(
            strip_schema_metadata, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None)

    # --- r0: every source node at `scale` -----------------------------------
    def init_r(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"],
                         "r": pa.array(np.full(len(b), scale, np.int64))})

    ranks = deg.map_batches(init_r, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)


    def contrib_partial(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        c = (dn * r) // (dd * d)
        t = pa.table({"dst": b["dst"], "c": pa.array(c)})
        g = t.group_by("dst", use_threads=False).aggregate([("c", "sum")])
        return g.rename_columns(["dst", "c"])

    def finish(b: pa.Table) -> pa.Table:
        s = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({"src": b["dst"],
                         "r": pa.array(base + s.astype(np.int64))})

    for _ in range(iters):
        joined = bucketed_hash_join(
            _edges_deg(), ranks, on="src",
            schemas=(pa.schema([("src", i64), ("dst", i64), ("d", i64)]),
                     pa.schema([("src", i64), ("r", i64)])))
        part = joined.map_batches(contrib_partial, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
        ranks = salted_group_reduce(part, ["dst"], [("c", "sum", "c")]).map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["node", "r"])

    return ranks.map_batches(rename, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
