"""Ray Data raster stages: tile tables, reader actor pools, mosaic merge,
pyramid build, per-tile transforms, polygonal summary over rasters.

Tile-table model (SURVEY.md §1.2): one row per tile —
  (src_id:int32, tile_col:int64, tile_row:int64, band_count:int16,
   cols:int32, rows:int32, cell_type:string, xmin/ymin/xmax/ymax:float64,
   pixels:binary)                       # C-order (bands, rows, cols) bytes

Reader state (ST1/ST2): sources are opened ONCE per actor in __init__ and
reused across windows — the actor is the single-threaded owner of its handle
(designs away tiff.synchronized, GeoTiffRasterSource.scala:84,92).
The wide ops shuffle on (tile_col, tile_row); merge order inside a group is
made deterministic by carrying src_id (J2 determinism, SURVEY.md hard part b).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.celltype import CellType, convert as ct_convert
from ..core.grid import Extent, LayoutDefinition
from ..sources.raster_source import Raster, RasterSource

TILE_SCHEMA = pa.schema(
    [
        ("src_id", pa.int32()),
        ("tile_col", pa.int64()),
        ("tile_row", pa.int64()),
        ("band_count", pa.int16()),
        ("cols", pa.int32()),
        ("rows", pa.int32()),
        ("cell_type", pa.string()),
        ("xmin", pa.float64()),
        ("ymin", pa.float64()),
        ("xmax", pa.float64()),
        ("ymax", pa.float64()),
        ("pixels", pa.binary()),
    ]
)


def tile_row(src_id: int, key: tuple[int, int], raster: Raster, cell_type: CellType) -> dict:
    b, r, c = raster.pixels.shape
    e = raster.extent
    return {
        "src_id": src_id,
        "tile_col": key[0],
        "tile_row": key[1],
        "band_count": b,
        "cols": c,
        "rows": r,
        "cell_type": cell_type.name,
        "xmin": e.xmin,
        "ymin": e.ymin,
        "xmax": e.xmax,
        "ymax": e.ymax,
        "pixels": raster.pixels.tobytes(),
    }


def tile_pixels(row: dict) -> np.ndarray:
    """Decode a tile row's pixels back to (bands, rows, cols)."""
    ct = CellType.of(row["cell_type"])
    return np.frombuffer(row["pixels"], dtype=ct.np_dtype).reshape(
        row["band_count"], row["rows"], row["cols"]
    )


class _TileBatch:
    """Zero-copy row access over a tile-table batch (VERDICT r3 #9):
    metadata columns decode ONCE per batch into numpy arrays and each row's
    pixel block is a buffer-slice VIEW into the Arrow binary column —
    ``batch.to_pylist()`` copied every pixel blob into python bytes (128 KB
    per 256^2 int16 tile) before any work happened."""

    _META = ("src_id", "tile_col", "tile_row", "band_count", "cols", "rows",
             "xmin", "ymin", "xmax", "ymax", "pos")

    def __init__(self, batch: pa.Table):
        self.n = len(batch)
        self.meta = {
            name: batch[name].to_numpy(zero_copy_only=False)
            for name in self._META if name in batch.column_names
        }
        self.cell_type = batch["cell_type"].to_pylist()
        arr = batch["pixels"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        self._offs = np.frombuffer(arr.buffers()[1], dtype=off_dt)[
            arr.offset : arr.offset + self.n + 1
        ].astype(np.int64)
        buf = arr.buffers()[2]
        self._data = (np.frombuffer(buf, dtype=np.uint8)
                      if buf is not None else np.zeros(0, np.uint8))

    def ct(self, i: int) -> CellType:
        return CellType.of(self.cell_type[i])

    def raw(self, i: int) -> np.ndarray:
        """The row's pixel bytes as a uint8 buffer VIEW (np.frombuffer-able)."""
        return self._data[self._offs[i] : self._offs[i + 1]]

    def pixels(self, i: int) -> np.ndarray:
        """(bands, rows, cols) VIEW into the arrow buffer (read-only)."""
        ct = self.ct(i)
        raw = self._data[self._offs[i] : self._offs[i + 1]]
        return raw.view(ct.np_dtype).reshape(
            int(self.meta["band_count"][i]), int(self.meta["rows"][i]),
            int(self.meta["cols"][i]))


# worker-process-global source-list cache for the task tier of tile_dataset
# (same reuse semantics as joins._WORKER_INTERVAL_CACHE: Ray's prestarted
# workers persist module state, so headers/handles are constructed once per
# WORKER, not once per task — ST1 without per-query actor-pool spin-up).
_WORKER_SOURCE_CACHE: dict = {}


def _cached_sources(sources_ref):
    import ray

    key = sources_ref.hex()
    srcs = _WORKER_SOURCE_CACHE.get(key)
    if srcs is None:
        srcs = ray.get(sources_ref)
        _WORKER_SOURCE_CACHE.clear()  # one live source list per worker
        _WORKER_SOURCE_CACHE[key] = srcs
    return srcs


def _read_windows(sources, layout, bands, batch: pa.Table) -> pa.Table:
    out = []
    for sid, c, r in zip(
        batch["src_id"].to_numpy(zero_copy_only=False),
        batch["tile_col"].to_numpy(zero_copy_only=False),
        batch["tile_row"].to_numpy(zero_copy_only=False),
    ):
        source = sources[sid]
        raster = source.read(layout.key_extent(int(c), int(r)), bands)
        if raster is None:
            continue
        out.append(tile_row(int(sid), (int(c), int(r)), raster, source.cell_type))
    if not out:
        return TILE_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=TILE_SCHEMA)


class WindowReader:
    """Actor-pool stage (ST1): batch of (src_id, tile_col, tile_row) window
    requests -> tile rows.  Sources are constructed once per actor from the
    broadcast source list; per-source overview choice is memoized (ST4)."""

    def __init__(self, sources_ref, layout: LayoutDefinition, bands=None):
        import ray

        src = sources_ref
        self.sources: list[RasterSource] = ray.get(src) if not isinstance(src, list) else src
        self.layout = layout
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _read_windows(self.sources, self.layout, self.bands, batch)


def tile_dataset(sources: list[RasterSource], layout: LayoutDefinition, *, concurrency=None,
                 bands=None, key_filter=None, compute: str = "tasks"):
    """RasterSourceRDD.read analog (CHANGELOG.md:71,85): enumerate layout keys
    intersecting each source (row-major, J4), fan the (src, key) request table
    through a window-reader stage -> tile-row Dataset.

    ``compute="tasks"`` (default) reads windows in plain Ray tasks with the
    source list cached once per WORKER process (module-global, keyed on the
    broadcast ref) — ST1 handle reuse without actor-pool spin-up, which
    costs ~1.3 s of fixed wall per query on this host (measured: 36-tile
    layer 1.8-2.0 s actor pool vs 0.5-0.8 s tasks).  ``compute="actors"``
    keeps the dedicated WindowReader pool — the right tier when source
    construction is so expensive that per-worker duplication hurts (every
    worker caches its own copy under tasks; an actor pool bounds the number
    of live handle sets to the pool size)."""
    import ray
    import ray.data as rd

    from ..util import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size()
    sources_ref = ray.put(sources)

    # request generation is DATAFLOW, not a driver loop: the driver holds one
    # row per source; each task enumerates its sources' layout keys (which
    # for lazy sources also keeps metadata/header reads off the driver).
    # Driver memory stays O(sources), not O(tiles) — a million-tile catalog
    # never materializes its key list in one process.
    src_table = pa.table({"src_id": pa.array(np.arange(len(sources), dtype=np.int32))})

    def expand(batch: pa.Table) -> pa.Table:
        srcs = ray.get(sources_ref)
        sid_out, col_out, row_out = [], [], []
        for sid in batch["src_id"].to_numpy(zero_copy_only=False):
            keys = layout.keys_for_extent(srcs[sid].extent)
            arr = np.asarray(keys, dtype=np.int64).reshape(len(keys), 2)
            if key_filter is not None:
                # prune REQUESTS, not tiles: filtered windows are never read
                arr = arr[key_filter(arr[:, 0], arr[:, 1])]
            sid_out.append(np.full(len(arr), sid, dtype=np.int32))
            col_out.append(arr[:, 0])
            row_out.append(arr[:, 1])
        return pa.table(
            {
                "src_id": pa.array(np.concatenate(sid_out) if sid_out else [], pa.int32()),
                "tile_col": pa.array(np.concatenate(col_out) if col_out else [], pa.int64()),
                "tile_row": pa.array(np.concatenate(row_out) if row_out else [], pa.int64()),
            }
        )

    reqs = (
        rd.from_arrow(src_table)
        .map_batches(expand, batch_format="pyarrow", batch_size=max(1, len(sources) // (concurrency * 2)) if sources else 1)
        .repartition(concurrency * 4)
    )
    if compute == "actors":
        return reqs.map_batches(
            WindowReader,
            fn_constructor_kwargs={"sources_ref": sources_ref, "layout": layout, "bands": bands},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            concurrency=concurrency,
        )

    def read_windows(batch: pa.Table) -> pa.Table:
        return _read_windows(_cached_sources(sources_ref), layout, bands, batch)

    return reqs.map_batches(
        read_windows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def mosaic_merge(tiles_ds, layout: LayoutDefinition, block_shift: int = 3):
    """J2/A3: groupby(tile key) -> first-non-nodata-wins merge at the widened
    cell type; source order (src_id) carried into the reduce for determinism.

    The shuffle key is the tile-key BLOCK ((col >> block_shift,
    row >> block_shift) — 64 tiles per group at the default): per-group
    overhead is paid once per block instead of once per tile, and a
    million-tile layer makes ~16k groups, not a million.  Tiles in a block
    are merged independently inside the group."""

    def merge_one(tb: "_TileBatch", idxs: np.ndarray) -> dict:
        ct = tb.ct(int(idxs[0]))
        for i in idxs[1:]:
            ct = ct.union(tb.ct(int(i)))
        m = tb.meta
        first = int(idxs[0])
        key = (int(m["tile_col"][first]), int(m["tile_row"][first]))
        ext = layout.key_extent(*key)
        # target grid: finest cell size among contributors, tile-aligned
        cw = min((m["xmax"][i] - m["xmin"][i]) / m["cols"][i] for i in idxs)
        ch = min((m["ymax"][i] - m["ymin"][i]) / m["rows"][i] for i in idxs)
        tcols = int(round(ext.width / cw))
        trows = int(round(ext.height / ch))
        nd = ct.nodata if ct.nodata is not None else 0
        acc = np.full((int(m["band_count"][first]), trows, tcols), nd, dtype=ct.np_dtype)
        filled = np.zeros(acc.shape, dtype=bool)
        tx = ext.xmin + (np.arange(tcols) + 0.5) * cw
        ty = ext.ymax - (np.arange(trows) + 0.5) * ch
        for i in idxs:
            i = int(i)
            px = ct_convert(tb.pixels(i), tb.ct(i), ct)
            xmin, xmax = float(m["xmin"][i]), float(m["xmax"][i])
            ymax = float(m["ymax"][i])
            ncols, nrows = int(m["cols"][i]), int(m["rows"][i])
            scw = (xmax - xmin) / ncols
            sch = (ymax - float(m["ymin"][i])) / nrows
            col = np.floor((tx - xmin) / scw).astype(np.int64)
            rr = np.floor((ymax - ty) / sch).astype(np.int64)
            okc = (col >= 0) & (col < ncols)
            okr = (rr >= 0) & (rr < nrows)
            col = np.clip(col, 0, ncols - 1)
            rr = np.clip(rr, 0, nrows - 1)
            ok = okr[:, None] & okc[None, :]
            samp = px[:, rr[:, None], col[None, :]]
            if ct.nodata is not None and np.issubdtype(acc.dtype, np.floating) and np.isnan(ct.nodata):
                have = ~np.isnan(samp) & ok[None]
            elif ct.nodata is not None:
                have = (samp != ct.nodata) & ok[None]
            else:
                have = np.broadcast_to(ok[None], samp.shape)
            write = have & ~filled
            acc[write] = samp[write]
            filled |= have
        return tile_row(-1, key, Raster(acc, ext), ct)

    def merge_block(g: pa.Table) -> pa.Table:
        # arrow end-to-end: per-row pixel blobs stay buffer views (the old
        # pandas records path copied every blob through python dicts)
        order = np.lexsort((
            g["src_id"].to_numpy(zero_copy_only=False),
            g["tile_row"].to_numpy(zero_copy_only=False),
            g["tile_col"].to_numpy(zero_copy_only=False),
        ))
        g = g.take(pa.array(order))
        tb = _TileBatch(g)
        tc = tb.meta["tile_col"]
        tr = tb.meta["tile_row"]
        starts = np.nonzero(np.r_[True, (tc[1:] != tc[:-1]) | (tr[1:] != tr[:-1])])[0]
        ends = np.r_[starts[1:], tb.n]
        out = [merge_one(tb, np.arange(s, e)) for s, e in zip(starts, ends)]
        return pa.Table.from_pylist(out, schema=TILE_SCHEMA)

    def add_block(b: pa.Table) -> pa.Table:
        bc = b["tile_col"].to_numpy(zero_copy_only=False) >> block_shift
        br = b["tile_row"].to_numpy(zero_copy_only=False) >> block_shift
        return b.append_column("_bcol", pa.array(bc)).append_column("_brow", pa.array(br))

    from .agg import _default_shuffle_partitions

    blocked = tiles_ds.map_batches(add_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # sort-shuffle fixed cost scales with input block count — coalesce narrow
    blocked = blocked.repartition(_default_shuffle_partitions())
    return blocked.groupby(["_bcol", "_brow"]).map_groups(merge_block, batch_format="pyarrow")


def convert_tiles(tiles_ds, target: CellType, gdal_clamp: bool = False):
    """T6 over tile tables: per-batch vectorized cell-type conversion."""

    def conv(batch: pa.Table) -> pa.Table:
        tb = _TileBatch(batch)
        out_px = [
            ct_convert(tb.pixels(i), tb.ct(i), target, gdal_clamp).tobytes()
            for i in range(tb.n)
        ]
        i_px = batch.column_names.index("pixels")
        i_ct = batch.column_names.index("cell_type")
        return (batch.set_column(i_px, "pixels", pa.array(out_px, pa.binary()))
                .set_column(i_ct, "cell_type",
                            pa.array([target.name] * tb.n, pa.string())))

    return tiles_ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def pyramid_build(tiles_ds, levels: int, layout: LayoutDefinition | None = None,
                  method: str = "nearest"):
    """A7: true pyramid build — each level is produced by groupby(parent key)
    assembling the 2x2 children into one tile downsampled 2x (nearest).
    Returns list of per-level Datasets, finest (input) first.

    With ``layout`` (the finest level's LayoutDefinition) parent frames are
    derived from the LAYOUT: uniform (tile_cols x tile_rows) parent pixel
    grids and key-derived extents, so ragged data edges (partial children)
    land in a correctly georeferenced full-size parent with NoData padding.
    Without a layout, the parent frame is inferred from the first child's
    dims + tile parity (valid only for uniform child tiles).

    The per-level shuffle moves ~1/4 the previous level's bytes; at 100 TB
    the levels are written out as they are produced (write_tiles)."""
    out = [tiles_ds]
    cur = tiles_ds
    cur_tw = layout.tile_width if layout is not None else None
    cur_th = layout.tile_height if layout is not None else None

    def mk_make_parent(tw, th):
        def make_one(tb: "_TileBatch", idxs: np.ndarray) -> dict:
            m = tb.meta
            fi = int(idxs[0])
            ct = tb.ct(fi)
            nd = ct.nodata if ct.nodata is not None else 0
            pc, pr = int(m["tile_col"][fi]) >> 1, int(m["tile_row"][fi]) >> 1
            if layout is not None:
                tcols, trows = layout.tile_cols, layout.tile_rows
                pxmin = layout.extent.xmin + pc * 2.0 * tw
                pymax = layout.extent.ymax - pr * 2.0 * th
                ext = Extent(pxmin, pymax - 2.0 * th, pxmin + 2.0 * tw, pymax)
            else:
                tcols, trows = int(m["cols"][fi]), int(m["rows"][fi])
                w = float(m["xmax"][fi]) - float(m["xmin"][fi])
                h = float(m["ymax"][fi]) - float(m["ymin"][fi])
                pxmin = float(m["xmin"][fi]) - (int(m["tile_col"][fi]) % 2) * w
                pymax = float(m["ymax"][fi]) + (int(m["tile_row"][fi]) % 2) * h
                ext = Extent(pxmin, pymax - 2.0 * h, pxmin + 2.0 * w, pymax)
            acc = np.full((int(m["band_count"][fi]), trows, tcols), nd, dtype=ct.np_dtype)
            half_c, half_r = tcols // 2, trows // 2
            for i in idxs:
                i = int(i)
                row = {
                    "tile_col": int(m["tile_col"][i]),
                    "tile_row": int(m["tile_row"][i]),
                    "xmin": float(m["xmin"][i]), "ymax": float(m["ymax"][i]),
                }
                child = tb.pixels(i)
                if layout is not None:
                    # place by the child's ACTUAL georeference, not key
                    # parity alone: a footprint-clipped edge tile starts K
                    # child-cells into its key extent, so its decimation
                    # must sample even GLOBAL cell indices (stride offset
                    # K%2) and land K//2-ish parent cells into the quadrant
                    # — parity placement alone shifts clipped tiles west/up
                    cw, ch = tw / tcols, th / trows
                    key_xmin = layout.extent.xmin + int(row["tile_col"]) * tw
                    key_ymax = layout.extent.ymax - int(row["tile_row"]) * th
                    kc = int(round((row["xmin"] - key_xmin) / cw))
                    kr = int(round((key_ymax - row["ymax"]) / ch))
                    coff, roff = kc % 2, kr % 2
                    if method == "average":
                        from ..core.resample import AVERAGE, resample as rs_resample

                        sub = child[:, roff:, coff:]
                        px = rs_resample(
                            sub, -(-sub.shape[1] // 2), -(-sub.shape[2] // 2),
                            AVERAGE, nodata=ct.nodata,
                        ).astype(ct.np_dtype, copy=False)
                    else:  # nearest even-global-cell decimation
                        px = child[:, roff::2, coff::2]
                    qc = (int(row["tile_col"]) % 2) * half_c + (kc + coff) // 2
                    qr = (int(row["tile_row"]) % 2) * half_r + (kr + roff) // 2
                    px = px[:, : max(trows - qr, 0), : max(tcols - qc, 0)]
                    acc[:, qr : qr + px.shape[1], qc : qc + px.shape[2]] = px
                    continue
                if method == "average":
                    from ..core.resample import AVERAGE, resample as rs_resample

                    px = rs_resample(
                        child, -(-child.shape[1] // 2), -(-child.shape[2] // 2),
                        AVERAGE, nodata=ct.nodata,
                    ).astype(ct.np_dtype, copy=False)
                else:  # nearest 2x decimation (the oracle-checked default)
                    px = child[:, ::2, ::2]
                qc = (int(row["tile_col"]) % 2) * half_c
                qr = (int(row["tile_row"]) % 2) * half_r
                px = px[:, :half_r, :half_c]
                acc[:, qr : qr + px.shape[1], qc : qc + px.shape[2]] = px
            return tile_row(int(m["src_id"][fi]), (pc, pr), Raster(acc, ext), ct)

        def make_parents(g: pa.Table) -> pa.Table:
            pcol = g["pcol"].to_numpy(zero_copy_only=False)
            prow = g["prow"].to_numpy(zero_copy_only=False)
            order = np.lexsort((prow, pcol))
            g = g.take(pa.array(order))
            tb = _TileBatch(g)
            pcol, prow = pcol[order], prow[order]
            starts = np.nonzero(np.r_[True, (pcol[1:] != pcol[:-1]) | (prow[1:] != prow[:-1])])[0]
            ends = np.r_[starts[1:], tb.n]
            rows_out = [make_one(tb, np.arange(s, e)) for s, e in zip(starts, ends)]
            return pa.Table.from_pylist(rows_out, schema=TILE_SCHEMA)

        return make_parents

    # parents grouped by parent-key BLOCK (64 parents per group): per-group
    # overhead is per block, not per parent key (same rationale as
    # mosaic_merge)
    block_shift = 3
    for _ in range(levels):

        def add_parent(batch: pa.Table) -> pa.Table:
            pcol = batch["tile_col"].to_numpy(zero_copy_only=False) >> 1
            prow = batch["tile_row"].to_numpy(zero_copy_only=False) >> 1
            return (
                batch.append_column("pcol", pa.array(pcol))
                .append_column("prow", pa.array(prow))
                .append_column("_bcol", pa.array(pcol >> block_shift))
                .append_column("_brow", pa.array(prow >> block_shift))
            )

        from .agg import _default_shuffle_partitions

        cur = (
            cur.map_batches(add_parent, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
            .repartition(_default_shuffle_partitions())
            .groupby(["_bcol", "_brow"])
            .map_groups(mk_make_parent(cur_tw, cur_th), batch_format="pyarrow")
        )
        out.append(cur)
        if layout is not None:
            cur_tw *= 2.0
            cur_th *= 2.0
    return out


def summarize_tiles(tiles_ds, nodata_aware: bool = True, include_dims: bool = True):
    """Per-tile integer checksum table for oracle comparison: (tile_col,
    tile_row[, cols, rows], pixel_sum, n_valid) — sums exclude NoData cells
    when ``nodata_aware``.  Vectorized buffer decode (no per-pixel python)."""

    def summarize(b: pa.Table) -> pa.Table:
        sums, valids = [], []
        cts = b["cell_type"].to_pylist()
        bandc = b["band_count"].to_numpy(zero_copy_only=False)
        ncols = b["cols"].to_numpy(zero_copy_only=False)
        nrows = b["rows"].to_numpy(zero_copy_only=False)
        pixels = b["pixels"]
        for i in range(len(b)):
            ct = CellType.of(cts[i])
            px = np.frombuffer(pixels[i].as_py(), dtype=ct.np_dtype).reshape(
                int(bandc[i]), int(nrows[i]), int(ncols[i])
            )
            if nodata_aware and ct.nodata is not None:
                mask = ~ct.mask(px)
                sums.append(int(px[mask].sum(dtype=np.int64)) if mask.any() else 0)
                valids.append(int(mask.sum()))
            else:
                sums.append(int(px.sum(dtype=np.int64)))
                valids.append(px.size)
        cols = {
            "tile_col": b["tile_col"],
            "tile_row": b["tile_row"],
        }
        if include_dims:
            cols["cols"] = pa.array(ncols.astype(np.int64))
            cols["rows"] = pa.array(nrows.astype(np.int64))
        cols["pixel_sum"] = pa.array(sums, pa.int64())
        cols["n_valid"] = pa.array(valids, pa.int64())
        return pa.table(cols)

    return tiles_ds.map_batches(summarize, batch_format="pyarrow", batch_size=None)


_FOCAL_SCHEMA = pa.schema(
    [
        ("tile_col", pa.int64()),   # DESTINATION tile key
        ("tile_row", pa.int64()),
        ("pos", pa.int8()),         # (rel_dc+1) + 3*(rel_dr+1); 4 = center
        ("band_count", pa.int16()),
        ("cols", pa.int32()),
        ("rows", pa.int32()),
        ("cell_type", pa.string()),
        ("xmin", pa.float64()),     # meaningful for the center row only
        ("ymin", pa.float64()),
        ("xmax", pa.float64()),
        ("ymax", pa.float64()),
        ("pixels", pa.binary()),
    ]
)


def focal_tiles(tiles_ds, op: str = "mean", radius: int = 1, block_shift: int = 3):
    """Focal map algebra (geotrellis' focal ops family) over a tile Dataset
    with HALO EXCHANGE: every tile ships its 4 edge strips + 4 corners
    (each ``radius`` cells thin) to its neighbors, one groupby(tile-key
    BLOCK) assembles tile + received halos into a padded array, and the
    focal kernel runs vectorized (integral images for sum/mean, shifted
    extrema for min/max).

    Shuffle payload per tile = the tile + ~2*(W+H)*radius halo cells — NOT
    9 full tile replicas; groups are key BLOCKS (64 tiles/group at the
    default shift), so per-group overhead never scales with the layer.

    Window semantics match GDAL/geotrellis edge handling: each output cell
    aggregates the IN-BOUNDS, non-NoData subset of its (2r+1)^2 window
    (layer boundary cells use their partial window).  ``op``: "sum"
    (int64-exact for integer inputs — the oracle projection), "mean"
    (float64, NaN where the window is empty), "min"/"max" (float64),
    "gradient_x"/"gradient_y" (the Horn-stencil NUMERATOR (+1,+2,+1 /
    -1,-2,-1 cross-differences, missing neighbors contribute 0) — the
    integer-exact core of slope/hillshade; divide by 8*cellsize for the
    actual derivative).
    """
    if op not in ("sum", "mean", "min", "max", "gradient_x", "gradient_y", "hillshade"):
        raise ValueError(f"unknown focal op {op!r}")
    if (op.startswith("gradient") or op == "hillshade") and radius != 1:
        raise ValueError("gradient/hillshade ops are defined on the 3x3 stencil (radius=1)")
    d = int(radius)

    def emit(batch: pa.Table) -> pa.Table:
        tb = _TileBatch(batch)
        out = []
        for i in range(tb.n):
            px = tb.pixels(i)
            h, w = px.shape[1], px.shape[2]
            if d > min(h, w):
                # halos only reach ADJACENT tiles: windows wider than a tile
                # would silently read zeros two tiles away (and thin strips
                # mis-anchor) — refuse instead of returning wrong values
                raise ValueError(
                    f"focal radius {d} exceeds tile dims ({h}x{w}): halo "
                    f"exchange is single-ring; retile with larger tiles")
            c, r = int(tb.meta["tile_col"][i]), int(tb.meta["tile_row"][i])
            for dc in (-1, 0, 1):
                for dr in (-1, 0, 1):
                    if dc == 0 and dr == 0:
                        frag, pos = px, 4
                    else:
                        rs = slice(max(h - d, 0), h) if dr == 1 else (slice(0, min(d, h)) if dr == -1 else slice(0, h))
                        cs = slice(max(w - d, 0), w) if dc == 1 else (slice(0, w) if dc == 0 else slice(0, min(d, w)))
                        frag = px[:, rs, cs]
                        if frag.size == 0:
                            continue
                        # receiver-relative position of the SOURCE tile
                        pos = (-dc + 1) + 3 * (-dr + 1)
                    out.append({
                        "tile_col": c + dc, "tile_row": r + dr, "pos": pos,
                        "band_count": px.shape[0],
                        "cols": frag.shape[2], "rows": frag.shape[1],
                        "cell_type": tb.cell_type[i],
                        "xmin": float(tb.meta["xmin"][i]), "ymin": float(tb.meta["ymin"][i]),
                        "xmax": float(tb.meta["xmax"][i]), "ymax": float(tb.meta["ymax"][i]),
                        "pixels": np.ascontiguousarray(frag).tobytes(),
                    })
        if not out:
            return _FOCAL_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=_FOCAL_SCHEMA)

    def win_sum(arr: np.ndarray, k: int) -> np.ndarray:
        """(H+2d, W+2d) -> (H, W) sums of k x k windows via integral image."""
        cp = np.zeros((arr.shape[0] + 1, arr.shape[1] + 1), dtype=arr.dtype)
        np.cumsum(arr, axis=0, out=cp[1:, 1:][: arr.shape[0]])
        np.cumsum(cp[1:, 1:], axis=1, out=cp[1:, 1:])
        return cp[k:, k:] - cp[:-k, k:] - cp[k:, :-k] + cp[:-k, :-k]

    def focal_one(rows_for_key: list[dict]):
        center = next((x for x in rows_for_key if x["pos"] == 4), None)
        if center is None:
            return None  # fragments addressed past the layer edge
        ct = CellType.of(center["cell_type"])
        cpx = np.frombuffer(center["pixels"], dtype=ct.np_dtype).reshape(
            int(center["band_count"]), int(center["rows"]), int(center["cols"]))
        nb, h, w = cpx.shape
        pad = np.zeros((nb, h + 2 * d, w + 2 * d), np.float64)
        valid = np.zeros((nb, h + 2 * d, w + 2 * d), bool)

        def place(frag: np.ndarray, rel_dc: int, rel_dr: int):
            fh, fw = frag.shape[1], frag.shape[2]
            r0 = 0 if rel_dr == -1 else (d + h if rel_dr == 1 else d)
            c0 = 0 if rel_dc == -1 else (d + w if rel_dc == 1 else d)
            fh = min(fh, pad.shape[1] - r0)
            fw = min(fw, pad.shape[2] - c0)
            sub = frag[:, :fh, :fw].astype(np.float64)
            ok = ~ct.mask(sub) if ct.nodata is not None else np.ones(sub.shape, bool)
            pad[:, r0:r0 + fh, c0:c0 + fw] = np.where(ok, sub, 0.0)
            valid[:, r0:r0 + fh, c0:c0 + fw] = ok

        place(cpx, 0, 0)
        for x in rows_for_key:
            if x["pos"] == 4:
                continue
            rel = int(x["pos"])
            fct = CellType.of(x["cell_type"])
            frag = np.frombuffer(x["pixels"], dtype=fct.np_dtype).reshape(
                int(x["band_count"]), int(x["rows"]), int(x["cols"]))
            place(frag, rel % 3 - 1, rel // 3 - 1)

        k = 2 * d + 1
        if op == "hillshade":
            # GDAL-style hillshade (azimuth 315, altitude 45, z=1) from the
            # same Horn stencil + halo plan as the gradient ops; output
            # scaled to 0..255 int64.  Shares the gradient family's edge
            # semantics (missing neighbors contribute 0 to the numerators).
            work = np.where(valid, pad, 0.0)
            agx = np.zeros((nb, h, w), np.float64)
            agy = np.zeros((nb, h, w), np.float64)
            for dr_ in (-1, 0, 1):
                for dc_ in (-1, 0, 1):
                    sl = work[:, d + dr_:d + dr_ + h, d + dc_:d + dc_ + w]
                    wx = dc_ * (2 if dr_ == 0 else 1)
                    wy = dr_ * (2 if dc_ == 0 else 1)
                    if wx:
                        agx += wx * sl
                    if wy:
                        agy += wy * sl
            dx = (center["xmax"] - center["xmin"]) / w
            dy = (center["ymax"] - center["ymin"]) / h
            gx = agx / (8.0 * dx)
            gy = agy / (8.0 * dy)
            az, alt = np.deg2rad(315.0), np.deg2rad(45.0)
            slope = np.arctan(np.sqrt(gx * gx + gy * gy))
            aspect = np.arctan2(gy, -gx)
            hs = (np.sin(alt) * np.cos(slope)
                  + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect))
            res = np.rint(255.0 * np.clip(hs, 0.0, 1.0)).astype(np.int64)
            out_ct = CellType("int64", None)
        elif op.startswith("gradient"):
            work = np.where(valid, pad, 0.0)
            agg = np.zeros((nb, h, w), np.float64)
            for dr_ in (-1, 0, 1):
                for dc_ in (-1, 0, 1):
                    if op == "gradient_x":
                        wgt = dc_ * (2 if dr_ == 0 else 1)
                    else:
                        wgt = dr_ * (2 if dc_ == 0 else 1)
                    if wgt == 0:
                        continue
                    agg += wgt * work[:, d + dr_:d + dr_ + h, d + dc_:d + dc_ + w]
            res = np.rint(agg).astype(np.int64)
            out_ct = CellType("int64", None)
        elif op in ("sum", "mean"):
            sums = np.stack([win_sum(pad[b], k) for b in range(nb)])
            cnts = np.stack([win_sum(valid[b].astype(np.float64), k) for b in range(nb)])
            if op == "sum":
                res = np.rint(sums).astype(np.int64)
                out_ct = CellType("int64", None)
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    res = sums / cnts
                res[cnts == 0] = np.nan
                out_ct = CellType("float64", float("nan"))
        else:
            fill = np.inf if op == "min" else -np.inf
            work = np.where(valid, pad, fill)
            agg = np.full((nb, h, w), fill)
            reduce_ = np.minimum if op == "min" else np.maximum
            for sr in range(k):
                for sc in range(k):
                    agg = reduce_(agg, work[:, sr:sr + h, sc:sc + w])
            res = np.where(np.isfinite(agg), agg, np.nan)
            out_ct = CellType("float64", float("nan"))
        ext = Extent(center["xmin"], center["ymin"], center["xmax"], center["ymax"])
        return tile_row(-1, (int(center["tile_col"]), int(center["tile_row"])),
                        Raster(res, ext), out_ct)

    def focal_block(g: pa.Table) -> pa.Table:
        # arrow-native: fragment pixel blobs stay buffer views end-to-end
        tc0 = g["tile_col"].to_numpy(zero_copy_only=False)
        tr0 = g["tile_row"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tr0, tc0))
        g = g.take(pa.array(order))
        tb = _TileBatch(g)
        m = tb.meta
        tc, tr = m["tile_col"], m["tile_row"]
        starts = np.nonzero(np.r_[True, (tc[1:] != tc[:-1]) | (tr[1:] != tr[:-1])])[0]
        ends = np.r_[starts[1:], tb.n]
        out = []
        for s, e in zip(starts, ends):
            rows = [{
                "pos": int(m["pos"][i]),
                "tile_col": int(tc[i]), "tile_row": int(tr[i]),
                "band_count": int(m["band_count"][i]),
                "cols": int(m["cols"][i]), "rows": int(m["rows"][i]),
                "cell_type": tb.cell_type[i],
                "xmin": float(m["xmin"][i]), "ymin": float(m["ymin"][i]),
                "xmax": float(m["xmax"][i]), "ymax": float(m["ymax"][i]),
                "pixels": tb.raw(i),
            } for i in range(s, e)]
            row = focal_one(rows)
            if row is not None:
                out.append(row)
        return pa.Table.from_pylist(out, schema=TILE_SCHEMA)

    def add_block(b: pa.Table) -> pa.Table:
        bc = b["tile_col"].to_numpy(zero_copy_only=False) >> block_shift
        br = b["tile_row"].to_numpy(zero_copy_only=False) >> block_shift
        return b.append_column("_bcol", pa.array(bc)).append_column("_brow", pa.array(br))

    frags = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
    from .agg import _default_shuffle_partitions

    blocked = frags.map_batches(add_block, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
    # sort-shuffle fixed cost scales with input block count — coalesce narrow
    blocked = blocked.repartition(_default_shuffle_partitions())
    return blocked.groupby(["_bcol", "_brow"]).map_groups(focal_block, batch_format="pyarrow")


def sparse_stitch(tile_rows: list[dict], cell_type: CellType | None = None) -> Raster | None:
    """GeotrellisRasterSource.sparseStitch analog (CHANGELOG.md:110): stitch a
    SPARSE set of tiles into one raster covering their union extent; missing
    tiles stay NoData.  Pure (driver-side or inside map_groups) — the tile
    set is one key-neighborhood, not a whole layer."""
    if not tile_rows:
        return None
    first = tile_rows[0]
    ct = cell_type or CellType.of(first["cell_type"])
    xmin = min(r["xmin"] for r in tile_rows)
    ymin = min(r["ymin"] for r in tile_rows)
    xmax = max(r["xmax"] for r in tile_rows)
    ymax = max(r["ymax"] for r in tile_rows)
    cw = (first["xmax"] - first["xmin"]) / first["cols"]
    ch = (first["ymax"] - first["ymin"]) / first["rows"]
    cols = int(round((xmax - xmin) / cw))
    rows_ = int(round((ymax - ymin) / ch))
    nd = ct.nodata if ct.nodata is not None else 0
    acc = np.full((int(first["band_count"]), rows_, cols), nd, dtype=ct.np_dtype)
    for r in tile_rows:
        px = ct_convert(tile_pixels(r), CellType.of(r["cell_type"]), ct)
        c0 = int(round((r["xmin"] - xmin) / cw))
        r0 = int(round((ymax - r["ymax"]) / ch))
        acc[:, r0 : r0 + px.shape[1], c0 : c0 + px.shape[2]] = px
    return Raster(acc, Extent(xmin, ymin, xmax, ymax))


def write_tiles(tiles_ds, path: str, partition_key: str | None = None):
    """S7: resumable tile sink — partitioned parquet.  With ``partition_key``
    (e.g. "tile_col" or a precomputed zoom/key-range column) output lands in
    one directory per key value, so a failed run resumes by skipping
    completed partitions; never one giant file."""
    if partition_key is not None:
        tiles_ds.write_parquet(path, partition_cols=[partition_key])
    else:
        tiles_ds.write_parquet(path)
    return path


def polygonal_summary_tiles(tiles_ds, ring: np.ndarray, nodata_aware: bool = True):
    """J6 raster variant: zonal stats of a polygon over a tile dataset.

    Per tile: mask = polygon PIP at cell centers (vectorized ray cast),
    partial (sum, count, min, max) per batch; one global final combine —
    the canonical masked-stats -> partial -> tiny-aggregate shape."""
    from ..core.geom import points_in_ring

    def partial(batch: pa.Table) -> pa.Table:
        s = 0.0
        cnt = 0
        mn, mx = np.inf, -np.inf
        tb = _TileBatch(batch)
        for i in range(tb.n):
            px = tb.pixels(i).astype(np.float64)
            ct = tb.ct(i)
            m = tb.meta
            xmin, xmax = float(m["xmin"][i]), float(m["xmax"][i])
            ymin, ymax = float(m["ymin"][i]), float(m["ymax"][i])
            ncols, nrows = int(m["cols"][i]), int(m["rows"][i])
            cw = (xmax - xmin) / ncols
            ch = (ymax - ymin) / nrows
            cx = xmin + (np.arange(ncols) + 0.5) * cw
            cy = ymax - (np.arange(nrows) + 0.5) * ch
            gx, gy = np.meshgrid(cx, cy)
            inside = points_in_ring(gx.ravel(), gy.ravel(), ring).reshape(nrows, ncols)
            for b in range(px.shape[0]):
                vals = px[b][inside]
                if nodata_aware and ct.nodata is not None:
                    if np.isnan(ct.nodata):
                        vals = vals[~np.isnan(vals)]
                    else:
                        vals = vals[vals != ct.nodata]
                if len(vals):
                    s += float(vals.sum())
                    cnt += int(len(vals))
                    mn = min(mn, float(vals.min()))
                    mx = max(mx, float(vals.max()))
        return pa.table({"psum": [s], "pcnt": [cnt], "pmin": [mn], "pmax": [mx]})

    part = tiles_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from ray.data.aggregate import Max, Min, Sum

    res = part.aggregate(
        Sum("psum", alias_name="sum"),
        Sum("pcnt", alias_name="count"),
        Min("pmin", alias_name="min"),
        Max("pmax", alias_name="max"),
    )
    res["mean"] = res["sum"] / res["count"] if res["count"] else float("nan")
    return res


def local_map_tiles(tiles_ds, fn, out_cell_type: CellType):
    """F11 as a first-class TILE-TABLE op: per-cell local map algebra
    (band math, classification, scaling) — ``fn((bands, r, c) ndarray) ->
    (out_bands, r, c) | (r, c)`` applied per tile inside one narrow batch
    pass (no shuffle; pixels decode as buffer views via _TileBatch)."""

    def apply(batch: pa.Table) -> pa.Table:
        tb = _TileBatch(batch)
        out_px, out_bands = [], np.empty(tb.n, np.int16)
        for i in range(tb.n):
            o = np.asarray(fn(tb.pixels(i)))
            if o.ndim == 2:
                o = o[None]
            out_bands[i] = o.shape[0]
            out_px.append(np.ascontiguousarray(
                o.astype(out_cell_type.np_dtype, copy=False)).tobytes())
        names = batch.column_names
        return (batch
                .set_column(names.index("pixels"), "pixels",
                            pa.array(out_px, pa.binary()))
                .set_column(names.index("cell_type"), "cell_type",
                            pa.array([out_cell_type.name] * tb.n, pa.string()))
                .set_column(names.index("band_count"), "band_count",
                            pa.array(out_bands, pa.int16())))

    return tiles_ds.map_batches(apply, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
