"""The flagship pipeline (north star): interleaved corpus -> geocoded media
spans -> cell/tile assignment -> PIP join -> zonal rollup + tile pyramid.

read_parquet -> map_batches(lift to interleaved spans)         [narrow]
             -> map_batches(explode media spans + geocode)     [narrow]
             -> map_batches(cell + tile key assignment)        [narrow]
             -> map_batches(PIP refine vs broadcast zones)     [narrow]
             -> partial agg + groupby(tile)                    [the one shuffle]

The span-sequence invariant is checked by span_signature before/after the
lift in tests; the pipeline itself never reorders or rebuilds span lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources.documents import docs_to_spans, geocode_ids
from ..stages import spatial
from .query_defs import CELL_RES, PARENT_RES, QUERY_LAYOUT, ZONE_BOXES, ZONE_CONVEX


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """Interleaved docs -> one row per media span: (doc_id, num_id, offset,
    lon, lat).  Zero-copy on the list offsets; no python per-row work."""
    spans = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "num_id": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int32()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
            }
        )
    offsets = spans.offsets.to_numpy()
    sizes = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(n, dtype=np.int64), sizes)
    values = spans.values
    kind = values.field("kind").to_numpy(zero_copy_only=False)
    is_media = kind == "media"
    parent_m = parent[is_media]
    span_off = values.field("offset").to_numpy(zero_copy_only=False)[is_media]
    doc_ids = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
    import pyarrow.compute as pc

    num_ids_all = pc.cast(pc.replace_substring(doc_ids, "doc-", ""), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    num_id = num_ids_all[parent_m]
    lon, lat = geocode_ids(num_id, span_off.astype(np.int64))
    return pa.table(
        {
            "doc_id": doc_ids.take(pa.array(parent_m)),
            "num_id": num_id,
            "offset": span_off,
            "lon": lon,
            "lat": lat,
        }
    )


def synthetic_corpus(n_docs: int, override_num_blocks: int | None = None) -> "rd.Dataset":
    """Deterministic interleaved corpus of arbitrary scale, generated in the
    tasks (no IO): rd.range -> vectorized flat docs -> interleaved spans.
    This is the bench stand-in for the 10^12-doc Lance table."""
    from ..sources.documents import synth_flat_docs

    ds = rd.range(n_docs, override_num_blocks=override_num_blocks)

    def make(batch: pa.Table) -> pa.Table:
        return docs_to_spans(synth_flat_docs(batch["id"].to_numpy(zero_copy_only=False)))

    return ds.map_batches(make, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)


def flagship_over(docs_ds: "rd.Dataset", stats_sink: dict | None = None) -> "rd.Dataset":
    """Flagship stages over an already-interleaved documents Dataset.
    ``stats_sink`` (optional dict) receives the materialized upstream plan's
    Dataset.stats() text under "stats" — the per-operator breakdown the
    bench reports."""
    pts = docs_ds.map_batches(explode_media_spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
    pts = pts.map_batches(
        lambda b: spatial.add_cell(spatial.add_tile_key(b, QUERY_LAYOUT), CELL_RES, PARENT_RES),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    joined = spatial.pip_join(
        pts,
        ZONE_BOXES,
        convex_zones=[ZONE_CONVEX],
        keep_cols=("doc_id", "num_id", "cell", "parent_cell"),
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["zone_name", "parent_cell"], use_threads=False).aggregate(
            [("doc_id", "count")]
        )
        return g.rename_columns(["zone_name", "parent_cell", "pcnt"])

    import ray.data as rd

    from ..stages.agg import driver_group_rollup

    # final reduce: the group count is BOUNDED (zones x parent cells — 27 at
    # the bench layout), so the driver-combine tier beats any all-to-all by
    # its whole fixed cost (measured @8cpu/2M docs: 1.7 s vs 3.8 s for the
    # bounded-salt shuffle plan; stages/agg.py tier rules)
    return rd.from_arrow(driver_group_rollup(
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,),
        ["zone_name", "parent_cell"], [("pcnt", "sum", "n_spans")],
        schema=pa.schema([("zone_name", pa.string()), ("parent_cell", pa.int64()),
                          ("pcnt", pa.int64())]),
        stats_sink=stats_sink,
    ))


def media_points(sf_dir: str) -> "rd.Dataset":
    """Read documents, lift to interleaved spans, explode + geocode media
    spans, assign cells and layout tile keys."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(docs_to_spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
    ds = ds.map_batches(explode_media_spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
    ds = ds.map_batches(
        lambda b: spatial.add_cell(
            spatial.add_tile_key(b, QUERY_LAYOUT), CELL_RES, PARENT_RES
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return ds


def flagship(sf_dir: str) -> "rd.Dataset":
    """Full flagship over the driver's documents table: lift to interleaved
    spans -> media points -> PIP join vs broadcast zones -> per
    (zone, parent_cell) rollup.  Small, stable output schema."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(docs_to_spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
    return flagship_over(ds)


def flagship_synthetic(n_docs: int, stats_sink: dict | None = None) -> "rd.Dataset":
    """Flagship over the generated corpus — the bench headline at scale.

    Kept as the composed multi-stage pipeline: measured ~2x faster than a
    hand-fused single-stage variant here, because the streaming executor
    overlaps the short narrow stages across blocks."""
    return flagship_over(synthetic_corpus(n_docs), stats_sink=stats_sink)
