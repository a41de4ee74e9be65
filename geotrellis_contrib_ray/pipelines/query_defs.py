"""Shared definitions for the driver-checked queries.

Every constant here is used BOTH by the Ray pipelines and to *generate* the
DuckDB oracle SQL in __ray_entry__.py, so the two sides can never drift.
All derivations are pure integer arithmetic or identical double expressions,
making results bit-reproducible across numpy and DuckDB.

Geo derivation over the driver's flat ``documents`` table (doc_id:int64):
    lon = LON0 + ((doc_id*LON_A + LON_C) % LON_MOD) * 1e-5
    lat = LAT0 + ((doc_id*LAT_A + LAT_C) % LAT_MOD) * 1e-5
(the span-level corpus uses the same formula with span offsets; see
sources/documents.py).
"""

from __future__ import annotations

from ..core.grid import Extent, GridExtent, LayoutDefinition
from ..sources.documents import (
    LAT0,
    LAT_A,
    LAT_C,
    LAT_MOD,
    LON0,
    LON_A,
    LON_C,
    LON_MOD,
)

# Pennsylvania-ish bbox covering every derived point (FIXTURES.md §1)
PA_EXTENT = Extent(-80.33, 39.70, -75.03, 42.10)

# the query raster grid: 0.01-degree cells over the PA bbox (530 x 240)
QUERY_GRID = GridExtent(PA_EXTENT, 0.01, 0.01, 530, 240)

# the query tile layout: global WGS84 ZXY at zoom 12 (8192 x 4096 tiles,
# power-of-two => exactly representable tile width 0.0439453125 deg)
QUERY_ZOOM = 12
QUERY_LAYOUT = LayoutDefinition.global_latlon(QUERY_ZOOM)

# hierarchical cell resolutions for cell-assignment + pyramid queries
CELL_RES = 12
PARENT_RES = 8

# PIP zones: axis-aligned boxes in doc space (negated-lon city coords,
# bboxBuffer semantics from slick/src/test/.../Data.scala:59-66) + one convex
# polygon to exercise the half-plane kernel.  Closed ranges (SQL BETWEEN).
ZONE_BOXES: list[tuple[str, float, float, float, float]] = [
    # name, xmin, ymin, xmax, ymax   (buffer d=0.35 around the city point)
    ("altoona", -78.67, 39.95, -77.97, 40.65),
    ("erie", -80.53, 41.73, -79.83, 42.43),
    ("harrisburg", -77.20, 39.87, -76.50, 40.57),
    ("philadelphia", -75.60, 39.53, -74.90, 40.23),
    ("pittsburgh", -80.28, 40.00, -79.58, 40.70),
    ("williamsport", -77.27, 40.90, -76.57, 41.60),
]

# convex polygon zone (CW vertex order): a quadrilateral around State College
ZONE_CONVEX: tuple[str, list[tuple[float, float]]] = (
    "state_college_quad",
    [(-78.3, 40.6), (-77.3, 41.2), (-76.8, 40.7), (-77.9, 40.2)],
)

# kNN query points + k
KNN_QUERIES: list[tuple[int, float, float]] = [
    (0, -77.86, 40.79),
    (1, -79.99, 40.44),
    (2, -75.16, 39.95),
    (3, -76.88, 40.27),
]
KNN_K = 5

# probe-heavy kNN (the indexed tier's win regime — measured 7x over brute at
# Q=4096 on sf0.1): Q deterministic query points via integer arithmetic, so
# the DuckDB oracle regenerates them bit-identically with generate_series.
KNN_MANY_Q = 512


def knn_many_queries() -> list[tuple[int, float, float]]:
    return [
        (
            i,
            -80.3 + ((i * 997 + 17) % 5200) * 1e-3,
            39.72 + ((i * 613 + 29) % 2350) * 1e-3,
        )
        for i in range(KNN_MANY_Q)
    ]

# distance self-join: sample predicate + threshold.  A contiguous id range
# (not a modulus — the integer-lattice geocode makes modular samples too
# sparse) keeps the brute-force oracle bounded at any sf.
DIST_SAMPLE_LIMIT = 2000  # doc_id < 2000
DIST_THETA = 0.1

# tumbling window size for the events query (seconds)
WINDOW_SEC = 3600
# shared by q_sessionize / q_sliding_windows / q_train_split / q_stride_sample
# AND their generated SQL twins (the CLAUDE.md oracle rule: one constant,
# both engines)
SESSION_GAP_SEC = 1800
SLIDE_SIZE_SEC = 3600
SLIDE_HOP_SEC = 1800
SPLIT_TEST_BELOW = 10
SPLIT_VAL_BELOW = 20
STRIDE_N = 5
STRIDE_LIMIT = 100

# per-row window functions over events (window_funcs query): ordering is
# (epoch_us, event_id); the first-row LAG / last-row LEAD gap is this
# sentinel on BOTH sides (no SQL NULLs — the driver's value hash must see
# identical values); NTILE tile count shared by stage and twin
WINDOW_GAP_NONE = -1
WINDOW_NTILE_K = 4

# bounded ROWS frame for moving_stats (ROWS BETWEEN k PRECEDING AND
# CURRENT ROW) — shared by stage and twin
FRAME_PRECEDING_ROWS = 2

# ordered conversion funnel stages (funnel_stages query): stage i+1 must
# occur strictly later (epoch_us) than the user's first qualifying stage-i
# event; shared by stage and generated twin
FUNNEL_STAGES = ("view", "click", "purchase")

# cohort_retention: the event type that starts a user's cohort; day length
# in epoch micros shared by stage and twin (UTC-day floor division)
COHORT_SIGNUP_TYPE = "signup"
COHORT_DAY_US = 86_400_000_000

# user_actions_outer: sentinel for "no rows on this side" in the FULL
# OUTER join (no SQL NULLs — the driver's value hash must see identical
# typed values on both engines)
OUTER_NONE = -1

# quantile_chars_cont: per-lang interpolated quantiles over n_chars —
# the q list is shared by the stage and the generated per-q twin rows
CHARS_CONT_QS = (0.25, 0.5, 0.9)

# fixed-bin histogram over orders.o_totalprice (price_histogram query):
# bin = min(floor(price / WIDTH), NBINS-1), shared float literal via _dbl
HIST_BIN_WIDTH = 30000.0
HIST_NBINS = 20


# grouped vector aggregate (label_centroids): fixed-point quantization bits
# shared by stages/cluster.py::grouped_vector_sum and the generated twin
CENTROID_QUANT_BITS = 20


def corr_sql_expr(n: str = "n_rows", sx: str = "sum_x", sy: str = "sum_y",
                  sxx: str = "sum_xx", sxy: str = "sum_xy",
                  syy: str = "sum_yy") -> str:
    """Pearson r over exact integer moment sums — token-for-token the same
    IEEE parse tree as stages/stats.py::corr_from_moments (cast each integer
    to double FIRST, then (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) *
    sqrt(n*syy - sy*sy))), so the float column hash-matches."""
    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    return (f"(({d(n)} * {d(sxy)} - {d(sx)} * {d(sy)}) / "
            f"(sqrt({d(n)} * {d(sxx)} - {d(sx)} * {d(sx)}) * "
            f"sqrt({d(n)} * {d(syy)} - {d(sy)} * {d(sy)})))")


# interval join: closed [lo, hi] ranges over events.value.  Integer-valued
# doubles (no literal drift between numpy and DuckDB), step 3 / width 4 so
# adjacent intervals overlap by 1.0 and a value can hit two intervals.
VALUE_INTERVALS: tuple[tuple[int, float, float], ...] = tuple(
    (i, float(3 * i), float(3 * i + 4)) for i in range(34)
)

# box-box intersection join (`&&`): doc points buffered into rectangles,
# disjoint id ranges so left/right sides are distinct tables (the driver's
# documents table has 500 rows at gate scale).  Buffer radii share the exact
# double literals with SQL; the replication cell width is Ray-side only.
BOX_JOIN_LEFT_LIMIT = 250    # left  = doc_id <  250, buffer 0.15 deg
BOX_JOIN_RIGHT_LIMIT = 500   # right = 250 <= doc_id < 500, buffer 0.2
BOX_JOIN_LEFT_R = 0.15
BOX_JOIN_RIGHT_R = 0.2
BOX_JOIN_CELL = 0.5

# --- text-quality oracle constants -----------------------------------------
# Shared between stages/text.py::QualityScorer (Python re) and the DuckDB
# oracle (RE2 regexp_extract_all).  Patterns are deliberately restricted to
# the syntax subset both engines treat identically (verified by
# tests/test_queries_oracle.py::quality_counts): character classes, +, |.
WORD_REGEX = r"[A-Za-z]+"
BPE_REGEX = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
STOP_WORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by",
)

# exact n-gram Jaccard self-join (inverted-index plan): shared between
# dedup.jaccard_similarity_join and the DuckDB substr/unnest oracle.  The
# driver-gate query runs on a contiguous id sample (same precedent as
# DIST_SAMPLE_LIMIT): the synthetic corpus draws every doc from one small
# vocabulary, so token df — and the exact join's irreducible sum df^2 pair
# expansion — is pathologically dense; the sample keeps the oracle-checked
# run bounded while the operator itself stays fully general.
JACCARD_K = 5

# exact substring-duplication windows (dedup.substring_match_pairs and its
# SQL twin share these; SUBSTR_MAX_OFF must cover max text length — the Ray
# query guards max(length(text)) <= SUBSTR_MAX_OFF + SUBSTR_WIN - 1 loudly)
SUBSTR_WIN = 32
SUBSTR_STRIDE = 16
SUBSTR_MAX_OFF = 8192

# chunk_docs SQL twin enumerates chunk offsets 0..CHUNK_SQL_SERIES (DuckDB
# generate_series takes constants only); the Ray query guards
# max(length(text)) <= (CHUNK_SQL_SERIES + 1) * stride loudly
CHUNK_SQL_SERIES = 255
JACCARD_THRESHOLD = 0.5
JACCARD_SAMPLE_LIMIT = 250  # doc_id < 250

# iterative rank propagation (graph.iterative_rank and its unrolled SQL CTE
# twin): undirected customer<->supplier co-order graph, node namespacing
# cust -> 2c / supp -> 2s+1; ALL integer fixed-point (floor divisions), so
# both engines agree bit-for-bit with NO float summation-order concerns
RANK_ITERS = 3
RANK_SCALE = 1_000_000
RANK_DAMP_NUM = 17  # 0.85 damping as a ratio
RANK_DAMP_DEN = 20


def rank_sql(iters: int = RANK_ITERS) -> str:
    """Unrolled CTE chain replaying graph.iterative_rank exactly: integer
    floor-division contributions, BIGINT casts on the HUGEINT sums."""
    base = (RANK_DAMP_DEN - RANK_DAMP_NUM) * RANK_SCALE // RANK_DAMP_DEN
    ctes = [f"""e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
ed AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM ed GROUP BY src),
r0 AS (SELECT src AS node, CAST({RANK_SCALE} AS BIGINT) AS r FROM deg)"""]
    for t in range(1, iters + 1):
        ctes.append(f"""r{t} AS (
  SELECT ed.dst AS node,
         {base} + CAST(SUM(({RANK_DAMP_NUM} * r.r) // ({RANK_DAMP_DEN} * deg.d))
                       AS BIGINT) AS r
  FROM ed JOIN r{t - 1} r ON r.node = ed.src JOIN deg ON deg.src = ed.src
  GROUP BY ed.dst)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, r FROM r{iters}")


# pivot / crosstab (agg.pivot_counts): fixed category list + other-bucket —
# parameterized so the operator works on any corpus; NULL col_key counts
# nowhere (SQL CASE semantics)
PIVOT_LANGS = ["en", "de", "es", "fr", "zh"]

# distinct-key set ops (agg.key_set_ops): side A = source SETOP_SRC_A,
# side B = source SETOP_SRC_B with n_chars >= SETOP_MIN_CHARS (the
# threshold makes BOTH the EXCEPT and INTERSECT arms non-vacuous on the
# generated corpora)
SETOP_SRC_A = "src0"
SETOP_SRC_B = "src1"
SETOP_MIN_CHARS = 400

# corpus-wide top-k word bigrams (text.top_bigrams and its SQL twin):
# ties at the k-th count broken on the bigram string on both engines
TOP_BIGRAMS_K = 20

# edit-distance near-dup self-join (dedup.edit_distance_pairs, PassJoin):
# byte-domain Levenshtein threshold shared with the SQL twin — DuckDB's
# levenshtein() is BYTE-based (measured), matching the Ray side's raw-utf8
# segment/probe/DP pipeline exactly, unicode included
EDIT_MAX_DIST = 4

# paragraph_dedup (CCNet/Dolma-style cross-document chunk dedup): both
# engines segment docs into PARA_K-token chunks and pack the first-occurrence
# owner key as doc_id * 2^PARA_IDX_BITS + chunk_idx (Ray guards
# chunks-per-doc < 2^PARA_IDX_BITS loudly)
PARA_K = 10
PARA_IDX_BITS = 20

# mixture_sample (data-mixing reweighting): per-source token budget; both
# engines take docs in (sample-hash, id) order until the running total
# crosses it.  800 bites at every test SF (sources hold ~1.3k tokens at
# sf0.01, ~13.5k at sf0.1)
MIX_BUDGET_TOKENS = 800

# local map algebra (F11 oracle): quantized normalized band difference
# floor(SCALE * (b1 - b0) / max(b1 + b0, 1)) — floor (not round: numpy
# rounds half-even, DuckDB half-away), identical double expression both
# engines
NDVI_Q_SCALE = 1 << 20

# incremental dedup: docs below the split are the EXISTING corpus, at/above
# are the newly ingested delta
DELTA_SPLIT_ID = 250

# unbounded-domain exact quantiles over l_extendedprice (quantile_disc)
PRICE_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

# k-means over the embedding table: deterministic seeds = the first
# KMEANS_K vectors by vec_id, KMEANS_ITERS Lloyd's rounds; assignment
# tie-break (distance, cid) on both engines.
KMEANS_K = 4
KMEANS_ITERS = 2

# near-dup CLUSTERS (connected components): docs sharing a CLUSTER_KEY_LEN
# char prefix OR suffix are edges; components labelled by min doc_id.  Both
# the Ray keying stage and the recursive-CTE oracle derive from this one
# constant.
CLUSTER_KEY_LEN = 10

# ANN oracle: queries are the embedding rows with these vec_ids; top-k by
# (cosine desc, vec_id asc) emitted as integer ranks only (float sims are
# not bit-reproducible across summation orders).
ANN_QUERY_IDS = (0, 1, 2, 3)
ANN_K = 10

# exact-integer ANN variants (quantized cosine, stages/ann.py): shared by
# q_ann_cosine/q_ann_lsh/q_ann_ivf and their generated SQL twins
ANN_LSH_PLANES = 6
ANN_IVF_SEEDS = 16   # seed-Voronoi coarse quantizer = first N vectors
ANN_IVF_NPROBE = 4

# --- raster-family oracle constants ----------------------------------------
# synthetic raster: value(col, row) = (row * RASTER_COLS + col) % 2^15 as
# int16 with nodata -32768 (never produced by the formula), anchored grid —
# the SAME formula SyntheticRasterSource evaluates and the DuckDB CTE
# reproduces with generate_series, so per-tile pixel checksums hash-match.
RASTER_COLS = 1500
RASTER_ROWS = 1350
RASTER_CELL = 10.0
RASTER_X0 = 630000.0
RASTER_Y0 = 215000.0
RASTER_TILE = 256

# mosaic fixture: source A covers cols [0, MOSAIC_SPLIT_A), source B covers
# [MOSAIC_B_OFF, RASTER_COLS); both full height, same cell grid.  Merge is
# first-non-nodata-wins in (A, B) order -> cell value = A's where col <
# MOSAIC_SPLIT_A else B's.
MOSAIC_SPLIT_A = 900
MOSAIC_B_OFF = 600


def raster_grid():
    """The shared synthetic raster grid (engine side)."""
    from ..core.grid import Extent, GridExtent

    return GridExtent(
        Extent(RASTER_X0, RASTER_Y0, RASTER_X0 + RASTER_COLS * RASTER_CELL,
               RASTER_Y0 + RASTER_ROWS * RASTER_CELL),
        RASTER_CELL, RASTER_CELL, RASTER_COLS, RASTER_ROWS,
    )


def raster_cells_cte() -> str:
    """DuckDB CTE enumerating every base cell with its synthetic value —
    textually the SyntheticRasterSource formula."""
    return f"""
  cells AS (
    SELECT r.r AS row, c.c AS col, (r.r * {RASTER_COLS} + c.c) % 32768 AS v
    FROM generate_series(0, {RASTER_ROWS - 1}) AS r(r)
    CROSS JOIN generate_series(0, {RASTER_COLS - 1}) AS c(c)
  )"""


def mosaic_cells_cte() -> str:
    """DuckDB CTE for the two-source mosaic: each source evaluates the
    synthetic formula in its OWN local grid (cols = its width); A wins in the
    overlap (first-non-nodata, source order)."""
    a_cols = MOSAIC_SPLIT_A
    b_cols = RASTER_COLS - MOSAIC_B_OFF
    return f"""
  cells AS (
    SELECT r.r AS row, c.c AS col,
           CASE WHEN c.c < {MOSAIC_SPLIT_A}
                THEN (r.r * {a_cols} + c.c) % 32768
                ELSE (r.r * {b_cols} + c.c - {MOSAIC_B_OFF}) % 32768 END AS v
    FROM generate_series(0, {RASTER_ROWS - 1}) AS r(r)
    CROSS JOIN generate_series(0, {RASTER_COLS - 1}) AS c(c)
  )"""


def geo_cte() -> str:
    """The shared DuckDB CTE deriving (doc_id, lon, lat, n_chars) from
    documents — textually identical arithmetic to geocode_ids(offset=0)."""
    return f"""
  pts AS (
    SELECT doc_id,
           {LON0} + ((doc_id * {LON_A} + {LON_C}) % {LON_MOD}) * 1e-5 AS lon,
           {LAT0} + ((doc_id * {LAT_A} + {LAT_C}) % {LAT_MOD}) * 1e-5 AS lat,
           n_chars
    FROM documents
  )"""


def zone_boxes_values_sql() -> str:
    rows = ",\n      ".join(
        f"('{n}', {x0}, {y0}, {x1}, {y1})" for n, x0, y0, x1, y1 in ZONE_BOXES
    )
    return f"(VALUES\n      {rows}) AS zones(zone_name, xmin, ymin, xmax, ymax)"


def convex_sql_predicate(px: str, py: str) -> str:
    """AND of half-plane sign tests for the CW convex zone — the SQL twin of
    geom.convex_contains_points (identical expression, identical rounding)."""
    name, verts = ZONE_CONVEX
    terms = []
    m = len(verts)
    for i in range(m):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % m]
        terms.append(
            f"(({x2} - {x1}) * ({py} - {y1}) - ({y2} - {y1}) * ({px} - {x1})) <= 0"
        )
    return " AND ".join(terms)


def knn_values_sql() -> str:
    rows = ",\n      ".join(f"({q}, {x}, {y})" for q, x, y in KNN_QUERIES)
    return f"(VALUES\n      {rows}) AS q(query_id, qx, qy)"


# --- conic CRS oracle profiles (q_lambert_cells / q_albers_cells) ----------
# CONUS-standard parallels (the classic LCC 102004 / Albers 5070 parameter
# sets, on the 3857 sphere).  Derived constants are computed once in python
# (core/crs.lcc_constants / aea_constants) and embedded VERBATIM into the SQL
# twins, so both engines run the same per-point elementary math.
def lambert_query_crs():
    from ..core.crs import LambertConformalCRS

    return LambertConformalCRS("lcc_conus", 33.0, 45.0, 39.0, -96.0)


def albers_query_crs():
    from ..core.crs import AlbersEqualAreaCRS

    return AlbersEqualAreaCRS("albers_conus", 29.5, 45.5, 23.0, -96.0)


def stereo_query_crs():
    """North polar stereographic, true-scale 70N, central meridian -45
    (the EPSG:3413 parameter set on the 3857 sphere)."""
    from ..core.crs import PolarStereographicCRS

    return PolarStereographicCRS("ps_north", -45.0, 70.0, north=True)


def sinu_query_crs():
    """Sinusoidal at lon0=0 — the MODIS land-grid family (sphere)."""
    from ..core.crs import SinusoidalCRS

    return SinusoidalCRS("sinusoidal")


def stereo_sql_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """(x, y) exprs for the north polar stereographic query profile — the
    2*R*k0 factor is precomputed in python and embedded, so the per-point
    math is tan/sin/cos/radians on both engines."""
    from ..core.crs import ps_k0

    crs = stereo_query_crs()
    f2rk = 2.0 * crs.radius * ps_k0(crs)
    rho = f"({_dbl(f2rk)} * tan(pi()/4 - radians({lat})/2))"
    lam = f"radians({lon} - ({_dbl(crs.lon0)}))"
    return f"{rho} * sin({lam})", f"-({rho}) * cos({lam})"


def sinu_sql_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    crs = sinu_query_crs()
    return (f"({_dbl(crs.radius)} * radians({lon} - ({_dbl(crs.lon0)})) * cos(radians({lat})))",
            f"({_dbl(crs.radius)} * radians({lat}))")


def conic_raster_target(crs):
    """Warp-oracle target grid for a projected ``crs``: densified-edge
    forward envelope of the PA extent, ~700 m cells — fine enough that
    overview routing stays on the base source; both engines consume the
    identical derived floats."""
    from ..core.crs import EPSG_4326, Transformer, reproject_extent
    from ..core.grid import Extent, GridExtent

    fwd = Transformer(EPSG_4326, crs)
    x0, y0, x1, y1 = reproject_extent(fwd, PA_EXTENT.xmin, PA_EXTENT.ymin,
                                      PA_EXTENT.xmax, PA_EXTENT.ymax)
    cols = int((x1 - x0) // 700.0)
    rows = int((y1 - y0) // 700.0)
    return GridExtent.from_extent(Extent(x0, y0, x1, y1), cols, rows)


def lambert_raster_target():
    """The q_raster_lambert target grid (see conic_raster_target)."""
    return conic_raster_target(lambert_query_crs())


def conic_raster_tile_params(crs, tile: int = 256) -> list[dict]:
    """Per-tile warp-sampling constants for the raster warp SQL twins,
    computed with the SAME library calls ReprojectRasterSource.read_bounds
    makes (reproject_extent densified window back-transform, grid_bounds_for
    unclamped, intersection, extent_for, GridExtent.from_extent), so every
    embedded float is bit-identical to the Ray side by construction."""
    from ..core.crs import EPSG_4326, Transformer, reproject_extent
    from ..core.grid import Extent, GridBounds, GridExtent

    tg = conic_raster_target(crs)
    back = Transformer(crs, EPSG_4326)
    src_grid = QUERY_GRID
    full = GridBounds(0, 0, src_grid.cols - 1, src_grid.rows - 1)
    ntc = -(-tg.cols // tile)
    ntr = -(-tg.rows // tile)
    out = []
    for tr in range(ntr):
        for tc in range(ntc):
            inter = GridBounds(tc * tile, tr * tile,
                               min(tc * tile + tile - 1, tg.cols - 1),
                               min(tr * tile + tile - 1, tg.rows - 1))
            te = tg.extent_for(inter)
            sx0, sy0, sx1, sy1 = reproject_extent(back, te.xmin, te.ymin,
                                                  te.xmax, te.ymax)
            gb = src_grid.grid_bounds_for(Extent(sx0, sy0, sx1, sy1), clamp=False)
            sint = gb.intersection(full)
            if sint is None:
                # tile's back-transformed window misses the source entirely
                # (curved projection envelopes have empty corners): the Ray
                # read path returns None -> no tile row, so the twin skips it
                continue
            se = src_grid.extent_for(sint)
            sgrid = GridExtent.from_extent(se, sint.width, sint.height)
            out.append({
                "tc": tc, "tr": tr,
                "gc0": inter.col_min, "gr0": inter.row_min,
                "gc1": inter.col_max, "gr1": inter.row_max,
                "sxmin": sgrid.extent.xmin, "symax": sgrid.extent.ymax,
                "scw": sgrid.cellwidth, "sch": sgrid.cellheight,
                "scols": sint.width, "srows": sint.height,
                "wc0": sint.col_min, "wr0": sint.row_min,
            })
    return out


def albers_inverse_sql_exprs(x: str = "tx", y: str = "ty") -> tuple[str, str]:
    """(lon_expr, lat_expr): the core/crs._aea_to_lonlat inverse closed form
    (asin-based — structurally different from the LCC power/atan inverse,
    so the warp SQL twin exercises a second inverse family)."""
    from ..core.crs import aea_constants

    crs = albers_query_crs()
    n, c, rho0 = aea_constants(crs)
    sgn = "1.0" if n >= 0 else "-1.0"
    dy = f"({_dbl(rho0)} - ({y}))"
    rho = f"sqrt(({x}) * ({x}) + {dy} * {dy})"
    theta = f"atan2({sgn} * ({x}), {sgn} * {dy})"
    # phi = asin((C - (rho*n/R)^2) / (2n)); numpy computes (rho*n/radius)**2
    rnr = f"({rho} * {_dbl(n)} / {_dbl(crs.radius)})"
    phi = f"asin(({_dbl(c)} - {rnr} * {rnr}) / (2.0 * {_dbl(n)}))"
    lon = f"({_dbl(crs.lon0)} + degrees({theta} / {_dbl(n)}))"
    return lon, f"degrees({phi})"


def stereo_inverse_sql_exprs(x: str = "tx", y: str = "ty") -> tuple[str, str]:
    """(lon_expr, lat_expr): core/crs._ps_to_lonlat (north pole) — the
    atan-of-rho inverse family."""
    from ..core.crs import ps_k0

    crs = stereo_query_crs()
    f2rk = 2.0 * crs.radius * ps_k0(crs)
    rho = f"sqrt(({x}) * ({x}) + ({y}) * ({y}))"
    c = f"(2.0 * atan({rho} / {_dbl(f2rk)}))"
    lam = f"atan2(({x}), -({y}))"
    return (f"({_dbl(crs.lon0)} + degrees({lam}))",
            f"degrees(pi() / 2.0 - {c})")


def sinu_inverse_sql_exprs(x: str = "tx", y: str = "ty") -> tuple[str, str]:
    """(lon_expr, lat_expr): core/crs._sinu_to_lonlat — the linear/secant
    inverse family."""
    crs = sinu_query_crs()
    phi = f"(({y}) / {_dbl(crs.radius)})"
    lam = f"(({x}) / ({_dbl(crs.radius)} * cos({phi})))"
    return f"({_dbl(crs.lon0)} + degrees({lam}))", f"degrees({phi})"


def lambert_inverse_sql_exprs(x: str = "tx", y: str = "ty") -> tuple[str, str]:
    """(lon_expr, lat_expr): the core/crs._lcc_to_lonlat inverse closed form
    over target-plane coordinates — same derived constants, same elementary
    calls (sqrt/atan2/atan/power/degrees) as the numpy kernel."""
    from ..core.crs import lcc_constants

    crs = lambert_query_crs()
    n, f, rho0 = lcc_constants(crs)
    sgn = "1.0" if n >= 0 else "-1.0"
    dy = f"({_dbl(rho0)} - ({y}))"
    rho = f"({sgn} * sqrt(({x}) * ({x}) + {dy} * {dy}))"
    theta = f"atan2({sgn} * ({x}), {sgn} * {dy})"
    phi = (f"(2.0 * atan(power({_dbl(crs.radius)} * {_dbl(f)} / {rho}, "
           f"{_dbl(1.0 / n)})) - pi() / 2.0)")
    lon = f"({_dbl(crs.lon0)} + degrees({theta} / {_dbl(n)}))"
    return lon, f"degrees({phi})"


def _dbl(v: float) -> str:
    """A float constant as a DOUBLE literal: DuckDB parses bare decimal
    literals as DECIMAL, whose fixed-point multiplication overflows on
    projection-scale magnitudes."""
    return f"CAST({float(v)!r} AS DOUBLE)"


def lambert_sql_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """(x_expr, y_expr) for the LCC query profile — same constants, same
    elementary ops (tan/power/sin/cos) as core/crs._lonlat_to_lcc."""
    from ..core.crs import lcc_constants

    crs = lambert_query_crs()
    n, f, rho0 = lcc_constants(crs)
    rho = (f"({_dbl(crs.radius)} * {_dbl(f)} / "
           f"power(tan(pi()/4 + radians({lat})/2), {_dbl(n)}))")
    theta = f"({_dbl(n)} * radians({lon} - ({_dbl(crs.lon0)})))"
    return f"{rho} * sin({theta})", f"{_dbl(rho0)} - {rho} * cos({theta})"


def albers_sql_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    from ..core.crs import aea_constants

    crs = albers_query_crs()
    n, c, rho0 = aea_constants(crs)
    rho = (f"({_dbl(crs.radius)} * sqrt({_dbl(c)} - 2.0 * {_dbl(n)} * "
           f"sin(radians({lat}))) / {_dbl(n)})")
    theta = f"({_dbl(n)} * radians({lon} - ({_dbl(crs.lon0)})))"
    return f"{rho} * sin({theta})", f"{_dbl(rho0)} - {rho} * cos({theta})"


_U64 = str(1 << 64)
_I64_HALF = str(1 << 63)


def _sql_u(expr: str) -> str:
    """signed-BIGINT bit-view -> unsigned HUGEINT (uint64 semantics)."""
    return (f"(CASE WHEN {expr} < 0 THEN CAST({expr} AS HUGEINT) + {_U64} "
            f"ELSE CAST({expr} AS HUGEINT) END)")


def _sql_i64(expr: str) -> str:
    """unsigned HUGEINT in [0, 2^64) -> signed BIGINT bit-view (the int64
    view every hash column uses — raw uint64 > 2^63 breaks Ray shuffles)."""
    return (f"CAST(CASE WHEN {expr} >= {_I64_HALF} THEN {expr} - {_U64} "
            f"ELSE {expr} END AS BIGINT)")


def shingle_hash_sql(shingle_k: int, text: str = "text", pos: str = "i") -> str:
    """The dedup._shingle_hashes rolling polynomial replayed in SQL: over
    ASCII text, byte j of the window is ascii(substr(text, i+j, 1)); the
    uint64 wraparound equals one final mod 2^64 because the exact polynomial
    value (<= 255 * B^(k-1) * k ~ 2^88 for k=5, B=1000003) fits HUGEINT and
    mod is a ring homomorphism.  Yields an unsigned HUGEINT in [0, 2^64)."""
    poly = "CAST(0 AS HUGEINT)"
    for j in range(shingle_k):
        poly = (f"({poly}) * 1000003 + "
                f"ascii(substr({text}, CAST({pos} + {j} AS INT), 1))")
    return f"(({poly}) % {_U64})"


def minhash_bands_cte(num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      table: str = "documents") -> str:
    """Generated CTE chain replaying stages/dedup.MinHashLSH exactly:
    rolling shingle hashes (mod-2^64 polynomial), the (a*x + b) universal
    family with uint64 wraparound BEFORE the Mersenne mod (numpy wraps at
    each step), per-band signature pivot, and the FNV-1a band fold unrolled
    one CTE per row-in-band (the hilbert_sql_cte precedent).  Permutation
    constants come from the SAME seed-fixed constructor the Ray side uses.
    Yields ``mh_bands(doc_id, band_id, band_hash)`` with band_hash as the
    int64 bit-view Ray emits."""
    from ..stages.dedup import MinHashLSH

    sk = MinHashLSH(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    r = sk.rows_per_band
    mers = str((1 << 61) - 1)
    perm_rows = ",\n      ".join(
        f"({p}, {int(sk.a[p])}, {int(sk.b[p])})" for p in range(num_perm))
    sig_cols = ",\n           ".join(
        f"MAX(CASE WHEN p % {r} = {j} THEN sig END) AS s{j}" for j in range(r))
    fnv_init_signed = (0xCBF29CE484222325) - (1 << 64)
    prime = 0x100000001B3
    parts = [f"""mh_pos AS (
    SELECT doc_id, text, unnest(range(1, length(text) - {shingle_k} + 2)) AS i
    FROM {table} WHERE length(text) >= {shingle_k}
  ),
  mh_sh AS (
    SELECT DISTINCT doc_id, {shingle_hash_sql(shingle_k)} AS x
    FROM mh_pos
  ),
  mh_perms(p, pa, pb) AS (VALUES
      {perm_rows}),
  mh_sigs AS (
    SELECT doc_id, p,
           MIN((((((CAST(pa AS HUGEINT) * x) % {_U64}) + pb) % {_U64})) % {mers}) AS sig
    FROM mh_sh CROSS JOIN mh_perms
    GROUP BY doc_id, p
  ),
  mh_f AS (
    SELECT doc_id, p // {r} AS band_id,
           {sig_cols},
           CAST({fnv_init_signed} AS BIGINT) AS acc
    FROM mh_sigs GROUP BY doc_id, p // {r}
  )"""]
    prev = "mh_f"
    for j in range(r):
        cur = f"mh_f{j}" if j < r - 1 else "mh_bands_pre"
        x = f"xor(acc, CAST(s{j} AS BIGINT))"
        m = f"(({_sql_u(x)} * {prime}) % {_U64})"
        parts.append(f"""{cur} AS (
    SELECT doc_id, band_id, {', '.join(f's{i}' for i in range(j + 1, r))}{',' if j < r - 1 else ''}
           {_sql_i64(m)} AS acc
    FROM {prev}
  )""")
        prev = cur
    parts.append("""mh_bands AS (
    SELECT doc_id, band_id, acc AS band_hash FROM mh_bands_pre
  )""")
    return ",\n  ".join(parts)


def simhash_cte(shingle_k: int = 4, bands: int = 9,
                table: str = "documents") -> str:
    """Generated CTE chain replaying stages/dedup.SimHash + its banding:
    per-doc 64-bit signature from majority votes over ALL shingle hashes
    (duplicates count — votes are per occurrence, so no DISTINCT), band
    chunks of 64//bands bits.  Yields ``sh_sig(doc_id, h)`` (int64 bit-view)
    and ``sh_bands(doc_id, band_id, chunk)``."""
    width = 64 // bands
    pow2 = [str(1 << j) for j in range(64)]
    bit_sum = " + ".join(
        f"(CASE WHEN 2 * SUM((x // {pow2[j]}) % 2) > count(*) THEN CAST({pow2[j]} AS HUGEINT) ELSE 0 END)"
        for j in range(64))
    # per-band divisor as an exact integer literal — POWER() would route the
    # division through DOUBLE and lose bits above 2^53
    band_rows = ", ".join(f"({b}, CAST({1 << (b * width)} AS HUGEINT))"
                          for b in range(bands))
    return f"""ss_pos AS (
    SELECT doc_id, text, unnest(range(1, length(text) - {shingle_k} + 2)) AS i
    FROM {table} WHERE length(text) >= {shingle_k}
  ),
  ss_sh AS (
    SELECT doc_id, {shingle_hash_sql(shingle_k)} AS x FROM ss_pos
  ),
  ss_u AS (
    SELECT doc_id, {bit_sum} AS hu
    FROM ss_sh GROUP BY doc_id
  ),
  sh_sig AS (
    SELECT doc_id, {_sql_i64('hu')} AS h, hu FROM ss_u
  ),
  sh_bandids(band_id, dvsr) AS (VALUES {band_rows}),
  sh_bands AS (
    SELECT doc_id, band_id,
           CAST((hu // dvsr) % {1 << width} AS BIGINT) AS chunk
    FROM sh_sig CROSS JOIN sh_bandids
  )"""


def quantized_embed_cte(table: str = "embeddings") -> str:
    """``el_q(vec_id, i, q)``: quantized integer embedding components
    (floor(e * 2^20), 1-based component index) — the shared base of every
    exact-integer ANN/neardup twin."""
    from ..stages.dedup import EMBED_Q_SCALE

    return f"""el_q AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {float(EMBED_Q_SCALE)!r}) AS BIGINT) AS q
    FROM {table}
  )"""


def quantized_score_sql(dot: str, dq: str, dv: str) -> str:
    """The stages/ann.SCORE_SCALE quantized-cosine score as SQL: sign(dot) *
    floor(SCALE * dot^2 / (dq * dv)) in HUGEINT (operands are nonnegative,
    so DuckDB's // equals python's floor division)."""
    from ..stages.ann import SCORE_SCALE

    mag = (f"CAST((CAST({dot} AS HUGEINT) * ({dot}) * {SCORE_SCALE}) // "
           f"(CAST({dq} AS HUGEINT) * ({dv})) AS BIGINT)")
    return (f"CASE WHEN CAST({dq} AS HUGEINT) * ({dv}) = 0 THEN 0 "
            f"WHEN ({dot}) >= 0 THEN {mag} ELSE -{mag} END")


def embedding_lsh_cte(dim: int = 64, n_planes: int = 6, n_bands: int = 6,
                      seed: int = 42, table: str = "embeddings") -> str:
    """Generated CTE chain replaying stages/dedup.QuantizedMultiBandLSH:
    quantized embeddings (floor(e * 2^20) — one exact float64 multiply +
    floor on both engines), the seed-fixed integer plane lattice embedded
    as a VALUES table, bucket bits from exact integer dot signs.  Yields
    ``el_q(vec_id, i, q)`` (1-based component index) and
    ``el_buckets(vec_id, band, bucket)``."""
    from ..stages.dedup import EMBED_Q_SCALE, integer_planes

    planes = integer_planes(dim, n_planes, n_bands, seed)
    rows = []
    for b, mat in enumerate(planes):
        for i in range(dim):
            for j in range(n_planes):
                rows.append(f"({b},{j},{i + 1},{int(mat[i, j])})")
    plane_rows = ",".join(rows)
    return f"""el_planes(band, plane, i, pv) AS (VALUES {plane_rows}),
  el_q AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {float(EMBED_Q_SCALE)!r}) AS BIGINT) AS q
    FROM {table}
  ),
  el_dots AS (
    SELECT p.band, p.plane, e.vec_id, SUM(e.q * p.pv) AS dp
    FROM el_q e JOIN el_planes p ON p.i = e.i
    GROUP BY p.band, p.plane, e.vec_id
  ),
  el_buckets AS (
    SELECT vec_id, band,
           SUM(CASE WHEN dp > 0 THEN (1 << plane) ELSE 0 END) AS bucket
    FROM el_dots GROUP BY vec_id, band
  )"""


def geohash_sql_cte(precision: int = 8) -> str:
    """Generated CTE replaying stages/spatial.add_geohash: lattice
    quantization (identical float expressions), the lon-first bit
    interleave unrolled as a 5*precision-term sum, base32 chars via
    substr over the alphabet.  Expects a preceding ``pts`` CTE (geo_cte);
    yields ``gh(doc_id, geohash, gh_code)``."""
    from ..stages.spatial import GEOHASH_ALPHABET

    nbits = 5 * precision
    nlon = -(-nbits // 2)
    nlat = nbits // 2
    lon_off, lat_off = (1, 0) if nlon == nlat else (0, 1)
    lq = (f"LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {float(1 << nlon)!r}) "
          f"AS BIGINT), 0), {(1 << nlon) - 1})")
    aq = (f"LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * {float(1 << nlat)!r}) "
          f"AS BIGINT), 0), {(1 << nlat) - 1})")
    terms = [f"((lon_q // {1 << i}) % 2) * {1 << (2 * i + lon_off)}"
             for i in range(nlon)]
    terms += [f"((lat_q // {1 << i}) % 2) * {1 << (2 * i + lat_off)}"
              for i in range(nlat)]
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', CAST((gh_code // {1 << (5 * (precision - 1 - k))}) % 32 AS INT) + 1, 1)"
        for k in range(precision))
    return f"""gh_q AS (
    SELECT doc_id, {lq} AS lon_q, {aq} AS lat_q FROM pts
  ),
  gh_c AS (
    SELECT doc_id, {' + '.join(terms)} AS gh_code FROM gh_q
  ),
  gh AS (
    SELECT doc_id, {chars} AS geohash, gh_code FROM gh_c
  )"""


def hilbert_sql_cte(order: int = 16) -> str:
    """Generated DuckDB CTE chain computing the Hilbert index of the
    quantized (lon, lat) lattice — the same fixed ``order``-iteration bit
    loop as state/rtree.py::hilbert_d, unrolled into one CTE per iteration
    so Ray and the oracle share identical integer arithmetic.  Expects a
    preceding ``pts`` CTE (geo_cte); yields ``hfinal(doc_id, d)``."""
    n = 1 << order
    parts = [
        f"""h_base AS (
    SELECT doc_id,
           LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {float(n)}) AS BIGINT), 0), {n - 1}) AS x,
           LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * {float(n)}) AS BIGINT), 0), {n - 1}) AS y,
           CAST(0 AS BIGINT) AS d
    FROM pts
  )"""
    ]
    prev = "h_base"
    for k, i in enumerate(range(order - 1, -1, -1)):
        s = 1 << i
        cur = f"h{k}" if i > 0 else "hfinal"
        parts.append(
            f"""{cur} AS (
    SELECT doc_id,
           CASE WHEN (y & {s}) = 0 THEN CASE WHEN (x & {s}) > 0 THEN {n - 1} - y ELSE y END ELSE x END AS x,
           CASE WHEN (y & {s}) = 0 THEN CASE WHEN (x & {s}) > 0 THEN {n - 1} - x ELSE x END ELSE y END AS y,
           d + {s * s} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END), CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
    FROM {prev}
  )"""
        )
        prev = cur
    return ",\n  ".join(parts)


# regex_tokens: lowercase consonant runs (>=2) — a subword-piece inventory
# whose class excludes '\n' (the batch-join separator) and is
# backtracking-free, so python re and DuckDB RE2 scan identically
REGEX_TOKEN_PATTERN = r"[b-df-hj-np-tv-z]{2,}"

# zscore_chars: per-lang population z-score of n_chars, quantized
# floor(z * 2^20) from exact integer moments (CLAUDE.md float-twin rule)
ZSCORE_QUANT_BITS = 20


# dedup_keep_best: prefer curated sources over the crawl — rank = position
# in this tuple, everything else rides at DEDUP_DEFAULT_PRIORITY.  Includes
# both generator sources (srcN) and the random-parity corpora's names.
DEDUP_PRIORITY_SOURCES = ("src3", "src7", "wiki", "book")
DEDUP_DEFAULT_PRIORITY = 4
