"""Property-based tests (hypothesis) over the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geotrellis_contrib_ray.core import cells, geom
from geotrellis_contrib_ray.core.celltype import CellType
from geotrellis_contrib_ray.core.grid import Extent, GridExtent

lat_s = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lng_s = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
res_s = st.integers(min_value=1, max_value=20)


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s, res_s)
def test_cell_pack_unpack_and_containment(lat, lng, res):
    c = cells.latlng_to_cell([lat], [lng], res)
    r2, x, y = cells.unpack_cell(c)
    assert r2[0] == res
    assert cells.pack_cell(r2, x, y)[0] == c[0]
    lat0, lng0, lat1, lng1 = cells.cell_bounds(c)
    # 1-ulp slack: points within one double rounding of a cell boundary can
    # land in the neighbor cell (identically in numpy and SQL)
    assert lat0[0] - 1e-9 <= lat <= lat1[0] + 1e-9
    assert lng0[0] - 1e-9 <= lng <= lng1[0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s, res_s, st.integers(min_value=0, max_value=19))
def test_cell_parent_transitive(lat, lng, res, pres):
    if pres > res:
        res, pres = pres, res
    child = cells.latlng_to_cell([lat], [lng], res)
    assert cells.cell_to_parent(child, pres)[0] == cells.latlng_to_cell([lat], [lng], pres)[0]


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-1e6, 1e6, allow_nan=False),
    st.floats(-1e6, 1e6, allow_nan=False),
    st.floats(1e-3, 1e4, allow_nan=False),
    st.integers(2, 500),
    st.integers(2, 500),
)
def test_grid_roundtrip_interior_points(x0, y0, cell, cols, rows):
    g = GridExtent(Extent(x0, y0, x0 + cell * cols, y0 + cell * rows), cell, cell, cols, rows)
    # cell centers round-trip exactly
    c = np.array([0, cols // 2, cols - 1])
    r = np.array([0, rows // 2, rows - 1])
    px, py = g.grid_to_map(c, r)
    c2, r2 = g.map_to_grid(px, py)
    assert c2.tolist() == c.tolist()
    assert r2.tolist() == r.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False, allow_infinity=False),
                          st.floats(-100, 100, allow_nan=False, allow_infinity=False)),
                min_size=1, max_size=20))
def test_wkb_linestring_roundtrip(coords):
    arr = np.array(coords, dtype=np.float64)
    b = geom.geometry_to_wkb("LineString", arr)
    kind, out, _ = geom.wkb_to_geometry(b)
    assert kind == "LineString"
    assert np.array_equal(out, arr)


_ALL_CTS = ["bit", "uint8", "int8", "uint16", "int16", "uint32", "int32",
            "int64", "float32", "float64"]


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(_ALL_CTS), st.sampled_from(_ALL_CTS))
def test_celltype_union_commutative_and_covering(a, b):
    from geotrellis_contrib_ray.core.celltype import _INT_RANGE

    ca, cb = CellType.of(a), CellType.of(b)
    u1, u2 = ca.union(cb), cb.union(ca)
    assert u1 == u2
    if not u1.is_float:
        for c in (ca, cb):
            assert _INT_RANGE[u1.dtype][0] <= _INT_RANGE[c.dtype][0]
            assert _INT_RANGE[u1.dtype][1] >= _INT_RANGE[c.dtype][1]


@settings(max_examples=50, deadline=None)
@given(st.floats(-79, -76, allow_nan=False), st.floats(40, 42, allow_nan=False),
       st.floats(0.01, 1.0, allow_nan=False))
def test_box_pip_agrees_with_raycast_interior(cx, cy, d):
    # strictly interior points: closed-range box test and ray-cast agree
    poly = geom.box(cx - d, cy - d, cx + d, cy + d)
    rng = np.random.default_rng(0)
    px = rng.uniform(cx - 2 * d, cx + 2 * d, 200)
    py = rng.uniform(cy - 2 * d, cy + 2 * d, 200)
    on_edge = (px == cx - d) | (px == cx + d) | (py == cy - d) | (py == cy + d)
    rc = geom.points_in_ring(px, py, poly.exterior)
    bx = geom.box_contains_points(px, py, cx - d, cy - d, cx + d, cy + d)
    assert np.array_equal(rc[~on_edge], bx[~on_edge])


_coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(lambda v: round(v, 6))
_pt = st.tuples(_coord, _coord)


def _ring_strategy():
    # >= 3 distinct points closed back to the start
    return st.lists(_pt, min_size=3, max_size=8).map(
        lambda pts: np.array(pts + [pts[0]], dtype=np.float64)
    )


@given(st.lists(_pt, min_size=2, max_size=10))
@settings(max_examples=50, deadline=None)
def test_wkt_linestring_roundtrip_property(pts):
    arr = np.array(pts, dtype=np.float64)
    wkt = geom.geometry_to_wkt("LineString", arr)
    kind, coords, srid = geom.parse_wkt(wkt)
    assert kind == "LineString" and srid is None
    assert np.allclose(coords, arr)
    # and through WKB
    kind2, coords2, _ = geom.wkb_to_geometry(geom.geometry_to_wkb(kind, coords))
    assert np.allclose(coords2, arr)


@given(_ring_strategy(), st.integers(min_value=1, max_value=999999))
@settings(max_examples=50, deadline=None)
def test_wkt_polygon_srid_roundtrip_property(ring, srid):
    wkt = geom.geometry_to_wkt("Polygon", [ring], srid)
    kind, coords, got_srid = geom.parse_wkt(wkt)
    assert kind == "Polygon" and got_srid == srid
    assert np.allclose(coords[0], ring)
    # WKT -> WKB -> WKT text identity (formatting is canonical)
    wkb = geom.geometry_to_wkb(kind, coords, got_srid)
    kind2, coords2, srid2 = geom.wkb_to_geometry(wkb)
    assert srid2 == srid
    assert geom.geometry_to_wkt(kind2, coords2, srid2) == wkt


@given(
    st.lists(st.text(max_size=40), min_size=0, max_size=12),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=100, deadline=None)
def test_chunk_batch_table_matches_python_slicing(texts, size, stride):
    # chunk i of a doc is text[i*stride : i*stride+size] over CHARACTERS
    # (both the ASCII buffer-gather fast path and the non-ASCII fallback
    # must agree with plain python slicing / SQL substr)
    import pyarrow as pa
    from geotrellis_contrib_ray.stages.pack import chunk_batch_table

    b = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = chunk_batch_table(b, size=size, stride=stride)
    expect = []
    for i, t in enumerate(texts):
        for j in range((len(t) - 1) // stride + 1 if t else 0):
            expect.append((i, j, t[j * stride : j * stride + size]))
    got = list(zip(out["doc_id"].to_pylist(), out["chunk_id"].to_pylist(),
                   out["chunk_text"].to_pylist()))
    assert got == expect
    assert out["chunk_len"].to_pylist() == [len(t) for _, _, t in expect]


@given(st.lists(_pt, min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_wkt_multipoint_roundtrip_property(pts):
    parts = [("Point", p, None) for p in [(float(x), float(y)) for x, y in pts]]
    wkt = geom.geometry_to_wkt("MultiPoint", parts)
    kind, coords, _ = geom.parse_wkt(wkt)
    assert kind == "MultiPoint"
    assert np.allclose([c for _, c, _ in coords], [c for _, c, _ in parts])


@given(
    st.lists(st.text(alphabet="ab λé", min_size=0, max_size=90), min_size=0, max_size=12),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_substring_windows_match_python(texts, win, stride):
    """_substring_windows == the direct python stride-window set per doc,
    for ASCII and non-ASCII (char-counted) texts alike."""
    import pyarrow as pa

    from geotrellis_contrib_ray.stages.dedup import _substring_windows

    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = _substring_windows(t, win=win, stride=stride)
    got = set(zip(out["doc_id"].to_pylist(), out["g"].to_pylist()))
    want = set()
    for i, s in enumerate(texts):
        for o in range(0, len(s) - win + 1, stride):
            want.add((i, s[o:o + win]))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])),
            st.integers(min_value=-5, max_value=5),
            st.floats(min_value=-4, max_value=4, allow_nan=False),
        ),
        min_size=0, max_size=60,
    )
)
@settings(max_examples=80, deadline=None)
def test_reduce_columns_matches_pandas_groupby(rows):
    """_reduce_columns (the kernel under salted_group_reduce AND
    driver_group_rollup) == pandas groupby(dropna=False) for sum/min/max/
    count over string keys with nulls and empty strings."""
    import pandas as pd
    import pyarrow as pa

    from geotrellis_contrib_ray.stages.agg import _reduce_columns

    if not rows:
        return
    k = np.array([r[0] for r in rows], dtype=object)
    s = np.array([r[1] for r in rows], dtype=np.int64)
    f = np.array([r[2] for r in rows], dtype=np.float64)
    data = {"k": k, "s": s, "f": f}
    out = _reduce_columns(lambda c: data[c], ["k"],
                          [("s", "sum", "s_sum"), ("f", "min", "f_min"),
                           (None, "count", "n")]).to_pandas()
    got = {(row["k"] if isinstance(row["k"], str) else None):
           (row["s_sum"], round(row["f_min"], 9), row["n"])
           for _, row in out.iterrows()}
    df = pd.DataFrame({"k": k, "s": s, "f": f})
    exp_df = df.groupby("k", dropna=False).agg(
        s_sum=("s", "sum"), f_min=("f", "min"), n=("s", "size"))
    exp = {(idx if isinstance(idx, str) else None):
           (row["s_sum"], round(row["f_min"], 9), row["n"])
           for idx, row in exp_df.iterrows()}
    assert got == exp
