"""Packed Hilbert R-tree (state/rtree.py): curve properties, tree probes vs
brute force, and tier-equivalence with the grid indexes."""

import numpy as np
import pyarrow as pa

from geotrellis_contrib_ray.core import geom as geommod
from geotrellis_contrib_ray.state.rtree import (
    HilbertPointIndex,
    HilbertPolygonIndex,
    HilbertRTree,
    hilbert_d,
)
from geotrellis_contrib_ray.state.spatial_index import (
    GridPointIndex,
    GridPolygonIndex,
)


def test_hilbert_bijective_and_adjacent():
    """A Hilbert curve is exactly: a bijection onto [0, 4^order) whose
    consecutive codes are unit-step (Manhattan) grid neighbors."""
    for order in (2, 3, 5, 6):
        n = 1 << order
        gx, gy = np.meshgrid(np.arange(n), np.arange(n))
        gx, gy = gx.ravel(), gy.ravel()
        d = hilbert_d(order, gx, gy)
        assert len(np.unique(d)) == n * n
        assert d.min() == 0 and d.max() == n * n - 1
        o = np.argsort(d)
        steps = np.abs(np.diff(gx[o])) + np.abs(np.diff(gy[o]))
        assert (steps == 1).all()


def _rand_boxes(n, seed, lo=0.0, hi=100.0, wmax=5.0):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(lo, hi, n)
    y0 = rng.uniform(lo, hi, n)
    w = rng.uniform(0.01, wmax, n)
    h = rng.uniform(0.01, wmax, n)
    return np.column_stack([x0, y0, x0 + w, y0 + h])


def test_rtree_query_bbox_matches_bruteforce():
    boxes = _rand_boxes(3000, 42)
    tree = HilbertRTree(boxes, node_size=16)
    rng = np.random.default_rng(1)
    for _ in range(40):
        qx0, qy0 = rng.uniform(-5, 100, 2)
        qx1, qy1 = qx0 + rng.uniform(0, 20), qy0 + rng.uniform(0, 20)
        got = np.sort(tree.query_bbox(qx0, qy0, qx1, qy1))
        exp = np.nonzero(
            (boxes[:, 0] <= qx1)
            & (boxes[:, 1] <= qy1)
            & (boxes[:, 2] >= qx0)
            & (boxes[:, 3] >= qy0)
        )[0]
        assert got.tolist() == exp.tolist()


def test_rtree_query_bbox_tiny_trees():
    for n in (1, 2, 15, 16, 17):
        boxes = _rand_boxes(n, n)
        tree = HilbertRTree(boxes)
        got = np.sort(tree.query_bbox(-10, -10, 200, 200))
        assert got.tolist() == list(range(n))
        # and a miss
        assert len(tree.query_bbox(-100, -100, -99, -99)) == 0


def test_rtree_query_points_matches_bruteforce():
    boxes = _rand_boxes(500, 7)
    tree = HilbertRTree(boxes, node_size=8)
    rng = np.random.default_rng(2)
    px = rng.uniform(-5, 105, 4000)
    py = rng.uniform(-5, 105, 4000)
    pt, bid = tree.query_points(px, py)
    got = set(zip(pt.tolist(), bid.tolist()))
    inside = (
        (px[:, None] >= boxes[None, :, 0])
        & (py[:, None] >= boxes[None, :, 1])
        & (px[:, None] <= boxes[None, :, 2])
        & (py[:, None] <= boxes[None, :, 3])
    )
    exp = set(zip(*[a.tolist() for a in np.nonzero(inside)]))
    assert got == exp


def test_hilbert_polygon_index_matches_grid_index():
    rng = np.random.default_rng(9)
    polys = []
    for i in range(40):
        cx, cy = rng.uniform(-80, -75), rng.uniform(39.5, 42.5)
        r = rng.uniform(0.05, 0.5)
        polys.append((f"z{i}", geommod.box(cx - r, cy - r, cx + r, cy + r).exterior))
    grid = GridPolygonIndex(polys)
    rt = HilbertPolygonIndex(polys)
    px = rng.uniform(-80.5, -74.5, 6000)
    py = rng.uniform(39.0, 43.0, 6000)
    g_pt, g_pid = grid.query_points(px, py)
    r_pt, r_pid = rt.query_points(px, py)
    assert set(zip(g_pt.tolist(), g_pid.tolist())) == set(
        zip(r_pt.tolist(), r_pid.tolist())
    )


def test_hilbert_point_index_knn_matches_bruteforce():
    rng = np.random.default_rng(11)
    centers = rng.uniform(0, 100, (20, 2))
    pts = centers[rng.integers(0, 20, 5000)] + rng.normal(0, 2.0, (5000, 2))
    ids = np.arange(5000)
    idx = HilbertPointIndex(ids, pts[:, 0], pts[:, 1])
    for _ in range(50):
        qx, qy = rng.uniform(-5, 105, 2)
        got_ids, got_d = idx.nearest_k(qx, qy, 7)
        d = np.sqrt((pts[:, 0] - qx) ** 2 + (pts[:, 1] - qy) ** 2)
        order = np.lexsort((ids, d))[:7]
        assert got_ids.tolist() == ids[order].tolist(), (qx, qy)
        assert np.allclose(got_d, d[order])


def test_hilbert_point_index_knn_exact_ties():
    """Integer-lattice symmetric points produce exact double ties; the
    (dist, id) tie-break must match the SQL oracle's ORDER BY dist, doc_id."""
    xs = np.array([1.0, -1.0, 0.0, 0.0, 3.0])
    ys = np.array([0.0, 0.0, 1.0, -1.0, 3.0])
    ids = np.array([40, 30, 20, 10, 5])
    idx = HilbertPointIndex(ids, xs, ys)
    got_ids, got_d = idx.nearest_k(0.0, 0.0, 3)
    assert got_ids.tolist() == [10, 20, 30]
    assert np.allclose(got_d, [1.0, 1.0, 1.0])


def test_hilbert_point_index_k_exceeds_n():
    ids = np.array([3, 1])
    idx = HilbertPointIndex(ids, np.array([0.0, 5.0]), np.array([0.0, 0.0]))
    got_ids, got_d = idx.nearest_k(1.0, 0.0, 10)
    assert got_ids.tolist() == [3, 1]
    assert np.allclose(got_d, [1.0, 4.0])


def test_pip_join_rtree_tier_matches_grid_tier(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.pipelines.query_defs import ZONE_BOXES
    from geotrellis_contrib_ray.state.spatial_index import pip_join_indexed

    rng = np.random.default_rng(5)
    px = rng.uniform(-80.0, -75.0, 20000)
    py = rng.uniform(39.5, 42.5, 20000)
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(20000), "lon": px, "lat": py}))
    polys = [(n, geommod.box(x0, y0, x1, y1).exterior) for n, x0, y0, x1, y1 in ZONE_BOXES]
    got = (
        pip_join_indexed(ds, polys, index="rtree")
        .to_pandas()
        .sort_values(["doc_id", "zone_name"])
        .reset_index(drop=True)
    )
    exp = (
        pip_join_indexed(ds, polys, index="grid")
        .to_pandas()
        .sort_values(["doc_id", "zone_name"])
        .reset_index(drop=True)
    )
    assert got[["doc_id", "zone_name"]].equals(exp[["doc_id", "zone_name"]])


def test_spatial_sort_hilbert_locality(ray_session):
    """spatial_sort range-partitions along the curve: hkey nondecreasing
    across the stream, and each equal-`part` run covers a compact bbox
    (max diagonal far below the full extent's)."""
    import ray.data as rd

    from geotrellis_contrib_ray.stages.spatial import spatial_sort

    rng = np.random.default_rng(17)
    lon = rng.uniform(-80.0, -75.0, 20000)
    lat = rng.uniform(39.5, 42.5, 20000)
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(20000), "lon": lon, "lat": lat}))
    out = spatial_sort(ds, parts_bits=10).to_pandas()
    assert (np.diff(out["hkey"].to_numpy()) >= 0).all()
    # range-partition compactness: split the sorted stream into 64
    # equal-count chunks (what Dataset.sort's range partitioning produces);
    # curve locality keeps each chunk's bbox small vs the full extent.
    diags = []
    for g in np.array_split(out, 64):
        diags.append(
            np.hypot(g["lon"].max() - g["lon"].min(), g["lat"].max() - g["lat"].min())
        )
    full = np.hypot(5.0, 3.0)
    assert np.median(diags) < full / 4


def test_grid_point_index_bulk_matches_per_query():
    """nearest_k_bulk must be row-for-row identical to per-query nearest_k
    (same exact expanding-window termination and (dist, id) tie-break),
    including clustered + uniform mixes, queries outside the data extent,
    and k > n."""
    rng = np.random.default_rng(7)
    centers = rng.uniform(0, 100, (15, 2))
    pts = np.vstack([
        centers[rng.integers(0, 15, 4000)] + rng.normal(0, 1.5, (4000, 2)),
        rng.uniform(-10, 110, (1000, 2)),
    ])
    ids = rng.permutation(len(pts)).astype(np.int64)
    idx = GridPointIndex(ids, pts[:, 0], pts[:, 1])
    qx = rng.uniform(-20, 120, 300)
    qy = rng.uniform(-20, 120, 300)
    for k in (1, 5, 17):
        qpos, bids, bd = idx.nearest_k_bulk(qx, qy, k)
        for qi in range(len(qx)):
            sel = qpos == qi
            eids, ed = idx.nearest_k(qx[qi], qy[qi], k)
            assert bids[sel].tolist() == eids.tolist(), (k, qi)
            assert np.allclose(bd[sel], ed)


def test_grid_point_index_bulk_ties_and_k_exceeds_n():
    xs = np.array([1.0, -1.0, 0.0, 0.0, 3.0])
    ys = np.array([0.0, 0.0, 1.0, -1.0, 3.0])
    ids = np.array([40, 30, 20, 10, 5])
    idx = GridPointIndex(ids, xs, ys)
    qpos, bids, bd = idx.nearest_k_bulk(np.array([0.0]), np.array([0.0]), 3)
    assert bids.tolist() == [10, 20, 30]
    assert np.allclose(bd, [1.0, 1.0, 1.0])
    qpos, bids, bd = idx.nearest_k_bulk(np.array([1.0]), np.array([0.0]), 10)
    assert qpos.tolist() == [0] * 5
    assert bids.tolist() == [40, 10, 20, 30, 5]


def test_polygon_index_closed_boundaries():
    """Points exactly ON a zone edge (incl. the index's global max edge) are
    contained in BOTH index tiers — BETWEEN/half-plane closed semantics, the
    same as the brute tier and the SQL oracle (review repro, round 2)."""
    ring = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], float)
    px = np.array([10.0, 10.0, 5.0, 0.0, 10.0, 11.0])
    py = np.array([5.0, 10.0, 10.0, 0.0, 0.0, 5.0])
    g = GridPolygonIndex([("z", ring)])
    pt, _ = g.query_points(px, py)
    assert sorted(pt.tolist()) == [0, 1, 2, 3, 4]
    h = HilbertPolygonIndex([("z", ring)])
    pt, _ = h.query_points(px, py)
    assert sorted(pt.tolist()) == [0, 1, 2, 3, 4]
