import numpy as np

from geotrellis_contrib_ray.core.grid import Extent, GridBounds, GridExtent, LayoutDefinition

# FIXTURES.md §4 raster_grid dims
EXT = Extent(630000.0, 215000.0, 645000.0, 228500.0)
GRID = GridExtent(EXT, 10.0, 10.0, 1500, 1350)


def test_grid_dims():
    assert GRID.size == 1500 * 1350
    assert GRID.grid_bounds == GridBounds(0, 0, 1499, 1349)
    assert GRID.cell_size == (10.0, 10.0)


def test_grid_bounds_for_full():
    assert GRID.grid_bounds_for(EXT) == GRID.grid_bounds


def test_grid_bounds_for_subextent():
    # FIXTURES.md §4 window: (630000, 215000, 639000, 219500) = 900x450 cells
    # anchored at bottom-left → cols 0..899, rows 900..1349
    gb = GRID.grid_bounds_for(Extent(630000.0, 215000.0, 639000.0, 219500.0))
    assert gb == GridBounds(0, 900, 899, 1349)


def test_grid_bounds_clamp_vs_unclamped():
    big = Extent(629000.0, 214000.0, 646000.0, 229000.0)
    unc = GRID.grid_bounds_for(big, clamp=False)
    assert unc.col_min < 0 and unc.row_min < 0
    cl = GRID.grid_bounds_for(big, clamp=True)
    assert cl == GRID.grid_bounds


def test_extent_for_roundtrip():
    gb = GridBounds(10, 20, 109, 119)
    e = GRID.extent_for(gb)
    assert GRID.grid_bounds_for(e) == gb


def test_grid_bounds_edge_exclusive():
    # a sub extent ending exactly on a cell boundary does not pull in the next cell
    gb = GRID.grid_bounds_for(Extent(630000.0, 228400.0, 630010.0, 228500.0))
    assert gb == GridBounds(0, 0, 0, 9)


def test_split_256():
    # gridBounds.split(256,256): 1500/256 -> 6 cols, 1350/256 -> 6 rows = 36 windows
    windows = GRID.grid_bounds.split(256, 256)
    assert len(windows) == 36
    assert windows[0] == GridBounds(0, 0, 255, 255)
    # ragged right edge: 1500 - 5*256 = 220 wide
    assert windows[5] == GridBounds(1280, 0, 1499, 255)
    assert windows[5].width == 220
    # ragged bottom edge: 1350 - 5*256 = 70 tall
    assert windows[-1].height == 70
    # windows tile the grid exactly
    assert sum(w.size for w in windows) == GRID.size


def test_floating_layout():
    layout = LayoutDefinition.floating(GRID, 256)
    assert (layout.layout_cols, layout.layout_rows) == (6, 6)
    assert layout.extent.xmin == EXT.xmin and layout.extent.ymax == EXT.ymax
    # layout extends past the source extent to whole tiles
    assert layout.extent.xmax == EXT.xmin + 6 * 256 * 10.0


def test_keys_for_geometry_row_major():
    layout = LayoutDefinition.floating(GRID, 256)
    keys = layout.keys_for_geometry(EXT.to_polygon())
    assert len(keys) == 36
    # row-major: row varies slowest, col fastest (O1)
    assert keys[0] == (0, 0)
    assert keys[1] == (1, 0)
    assert keys[6] == (0, 1)
    # every-5th-key stride sample + take(100) (GeotrellisRasterSourceBench.scala:37-42)
    sampled = [keys[i] for i in range(0, len(keys), 5)][:100]
    assert sampled[0] == (0, 0) and sampled[1] == (5, 0)


def test_key_extent_inverse():
    layout = LayoutDefinition.floating(GRID, 256)
    for c, r in [(0, 0), (3, 2), (5, 5)]:
        e = layout.key_extent(c, r)
        cc, rr = layout.key_for_point([e.center[0]], [e.center[1]])
        assert (cc[0], rr[0]) == (c, r)


def test_key_for_point_vectorized():
    layout = LayoutDefinition.global_latlon(zoom=5)
    lon = np.array([-77.0, 0.0, 179.9])
    lat = np.array([40.0, 0.0, -89.9])
    col, row = layout.key_for_point(lon, lat)
    assert col.tolist() == [int(((-77.0 + 180) / 360) * 64), 32, 63]
    assert row.tolist() == [int(((90 - 40.0) / 180) * 32), 16, 31]


def test_extent_combine_and_grid_combine():
    g2 = GridExtent(Extent(640000.0, 220000.0, 660000.0, 230000.0), 20.0, 20.0, 1000, 500)
    comb = GRID.combine(g2)
    assert comb.cellwidth == 10.0  # min cellSize wins (MosaicRasterSource semantics)
    assert comb.extent == Extent(630000.0, 215000.0, 660000.0, 230000.0)
    assert comb.cols == 3000 and comb.rows == 1500  # round, not ceil
