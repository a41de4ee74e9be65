"""Affine grid georeferencing + tiling layouts.

Re-expresses the reference's ``GridExtent[Long]`` / ``GridBounds[Long]`` /
``LayoutDefinition`` machinery (reference: vlm/src/main/scala/geotrellis/contrib/vlm/
effect/RasterSourceF.scala:33-185, geotiff/GeoTiffRasterSource.scala:76-107,
benchmark/src/main/scala/GeotrellisRasterSourceBench.scala:32-43) as plain
dataclasses + vectorized numpy functions.  These are *pure* kernels: no Ray, no IO.
They are broadcast to Ray tasks as small pickled values.

Semantics notes (SURVEY.md F9, O1):
- ``grid_bounds_for(extent, clamp)``: world->pixel window.  clamp=False is the
  query path (bounds may extend past the grid, caller intersects later,
  GeoTiffRasterSource.scala:76); clamp=True is the iteration path (:95).
- ``keys_for_geometry`` enumerates intersecting tile keys in **row-major order**
  (row, then col), matching the reference's deterministic key enumeration
  (GeotrellisRasterSourceBench.scala:37-42).
- Combined grids round (not ceil) cols/rows (CHANGELOG.md:97).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

_EPS = 1e-9  # edge tolerance used when converting world coords to cell indexes


@dataclass(frozen=True)
class Extent:
    """Axis-aligned world rectangle (map units)."""

    xmin: float
    ymin: float
    xmax: float
    ymax: float

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    @property
    def center(self) -> tuple[float, float]:
        return ((self.xmin + self.xmax) / 2.0, (self.ymin + self.ymax) / 2.0)

    def buffer(self, d: float) -> "Extent":
        return Extent(self.xmin - d, self.ymin - d, self.xmax + d, self.ymax + d)

    def combine(self, other: "Extent") -> "Extent":
        """Envelope union (MosaicRasterSource.scala:125,141)."""
        return Extent(
            min(self.xmin, other.xmin),
            min(self.ymin, other.ymin),
            max(self.xmax, other.xmax),
            max(self.ymax, other.ymax),
        )

    def intersection(self, other: "Extent") -> "Extent | None":
        xmin = max(self.xmin, other.xmin)
        ymin = max(self.ymin, other.ymin)
        xmax = min(self.xmax, other.xmax)
        ymax = min(self.ymax, other.ymax)
        if xmin >= xmax or ymin >= ymax:
            return None
        return Extent(xmin, ymin, xmax, ymax)

    def intersects(self, other: "Extent") -> bool:
        return not (
            self.xmax <= other.xmin
            or other.xmax <= self.xmin
            or self.ymax <= other.ymin
            or other.ymax <= self.ymin
        )

    def contains_point(self, x: float, y: float) -> bool:
        return self.xmin <= x < self.xmax and self.ymin < y <= self.ymax

    def to_polygon(self) -> np.ndarray:
        """Closed CCW exterior ring, shape (5, 2)."""
        return np.array(
            [
                [self.xmin, self.ymin],
                [self.xmax, self.ymin],
                [self.xmax, self.ymax],
                [self.xmin, self.ymax],
                [self.xmin, self.ymin],
            ],
            dtype=np.float64,
        )


@dataclass(frozen=True)
class GridBounds:
    """Integer pixel window, inclusive on both ends (GridBounds[Long])."""

    col_min: int
    row_min: int
    col_max: int
    row_max: int

    @property
    def width(self) -> int:
        return self.col_max - self.col_min + 1

    @property
    def height(self) -> int:
        return self.row_max - self.row_min + 1

    @property
    def size(self) -> int:
        return self.width * self.height

    def intersection(self, other: "GridBounds") -> "GridBounds | None":
        cm = max(self.col_min, other.col_min)
        rm = max(self.row_min, other.row_min)
        cM = min(self.col_max, other.col_max)
        rM = min(self.row_max, other.row_max)
        if cm > cM or rm > rM:
            return None
        return GridBounds(cm, rm, cM, rM)

    def intersects(self, other: "GridBounds") -> bool:
        return self.intersection(other) is not None

    def split(self, tile_cols: int, tile_rows: int) -> list["GridBounds"]:
        """Aligned tile windows, row-major, ragged edges kept
        (gdal/src/it/.../SubsceneReadingIT.scala:91)."""
        out = []
        for r0 in range(self.row_min, self.row_max + 1, tile_rows):
            for c0 in range(self.col_min, self.col_max + 1, tile_cols):
                out.append(
                    GridBounds(
                        c0,
                        r0,
                        min(c0 + tile_cols - 1, self.col_max),
                        min(r0 + tile_rows - 1, self.row_max),
                    )
                )
        return out


@dataclass(frozen=True)
class GridExtent:
    """Affine grid: extent + cell size + integer dimensions.

    Row 0 is the TOP row (y = ymax), matching the reference raster convention.
    """

    extent: Extent
    cellwidth: float
    cellheight: float
    cols: int
    rows: int

    @staticmethod
    def from_extent(extent: Extent, cols: int, rows: int) -> "GridExtent":
        return GridExtent(extent, extent.width / cols, extent.height / rows, cols, rows)

    @property
    def cell_size(self) -> tuple[float, float]:
        return (self.cellwidth, self.cellheight)

    @property
    def resolution(self) -> float:
        return self.cellwidth

    @property
    def size(self) -> int:
        return self.cols * self.rows

    @property
    def grid_bounds(self) -> GridBounds:
        return GridBounds(0, 0, self.cols - 1, self.rows - 1)

    # -- world -> pixel ------------------------------------------------------
    def map_x_to_grid(self, x):
        """Vectorized world x -> fractional col."""
        return (np.asarray(x, dtype=np.float64) - self.extent.xmin) / self.cellwidth

    def map_y_to_grid(self, y):
        """Vectorized world y -> fractional row (row 0 at top)."""
        return (self.extent.ymax - np.asarray(y, dtype=np.float64)) / self.cellheight

    def map_to_grid(self, x, y):
        """Vectorized (x, y) -> integer (col, row) of containing cell."""
        col = np.floor(self.map_x_to_grid(x) + _EPS).astype(np.int64)
        row = np.floor(self.map_y_to_grid(y) + _EPS).astype(np.int64)
        return col, row

    def grid_to_map(self, col, row):
        """Cell center of (col, row)."""
        x = self.extent.xmin + (np.asarray(col, dtype=np.float64) + 0.5) * self.cellwidth
        y = self.extent.ymax - (np.asarray(row, dtype=np.float64) + 0.5) * self.cellheight
        return x, y

    def grid_bounds_for(self, sub: Extent, clamp: bool = True) -> GridBounds:
        """World extent -> inclusive pixel bounds (F9 in SURVEY.md §2.9).

        clamp=False: query path — result may exceed the grid
        (GeoTiffRasterSource.scala:76); clamp=True snaps into [0, cols/rows-1].
        """
        col_min = int(math.floor((sub.xmin - self.extent.xmin) / self.cellwidth + _EPS))
        row_min = int(math.floor((self.extent.ymax - sub.ymax) / self.cellheight + _EPS))
        # exclusive upper edge: a sub extent ending exactly on a cell boundary
        # does not include the next cell
        col_max = int(math.ceil((sub.xmax - self.extent.xmin) / self.cellwidth - _EPS)) - 1
        row_max = int(math.ceil((self.extent.ymax - sub.ymin) / self.cellheight - _EPS)) - 1
        col_max = max(col_max, col_min)
        row_max = max(row_max, row_min)
        if clamp:
            col_min = min(max(col_min, 0), self.cols - 1)
            row_min = min(max(row_min, 0), self.rows - 1)
            col_max = min(max(col_max, 0), self.cols - 1)
            row_max = min(max(row_max, 0), self.rows - 1)
        return GridBounds(col_min, row_min, col_max, row_max)

    def extent_for(self, bounds: GridBounds, clamp: bool = True) -> Extent:
        """Inverse of grid_bounds_for: pixel window -> world extent."""
        b = bounds
        if clamp:
            inter = bounds.intersection(self.grid_bounds)
            if inter is not None:
                b = inter
        xmin = self.extent.xmin + b.col_min * self.cellwidth
        xmax = self.extent.xmin + (b.col_max + 1) * self.cellwidth
        ymax = self.extent.ymax - b.row_min * self.cellheight
        ymin = self.extent.ymax - (b.row_max + 1) * self.cellheight
        return Extent(xmin, ymin, xmax, ymax)

    def with_resolution(self, cellwidth: float, cellheight: float) -> "GridExtent":
        """New grid over the same extent at a different cell size; dims by
        round-not-ceil (CHANGELOG.md:97)."""
        cols = int(round(self.extent.width / cellwidth))
        rows = int(round(self.extent.height / cellheight))
        return GridExtent(self.extent, cellwidth, cellheight, max(cols, 1), max(rows, 1))

    def combine(self, other: "GridExtent") -> "GridExtent":
        """Mosaic semigroup: envelope-combined extent, min cell size, dims by
        round (MosaicRasterSource.scala:133-146)."""
        cw = min(self.cellwidth, other.cellwidth)
        ch = min(self.cellheight, other.cellheight)
        ext = self.extent.combine(other.extent)
        cols = int(round(ext.width / cw))
        rows = int(round(ext.height / ch))
        return GridExtent(ext, cw, ch, max(cols, 1), max(rows, 1))


@dataclass(frozen=True)
class LayoutDefinition:
    """Tile layout: an extent divided into layout_cols × layout_rows tiles of
    tile_cols × tile_rows pixels.  SpatialKey = (col, row), row 0 at top.
    (reference: FloatingLayoutScheme(256) -> LayoutDefinition,
    GeotrellisRasterSourceBench.scala:32-41)."""

    extent: Extent
    tile_cols: int
    tile_rows: int
    layout_cols: int
    layout_rows: int

    @staticmethod
    def floating(grid: GridExtent, tile_size: int = 256) -> "LayoutDefinition":
        """FloatingLayoutScheme: snap layout to the source grid, ceil tile count."""
        layout_cols = max(1, math.ceil(grid.cols / tile_size))
        layout_rows = max(1, math.ceil(grid.rows / tile_size))
        # layout extent extends the source extent to whole tiles (anchored at
        # the top-left corner, like the reference's floating scheme)
        xmax = grid.extent.xmin + layout_cols * tile_size * grid.cellwidth
        ymin = grid.extent.ymax - layout_rows * tile_size * grid.cellheight
        ext = Extent(grid.extent.xmin, ymin, xmax, grid.extent.ymax)
        return LayoutDefinition(ext, tile_size, tile_size, layout_cols, layout_rows)

    @staticmethod
    def global_latlon(zoom: int, tile_size: int = 256) -> "LayoutDefinition":
        """Global equirectangular ZXY layout: 2^(z+1) × 2^z tiles over
        [-180,180]×[-90,90] (the classic WGS84 tiling scheme)."""
        return LayoutDefinition(
            Extent(-180.0, -90.0, 180.0, 90.0), tile_size, tile_size, 2 ** (zoom + 1), 2**zoom
        )

    @property
    def tile_width(self) -> float:
        return self.extent.width / self.layout_cols

    @property
    def tile_height(self) -> float:
        return self.extent.height / self.layout_rows

    def key_for_point(self, x, y):
        """Vectorized point -> SpatialKey (col, row) int64 arrays; clamped into
        the layout so boundary points stay addressable."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        col = np.floor((x - self.extent.xmin) / self.tile_width).astype(np.int64)
        row = np.floor((self.extent.ymax - y) / self.tile_height).astype(np.int64)
        np.clip(col, 0, self.layout_cols - 1, out=col)
        np.clip(row, 0, self.layout_rows - 1, out=row)
        return col, row

    def key_extent(self, col, row) -> Extent:
        """Inverse of key_for_point: SpatialKey -> world extent of the tile
        (J5: keys.head.extent(layout))."""
        xmin = self.extent.xmin + col * self.tile_width
        ymax = self.extent.ymax - row * self.tile_height
        return Extent(xmin, ymax - self.tile_height, xmin + self.tile_width, ymax)

    def keys_for_extent(self, sub: Extent) -> list[tuple[int, int]]:
        """All keys whose tile extent intersects ``sub``, row-major (O1).
        An extent wholly outside the layout returns [] — clamping the raw
        indices into range FIRST would fabricate a spurious edge key."""
        cmin = int(math.floor((sub.xmin - self.extent.xmin) / self.tile_width + _EPS))
        cmax = int(math.ceil((sub.xmax - self.extent.xmin) / self.tile_width - _EPS)) - 1
        rmin = int(math.floor((self.extent.ymax - sub.ymax) / self.tile_height + _EPS))
        rmax = int(math.ceil((self.extent.ymax - sub.ymin) / self.tile_height - _EPS)) - 1
        cmax = max(cmax, cmin)  # degenerate (point/line) extents cover 1 cell
        rmax = max(rmax, rmin)
        if cmax < 0 or rmax < 0 or cmin > self.layout_cols - 1 or rmin > self.layout_rows - 1:
            return []
        cmin, cmax = max(cmin, 0), min(cmax, self.layout_cols - 1)
        rmin, rmax = max(rmin, 0), min(rmax, self.layout_rows - 1)
        return [(c, r) for r in range(rmin, rmax + 1) for c in range(cmin, cmax + 1)]

    def keys_for_geometry(self, ring: np.ndarray) -> list[tuple[int, int]]:
        """Keys intersecting a polygon ring (row-major).  Covers the bbox then
        refines by tile-extent × polygon intersection
        (layout.mapTransform.keysForGeometry, GeotrellisRasterSourceBench.scala:37)."""
        from .geom import polygon_intersects_box

        xs, ys = ring[:, 0], ring[:, 1]
        bbox = Extent(float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))
        keys = self.keys_for_extent(bbox)
        out = []
        for c, r in keys:
            te = self.key_extent(c, r)
            if polygon_intersects_box(ring, te.xmin, te.ymin, te.xmax, te.ymax):
                out.append((c, r))
        return out
