from . import cells, celltype, crs, geom, grid, resample  # noqa: F401
from .celltype import CellType, convert, interpret_as  # noqa: F401
from .grid import Extent, GridBounds, GridExtent, LayoutDefinition  # noqa: F401
