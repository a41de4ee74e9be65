"""Scalar function surface (st_-style aliases over the core kernels) —
the discoverable equivalent of the reference's PostGIS function library
(slick PostGisSupport predicates/functions)."""

from ..core.geom import (  # noqa: F401
    bbox_buffer as st_make_envelope_buffer,
    box as st_make_envelope,
    box_contains_points as st_contains_box,
    convex_contains_points as st_contains_convex,
    distance as st_distance,
    geometry_to_wkb as st_as_wkb,
    line_length as st_length,
    multipoint_centroid as st_centroid_points,
    point_geojson as st_as_geojson,
    point_to_ewkt as st_as_ewkt,
    points_in_ring as st_contains_ring,
    polygon_area as st_area,
    polygon_centroid as st_centroid,
    wkb_to_geometry as st_geom_from_wkb,
)
from . import cities  # noqa: F401
