"""The 26-row Pennsylvania cities point fixture (FIXTURES.md §2; verbatim
values from slick/src/test/scala/geotrellis/slick/Data.scala:25-57).

Rows are (name, x, y) with x = lon-as-listed, y = lat; insertion order is
significant (the reference asserts result order, PostgisSpec.scala:77,98).
Also provides the fixed-width-text parser the reference models (F7).
"""

from __future__ import annotations

CITIES: list[tuple[str, float, float]] = [
    ("Allentown,PA", 75.43, 40.65),
    ("Altoona,PA", 78.32, 40.30),
    ("Beaver Falls,PA", 80.33, 40.75),
    ("Blairsville,PA", 79.09, 40.27),
    ("Bradford,PA", 78.63, 41.80),
    ("Dubois,PA", 78.90, 41.18),
    ("Erie,PA", 80.18, 42.08),
    ("Franklin,PA", 79.87, 41.38),
    ("Harrisburg,PA", 76.85, 40.22),
    ("Harrisburg,PA", 77.42, 40.37),
    ("Johnstown,PA", 78.83, 40.32),
    ("Lancaster,PA", 76.30, 40.13),
    ("Latrobe,PA", 79.40, 40.28),
    ("Middletown,PA", 76.77, 40.20),
    ("Muir,PA", 76.57, 40.43),
    ("Nth Philadel,PA", 75.02, 40.08),
    ("Philadelphia,PA", 75.25, 39.88),
    ("Philipsburg,PA", 78.13, 41.47),
    ("Pittsburgh,PA", 79.93, 40.35),
    ("Pittsburgh,PA", 80.22, 40.50),
    ("Reading,PA", 75.97, 40.38),
    ("Site R,PA", 77.43, 39.73),
    ("State Colleg,PA", 77.83, 40.85),
    ("Wilkes-Barre,PA", 75.73, 41.33),
    ("Williamsport,PA", 76.92, 41.25),
    ("Willow Grove,PA", 75.15, 40.20),
]


def parse_city_line(line: str) -> tuple[str, float, float]:
    """'[CODE] lat lon City,PA' -> (name, lon, lat) (F7, Data.scala:52-57).
    Tolerates variable-width padding: code/lat/lon are the first three
    whitespace-separated fields, the name is the remainder."""
    code, lat_s, lon_s, name = line.split(None, 3)  # noqa: F841 — code discarded
    return name.strip(), float(lon_s), float(lat_s)
