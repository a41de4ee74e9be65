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


def _render_sql_filter(expr) -> str | None:
    """pyarrow.compute comparison -> Lance/DataFusion SQL filter string, or
    None when the expression isn't a simple ``col op literal``.

    ``str(expr)`` is NOT usable: it renders string literals with DOUBLE
    quotes ('(lang == "en")'), which the SQL dialect resolves as column
    identifiers.  Only the shapes our queries push down are rendered
    (single comparison, conjunctions of comparisons); anything else returns
    None and the caller applies a post-scan Dataset.filter."""
    import re

    txt = str(expr)
    m = re.fullmatch(
        r"\((?P<col>[A-Za-z_][A-Za-z0-9_]*) (?P<op><=|>=|==|!=|<|>) "
        r"(?P<lit>\"[^\"]*\"|-?[0-9]+(?:\.[0-9]+)?)\)",
        txt,
    )
    if m is None:
        return None
    lit = m.group("lit")
    if lit.startswith('"'):
        lit = "'" + lit[1:-1].replace("'", "''") + "'"
    op = {"==": "="}.get(m.group("op"), m.group("op"))
    return f"{m.group('col')} {op} {lit}"


def read_table(path: str, *, columns=None, filter=None):
    """-> ray.data.Dataset over a Lance dataset or Parquet file/dir.

    `filter` is a pyarrow.compute expression; on the Lance path simple
    ``col op literal`` comparisons are rendered to Lance's SQL filter
    (single-quoted string literals — see _render_sql_filter); anything
    more complex falls back to a post-scan Dataset.filter on the same
    expression, so results are identical either way."""
    import ray.data as rd

    if is_lance_path(path) and lance_available():
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = list(columns)
        if filter is not None:
            sql = _render_sql_filter(filter)
            if sql is not None:
                kwargs["filter"] = sql
        ds = rd.read_lance(path, **kwargs)
        if filter is not None and _render_sql_filter(filter) is None:
            # documented fallback: complex expressions filter post-scan
            import pyarrow.dataset as pads  # noqa: F401

            ds = ds.map_batches(
                lambda b, e=filter: b.filter(e), batch_format="pyarrow",
                zero_copy_batch=True, batch_size=None,
            )
        return ds
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter is not None:
        kwargs["filter"] = filter
    return rd.read_parquet(path, **kwargs)
