"""Poison-row quarantine: per-row failures become an error column, not a
failed block (SURVEY.md §4 — the reference surfaces per-op errors through its
Either/Try effects; at 100 TB a single malformed record must not kill a task
or poison a retry loop).

``quarantine_map_batches`` wraps a vectorized batch fn: if the fn raises, the
batch is bisected recursively until the failing rows are isolated (log2(n)
extra fn calls per contiguous poison cluster — the happy path stays one
vectorized call).  Failing rows pass through with ``error`` set and the fn's
output columns nulled; clean rows get ``error = null``.
"""

from __future__ import annotations

import pyarrow as pa


def _apply_with_bisect(fn, batch: pa.Table, out_parts: list, err_parts: list):
    try:
        out = fn(batch)
        out_parts.append(out)
        err_parts.append(pa.nulls(len(out), pa.string()))
        return
    except Exception as e:  # noqa: BLE001 — quarantine by design
        if len(batch) <= 1:
            # base case covers 0-row batches too: bisecting an empty batch
            # recurses on itself forever (slice(0,0) == slice(0))
            out_parts.append(batch)
            err_parts.append(pa.array([repr(e)[:200]] * len(batch), pa.string()))
            return
        mid = len(batch) // 2
        _apply_with_bisect(fn, batch.slice(0, mid), out_parts, err_parts)
        _apply_with_bisect(fn, batch.slice(mid), out_parts, err_parts)


def quarantine_map_batches(ds, fn, *, error_col: str = "error", **map_kwargs):
    """map_batches(fn) with poison-row quarantine.

    The fn must be row-wise (output row i derived from input row i, same row
    count) so bisection is sound.  Rows that still fail at size 1 keep their
    INPUT columns and carry the exception text in ``error_col``; the caller
    filters ``error IS NOT NULL`` into a quarantine sink."""

    def wrapped(batch: pa.Table) -> pa.Table:
        out_parts: list[pa.Table] = []
        err_parts: list[pa.Array] = []
        _apply_with_bisect(fn, batch, out_parts, err_parts)
        # unify schemas: failed slices keep input columns; fill fn-added
        # columns with nulls so all parts concat.  Type union is seeded from
        # SUCCESS parts first (err entry all-null): when fn transforms a
        # column's dtype and a poison slice (input-typed) happens to be
        # emitted first, bisect order must not let the input type win — that
        # would null out every successful part's transformed values.  Poison
        # part types only fill columns no success part carries.
        success_schemas = [p.schema for p, e in zip(out_parts, err_parts)
                           if e.null_count == len(e)]
        poison_schemas = [p.schema for p, e in zip(out_parts, err_parts)
                          if e.null_count != len(e)]
        all_fields: dict[str, pa.DataType] = {}
        for s in success_schemas + poison_schemas:
            for f in s:
                all_fields.setdefault(f.name, f.type)
        norm = []
        for part, errs in zip(out_parts, err_parts):
            cols = {}
            for name, typ in all_fields.items():
                if name in part.column_names:
                    col = part[name]
                    if col.type != typ:
                        # fn TRANSFORMED this column's type: poison slices
                        # still carry the input type — null the value (the
                        # original is unrecoverable into the output type)
                        # so mixed-schema parts still concat
                        cols[name] = pa.nulls(len(part), typ)
                    else:
                        cols[name] = col
                else:
                    cols[name] = pa.nulls(len(part), typ)
            cols[error_col] = errs
            norm.append(pa.table(cols))
        return pa.concat_tables(norm)

    map_kwargs.setdefault("batch_format", "pyarrow")
    map_kwargs.setdefault("zero_copy_batch", True)
    map_kwargs.setdefault("batch_size", None)
    return ds.map_batches(wrapped, **map_kwargs)


def split_quarantine(ds, error_col: str = "error"):
    """-> (clean_ds, poison_ds): route quarantined rows to their own sink."""
    import pyarrow.compute as pc

    clean = ds.map_batches(
        lambda b: b.filter(pc.is_null(b[error_col])).drop_columns([error_col]),
        batch_format="pyarrow",
        batch_size=None,
    )
    poison = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[error_col])),
        batch_format="pyarrow",
        batch_size=None,
    )
    return clean, poison
