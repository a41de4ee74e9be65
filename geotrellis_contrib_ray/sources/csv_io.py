"""CSV ingest/egest tier — the second text exchange format next to
sources/jsonl.py, same contract: shard-per-block writes, JSON/CSV-exact
column types only (floats pick up formatting noise), schema metadata
stripped on read.

The reader enables ``newlines_in_values`` — quoted fields with embedded
newlines are the norm in document CSVs and Arrow's default parser rejects
them; the parity query proves quoting fidelity by recomputing text
lengths from the round-tripped strings."""

from __future__ import annotations

import os
import shutil

_CSV_EXACT = {"int64", "int32", "string", "large_string", "bool"}


def write_csv_shards(ds, path: str, *, overwrite: bool = True):
    """Spill a dataset to a directory of CSV shards (one per block);
    refuses non-CSV-exact column types (floats/binary)."""
    schema = ds.schema()
    if schema is None or not getattr(schema, "names", None):
        # zero-block input (empty corpus): nothing to spill — an empty
        # shard dir round-trips as an empty dataset
        if overwrite and os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        return path
    bad = [n for n, t in zip(schema.names, schema.types)
           if str(t) not in _CSV_EXACT]
    if bad:
        raise TypeError(
            f"write_csv_shards: columns {bad} are not CSV-exact "
            f"(int/string/bool); encode them upstream")
    if overwrite and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)
    return path


def read_csv_shards(path: str):
    """Stream a CSV shard directory back as a Dataset: embedded newlines
    allowed, schema metadata stripped for hashable shuffle schemas."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    from ..util import strip_schema_metadata

    if not any(os.scandir(path)):
        return rd.range(0).filter(lambda r: True)  # zero-row, zero-batch
    return rd.read_csv(
        path, parse_options=pacsv.ParseOptions(newlines_in_values=True)
    ).map_batches(strip_schema_metadata, batch_format="pyarrow",
                  zero_copy_batch=True, batch_size=None)
