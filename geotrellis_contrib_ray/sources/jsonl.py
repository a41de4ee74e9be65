"""JSONL (line-delimited JSON) ingest/egest tier for document corpora.

Training-data pipelines overwhelmingly exchange corpora as JSONL shards
(one JSON object per line); this tier round-trips the documents table
through Ray Data's native JSON IO so a user can drop JSONL dumps straight
into every operator in this repo.  Columns are restricted to
JSON-exact types (int64 / utf8) on the write side — floats would pick up
formatting noise, which is exactly what the parity query guards against.

Scale notes: write_jsonl emits one shard per upstream block (the same
resumable-partition layout as the parquet writers), and read_jsonl streams
shards back as independent blocks — both sides are embarrassingly
parallel, no driver materialization.
"""

from __future__ import annotations

import os
import shutil

_JSON_EXACT = {"int64", "int32", "string", "large_string", "bool"}


def write_jsonl(ds, path: str, *, overwrite: bool = True):
    """Spill a dataset to a directory of JSONL shards (one per block).

    Refuses non-JSON-exact column types (floats/binary) — JSON float
    formatting is not bit-stable across writers, and binary has no JSON
    type; callers should encode those upstream (cents ints, base64)."""
    schema = ds.schema()
    if schema is None or not getattr(schema, "names", None):
        # zero-block input (empty corpus): nothing to spill — an empty
        # shard dir round-trips as an empty dataset
        if overwrite and os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        return path
    bad = [n for n, t in zip(schema.names, schema.types)
           if str(t) not in _JSON_EXACT]
    if bad:
        raise TypeError(
            f"write_jsonl: columns {bad} are not JSON-exact "
            f"(int/string/bool); encode them upstream")
    if overwrite and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_json(path)
    return path


def read_jsonl(path: str):
    """Read a JSONL shard directory back as a Dataset (schema-metadata
    stripped so downstream shuffles keep hashable schemas)."""
    import ray.data as rd

    from ..util import strip_schema_metadata

    if not any(os.scandir(path)):
        return rd.range(0).filter(lambda r: True)  # zero-row, zero-batch
    return rd.read_json(path).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
