"""JSONL ingest tier (sources/jsonl.py): exact string fidelity through
JSON escaping, shard-per-block layout, and the JSON-exact type guard."""

import numpy as np
import pyarrow as pa
import pytest


def test_jsonl_roundtrip_exact_strings(ray_session, tmp_path):
    import ray.data as rd

    from geotrellis_contrib_ray.sources.jsonl import read_jsonl, write_jsonl

    texts = ["plain", 'quotes "and" \\backslash\\', "new\nline\ttab",
             "unicode: žluťoučký 情報 🚀", "", "trailing space "]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    path = str(tmp_path / "shards")
    write_jsonl(rd.from_arrow(t).repartition(3), path)
    back = read_jsonl(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["text"].tolist() == texts
    assert back["doc_id"].tolist() == list(range(len(texts)))


def test_jsonl_rejects_float_columns(ray_session, tmp_path):
    import ray.data as rd

    from geotrellis_contrib_ray.sources.jsonl import write_jsonl

    t = pa.table({"x": pa.array([1.5], pa.float64())})
    with pytest.raises(TypeError, match="JSON-exact"):
        write_jsonl(rd.from_arrow(t), str(tmp_path / "bad"))


def test_csv_roundtrip_exact_strings(ray_session, tmp_path):
    import ray.data as rd

    from geotrellis_contrib_ray.sources.csv_io import (
        read_csv_shards,
        write_csv_shards,
    )

    texts = ["plain", 'quotes "and" more', "new\nline,comma", "tab\there",
             "unicode: žluťoučký 情報 🚀", "trailing space "]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    path = str(tmp_path / "csv_shards")
    write_csv_shards(rd.from_arrow(t).repartition(3), path)
    back = (read_csv_shards(path).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert back["text"].tolist() == texts


def test_csv_rejects_float_columns(ray_session, tmp_path):
    import ray.data as rd

    from geotrellis_contrib_ray.sources.csv_io import write_csv_shards

    t = pa.table({"x": pa.array([1.5], pa.float64())})
    with pytest.raises(TypeError, match="CSV-exact"):
        write_csv_shards(rd.from_arrow(t), str(tmp_path / "bad"))
