import json

from geotrellis_contrib_ray.state.metrics import parse_stats, record_metrics


def test_parse_and_record_metrics(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.range(10_000).map_batches(lambda b: b, batch_format="pyarrow")
    ds = ds.materialize()
    rec = record_metrics(ds, str(tmp_path / "metrics.jsonl"), label="smoke")
    assert rec["label"] == "smoke"
    assert len(rec["operators"]) >= 1
    op = rec["operators"][0]
    assert op["tasks"] > 0 and op["wall_s"] >= 0
    assert "remote_wall_time_total_s" in op
    assert rec.get("throughput_rows_per_s", 0) > 0
    # JSONL persisted
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 1 and json.loads(lines[0])["label"] == "smoke"
