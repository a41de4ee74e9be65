"""Checkpoint / resume: per-partition outputs + a JSON lineage manifest.

North-rule requirement: every pipeline stage writes partitioned output
(one parquet dir per partition / key range), appends a manifest row
(partition id, input fingerprint, row count, span-hash, wall time), and a
rerun anti-joins the manifest against the plan to skip finished partitions.
Writes are atomic (temp file + rename) so a killed run never leaves a
half-written partition that looks complete.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class CheckpointManifest:
    """Append-only JSONL manifest of completed partitions."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "manifest.jsonl")

    def completed(self) -> dict[str, dict]:
        out = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        out[rec["partition"]] = rec
        return out

    def record(self, partition: str, *, rows: int, fingerprint: str = "", span_hash: int = 0, wall_sec: float = 0.0, extra: dict | None = None):
        rec = {
            "partition": partition,
            "rows": rows,
            "fingerprint": fingerprint,
            "span_hash": span_hash,
            "wall_sec": round(wall_sec, 4),
            "ts": time.time(),
        }
        if extra:
            rec.update(extra)
        # O_APPEND single-line writes are atomic enough for one writer per
        # partition; concurrent writers each append whole lines
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def pending(self, partitions: list[str]) -> list[str]:
        """Resume anti-join: plan partitions minus completed ones."""
        done = self.completed()
        return [p for p in partitions if p not in done]


def write_partition_atomic(table, root: str, partition: str) -> str:
    """Write one partition's parquet atomically: tmp file + rename."""
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    final = os.path.join(root, f"part-{partition}.parquet")
    tmp = os.path.join(root, f".tmp-{partition}-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return final


def run_partitioned(
    partitions: list[str],
    make_table,
    root: str,
    *,
    span_hash_fn=None,
    fingerprint_fn=None,
):
    """Execute a partitioned job with resume: for each PENDING partition,
    build its table (``make_table(partition) -> pyarrow.Table``), write
    atomically, append the manifest row.  Returns (ran, skipped) lists.

    Partition-level driver loop — each make_table is itself a Ray pipeline
    over that partition's input shard, so the loop body is cheap."""
    manifest = CheckpointManifest(root)
    pending = manifest.pending(partitions)
    skipped = [p for p in partitions if p not in pending]
    ran = []
    for p in pending:
        t0 = time.perf_counter()
        table = make_table(p)
        write_partition_atomic(table, root, p)
        manifest.record(
            p,
            rows=table.num_rows,
            fingerprint=fingerprint_fn(p) if fingerprint_fn else "",
            span_hash=int(span_hash_fn(table)) if span_hash_fn else 0,
            wall_sec=time.perf_counter() - t0,
        )
        ran.append(p)
    return ran, skipped


def read_all_partitions(root: str):
    """Read back the union of completed partitions (validation / downstream)."""
    import glob

    import pyarrow.parquet as pq
    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(root, "part-*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])
