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
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        # torn tail from a crash mid-append: the partition's
                        # completion was not durably recorded — treat it as
                        # incomplete (it will re-run; the atomic parquet
                        # rename makes the rewrite safe), don't wedge resume
                        continue
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
        # partition; concurrent writers each append whole lines.  If a crash
        # left a torn line without a trailing newline, lead with one so this
        # record doesn't fuse onto the torn tail (the torn line itself is
        # skipped by completed()).
        lead = ""
        if os.path.exists(self.path) and os.path.getsize(self.path) > 0:
            with open(self.path, "rb") as f:
                f.seek(-1, os.SEEK_END)
                if f.read(1) != b"\n":
                    lead = "\n"
        with open(self.path, "a") as f:
            f.write(lead + json.dumps(rec) + "\n")

    def pending(self, partitions: list[str], fingerprint_fn=None) -> list[str]:
        """Resume anti-join: plan partitions minus completed ones.

        With ``fingerprint_fn``, a completed partition whose recorded input
        fingerprint no longer matches the CURRENT input is re-run — the
        fingerprint participates in invalidation, it is not write-only."""
        done = self.completed()

        def fresh(p: str) -> bool:
            if p not in done:
                return False
            if fingerprint_fn is None:
                return True
            return str(done[p].get("fingerprint", "")) == str(fingerprint_fn(p))

        return [p for p in partitions if not fresh(p)]


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
    pending = manifest.pending(partitions, fingerprint_fn=fingerprint_fn)
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


def read_all_partitions(root: str, partitions: list[str] | None = None):
    """Read back the union of completed partitions (validation / downstream).

    Reads only files the MANIFEST records as complete (a stale part file
    from a previous plan with different partition names is not silently
    unioned in); ``partitions`` further restricts to the current plan."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    done = CheckpointManifest(root).completed()
    names = sorted(done if partitions is None
                   else [p for p in partitions if p in done])
    files = [os.path.join(root, f"part-{p}.parquet") for p in names]
    files = [f for f in files if os.path.exists(f)]
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])
