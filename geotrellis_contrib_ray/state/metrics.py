"""Per-stage metrics: parse ``Dataset.stats()`` into structured records and
persist them next to checkpoint manifests (north rule: per-partition lineage
+ METRICS).  Also the local feedback loop the README prescribes — read the
per-operator wall/UDF times and iterate until wall is dominated by useful
compute.
"""

from __future__ import annotations

import json
import os
import re
import time

_OP_RE = re.compile(
    r"Operator (\d+) (.+?): (\d+) tasks executed, (\d+) blocks produced in ([\d.]+)s"
)
_LINE_RE = re.compile(r"\* (Remote wall time|Remote cpu time|UDF time): .*?([\d.]+\w*s) total")
_ROWS_RE = re.compile(r"\* Output num rows per block: .*?(\d+) total")
_TPUT_RE = re.compile(r"Ray Data throughput: ([\d.]+) rows/s")


def _to_seconds(s: str) -> float:
    for suffix, mult in (("us", 1e-6), ("ms", 1e-3), ("s", 1.0)):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    return float(s)


def parse_stats(stats_text: str) -> dict:
    """Dataset.stats() text -> {operators: [...], throughput_rows_per_s}."""
    ops = []
    blocks = stats_text.split("Operator ")
    for block in blocks[1:]:
        m = _OP_RE.match("Operator " + block)
        if not m:
            continue
        rec = {
            "op": int(m.group(1)),
            "name": m.group(2),
            "tasks": int(m.group(3)),
            "blocks": int(m.group(4)),
            "wall_s": float(m.group(5)),
        }
        for lm in _LINE_RE.finditer(block):
            key = lm.group(1).lower().replace(" ", "_")
            rec[key + "_total_s"] = _to_seconds(lm.group(2))
        rm = _ROWS_RE.search(block)
        if rm:
            rec["rows"] = int(rm.group(1))
        ops.append(rec)
    out = {"operators": ops}
    tm = _TPUT_RE.search(stats_text.split("Dataset throughput")[-1])
    if tm:
        out["throughput_rows_per_s"] = float(tm.group(1))
    return out


def record_metrics(ds, path: str, *, label: str = "", extra: dict | None = None) -> dict:
    """Append a structured metrics record for an executed Dataset to a JSONL
    file (one line per pipeline run).  Call AFTER consuming the dataset."""
    rec = {"label": label, "ts": time.time(), **parse_stats(ds.stats())}
    if extra:
        rec.update(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec
