#!/usr/bin/env python
"""The `ray job submit` entrypoint for the flagship pipeline (north rule:
"runs via ray job submit on fixed N-node and 4N-node clusters").

On a real cluster:
    ray job submit --working-dir /root/repo -- \
        python scripts/flagship_job.py --docs 1000000000 --out /data/flagship \
        --partitions 4096

In this sandbox it runs against the local session (RAY_ADDRESS=local).  The
job is resumable: rerunning with the same --out skips completed partitions
via the checkpoint manifest, and per-partition lineage + metrics land next to
the outputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/flagship_job")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # under `ray job submit` the session exists
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geotrellis_contrib_ray.pipelines.checkpointed import (
        combine_partitions,
        run_flagship_checkpointed,
    )

    t0 = time.perf_counter()
    ran, skipped, table = run_flagship_checkpointed(args.docs, args.out, args.partitions)
    combined = combine_partitions(table)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "docs": args.docs,
                "partitions_ran": len(ran),
                "partitions_skipped": len(skipped),
                "output_rows": combined.num_rows,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(args.docs * len(ran) / max(len(ran) + len(skipped), 1) / max(wall, 1e-9), 1),
                "manifest": os.path.join(args.out, "manifest.jsonl"),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
