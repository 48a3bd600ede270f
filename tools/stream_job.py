"""Continuous-ingestion entrypoint: tail an arriving-shard directory and
land each shard's extracted turns into an ACID table-log table exactly
once.

    python tools/stream_job.py --input DIR --table DIR \
        [--interval 30] [--rounds N] [--group-size 16] [--aligned]

One round with --rounds 1 is the cron/batch shape; omit --rounds to run
as a daemon. Safe to run several ingestors on the same table (optimistic
commit claims; losers skip, never duplicate).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from dataclasses import replace


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--interval", type=float, default=30.0)
    ap.add_argument("--rounds", type=int, default=None,
                    help="stop after N scan rounds (default: run forever)")
    ap.add_argument("--group-size", type=int, default=16,
                    help="input shards per commit (exactly-once granule)")
    ap.add_argument("--concurrency", type=int, default=0)
    ap.add_argument("--address", default="local")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True)

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.stream_ingest import watch

    cfg = DEFAULT_CONFIG
    if args.concurrency:
        cfg = replace(cfg, extract_concurrency=args.concurrency)

    reports = watch(args.input, args.table, cfg=cfg,
                    interval_s=args.interval, max_rounds=args.rounds,
                    group_size=args.group_size)
    print(json.dumps(reports))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
