#!/usr/bin/env python
"""Run one (or more) driver queries by name and print the result.

Usage: python tools/run_query.py QUERY [QUERY ...] [--sf DIR] [--rows N]

The user-facing probe for any of the `__ray_entry__.queries()`
entries — owns its own Ray session (library code never calls ray.init).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--rows", type=int, default=10,
                    help="preview row count (0 = just the row total)")
    ap.add_argument("--stats", action="store_true",
                    help="log per-operator Dataset stats after each "
                         "execution (wall time, blocks, rows, memory "
                         "per map/shuffle stage — the ds.stats() "
                         "feedback loop for shape tuning)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry   # imports ray but does NOT init it

    qs = entry.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:                     # argument errors never pay ray.init
        print(f"unknown queries: {unknown}; available: {sorted(qs)}",
              file=sys.stderr)
        return 2

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    if args.stats:
        import logging

        from ray.data import DataContext
        DataContext.get_current().enable_auto_log_stats = True
        logging.getLogger("ray.data").setLevel(logging.INFO)
    try:
        for name in args.queries:
            t0 = time.perf_counter()
            result = qs[name](args.sf)
            try:
                import pandas as pd
                df = result.to_pandas() if not isinstance(
                    result, pd.DataFrame) else result
            except AttributeError:
                df = result
            dt = time.perf_counter() - t0
            print(f"== {name}  ({len(df)} rows, {dt:.2f}s, sf={args.sf})")
            if args.rows:
                print(df.head(args.rows).to_string(index=False))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
