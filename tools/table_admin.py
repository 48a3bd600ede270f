"""Operational CLI for table-log tables (state/table_log.py).

    python tools/table_admin.py versions  --table DIR
    python tools/table_admin.py log       --table DIR [--tail N]
    python tools/table_admin.py ingested  --table DIR
    python tools/table_admin.py optimize  --table DIR [--target-rows N]
    python tools/table_admin.py vacuum    --table DIR [--keep N]
    python tools/table_admin.py delete-where --table DIR --col C \
        --values 1,2,3
    python tools/table_admin.py refresh-view --table DIR --view DIR \
        --group-cols a,b --sum-cols v

Each subcommand prints one JSON line. delete-where/optimize/refresh
need a Ray session (local by default); the read-only commands don't.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["versions", "log", "ingested",
                                    "optimize", "vacuum", "delete-where",
                                    "refresh-view"])
    ap.add_argument("--table", required=True)
    ap.add_argument("--tail", type=int, default=20)
    ap.add_argument("--target-rows", type=int, default=250_000)
    ap.add_argument("--keep", type=int, default=2)
    ap.add_argument("--col")
    ap.add_argument("--values", help="comma-separated; ints when numeric")
    ap.add_argument("--view")
    ap.add_argument("--group-cols")
    ap.add_argument("--sum-cols")
    ap.add_argument("--address", default="local")
    args = ap.parse_args()

    from raydoc.state import table_log as tl

    if args.cmd in ("optimize", "delete-where", "refresh-view"):
        import ray
        if not ray.is_initialized():
            ray.init(address=args.address, include_dashboard=False,
                     ignore_reinit_error=True)

    if args.cmd == "versions":
        out = {"versions": tl.list_versions(args.table),
               "head": tl.latest_version(args.table)}
    elif args.cmd == "log":
        vs = tl.list_versions(args.table)[-args.tail:]
        out = {"log": [{k: v for k, v in tl.commit_info(args.table,
                                                        ver).items()
                        if k != "actions"}
                       | {"n_actions": len(tl.commit_info(
                           args.table, ver)["actions"])}
                       for ver in vs]}
    elif args.cmd == "ingested":
        out = {"sources": sorted(tl.ingested_sources(args.table))}
    elif args.cmd == "optimize":
        out = {"version": tl.optimize(args.table,
                                      target_rows=args.target_rows)}
    elif args.cmd == "vacuum":
        out = {"deleted": tl.vacuum(args.table, keep_versions=args.keep)}
    elif args.cmd == "delete-where":
        if not (args.col and args.values):
            ap.error("delete-where needs --col and --values")
        raw = args.values.split(",")
        vals = [int(v) if v.lstrip("-").isdigit() else v for v in raw]
        out = {"version": tl.delete_where(args.table, args.col, vals)}
    else:                                   # refresh-view
        if not (args.view and args.group_cols and args.sum_cols):
            ap.error("refresh-view needs --view/--group-cols/--sum-cols")
        from raydoc.state.matview import refresh_matview
        out = refresh_matview(args.table, args.view,
                              args.group_cols.split(","),
                              args.sum_cols.split(","))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
