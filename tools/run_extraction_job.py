#!/usr/bin/env python
"""Job driver for the extraction pipeline — the `ray job submit` entrypoint
(SURVEY.md §3.4; ≙ the reference's REST/UI entry, api.py:53-138).

    ray job submit -- python tools/run_extraction_job.py \
        --input /data/transcripts --output /data/extracted \
        [--aligned] [--no-resume] [--concurrency N] [--partitions P]

Owns its Ray session only when run standalone (guarded init — under
`ray job submit` the cluster connection already exists). Prints the job
report (files/partitions written + skipped, rows, turns/sec) as one JSON
line on stdout; exits non-zero if any input file failed so schedulers can
retry (completed work is checkpointed — the retry only redoes failures).
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--aligned", action="store_true",
                    help="shuffle-elision mode (input files must be "
                         "conversation-aligned)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--concurrency", type=int, default=0,
                    help="extractor pool size (0 = auto from cluster CPUs)")
    ap.add_argument("--partitions", type=int, default=0,
                    help="output partitions in general mode (0 = default)")
    ap.add_argument("--waves", type=int, default=0,
                    help="general-mode checkpoint waves (crash loses at "
                         "most one wave; 0 = single barrier)")
    ap.add_argument("--gate-fallback", action="store_true",
                    help="re-extract gate-failed documents once through the "
                         "alternate (legacy) kernel path")
    ap.add_argument("--validate-output", action="store_true",
                    help="after the job, verify every output file has a "
                         "valid manifest and count rows")
    ap.add_argument("--address", default="local",
                    help="Ray cluster address (default: local; use 'auto' "
                         "under ray job submit)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=args.address,
                 include_dashboard=False, ignore_reinit_error=True)

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    cfg = DEFAULT_CONFIG
    overrides = {}
    if args.aligned:
        overrides["assume_conv_aligned"] = True
    if args.concurrency:
        overrides["extract_concurrency"] = args.concurrency
    if args.partitions:
        overrides["num_output_partitions"] = args.partitions
    if args.gate_fallback:
        overrides["enable_gate_fallback"] = True
    if args.waves:
        overrides["checkpoint_waves"] = args.waves
    if overrides:
        cfg = replace(cfg, **overrides)

    report = run_job(args.input, args.output, cfg=cfg,
                     resume=not args.no_resume)

    if args.validate_output:
        from raydoc.pipelines.training_corpus import read_extracted
        report["validated_rows"] = read_extracted(args.output).count()

    print(json.dumps(report))

    ray.shutdown()
    return 1 if report.get("files_failed") else 0


if __name__ == "__main__":
    sys.exit(main())
