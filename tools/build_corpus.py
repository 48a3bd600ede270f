#!/usr/bin/env python
"""Job driver for the composed training-corpus pipeline
(transcripts → extract → quality filter → exact dedup → split → partitioned
parquet): the `ray job submit` entrypoint for corpus builds.

    python tools/build_corpus.py --input /data/transcripts \
        --output /data/corpus [--aligned] [--gate-fallback]

Prints the corpus stats report as one JSON line.
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
                    help="input files are conversation-aligned "
                         "(shuffle-elision extraction)")
    ap.add_argument("--gate-fallback", action="store_true")
    ap.add_argument("--concurrency", type=int, default=0)
    ap.add_argument("--global-dedup-dir", default=None,
                    help="cross-job dedup index directory (rows whose "
                         "text was seen by any prior build here are "
                         "dropped; index persists back)")
    ap.add_argument("--global-neardup-dir", default=None,
                    help="cross-job NEAR-dup (MinHash-LSH) index "
                         "directory — also drops paraphrase-grade "
                         "near-duplicates of prior builds")
    ap.add_argument("--address", default="local")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True)

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.training_corpus import build_training_corpus

    overrides = {}
    if args.aligned:
        overrides["assume_conv_aligned"] = True
    if args.gate_fallback:
        overrides["enable_gate_fallback"] = True
    if args.concurrency:
        overrides["extract_concurrency"] = args.concurrency
    cfg = replace(DEFAULT_CONFIG, **overrides) if overrides else DEFAULT_CONFIG

    stats = build_training_corpus(args.input, args.output, cfg=cfg,
                              global_dedup_dir=args.global_dedup_dir,
                              global_neardup_dir=args.global_neardup_dir)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
