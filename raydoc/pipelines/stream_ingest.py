"""Continuous ingestion — the 100-TB operating mode.

A production extraction deployment is not one batch job; it is a
watcher that tails an arriving-shard directory (crawl dumps, transcript
exports) and lands each new shard's EXTRACTED turns into one
queryable, time-travelable table exactly once. This module composes
three pieces that already exist — the shuffle-elision aligned
extraction (`extract_pipeline.build_extraction_aligned`), the ACID
table log (`state/table_log.py`), and optionally the cross-job dedup
indexes — into that loop:

- ``ingest_new_shards(input_dir, table_dir)``: one pass. New input
  shards (never named in any ``ingest:`` commit) are extracted in
  groups of ``group_size`` files — each group is ONE fused-actor
  Dataset (files ≫ actors inside a group keeps the pool busy) and ONE
  ``append_once`` commit whose operation string carries the shards'
  relpaths. The commit IS the exactly-once ledger: a crash before it
  re-extracts the group (no duplicates — nothing committed); a crash
  after it skips the group forever; a RACING ingestor loses the
  optimistic version claim and aborts its duplicate commit at the
  rebased re-check. Readers see whole groups or nothing, never a
  half-extracted shard.
- ``watch(...)``: the daemon loop — rescan every ``interval_s``
  seconds until ``max_rounds`` (None = forever).

Failure envelope: an aborted/crashed attempt leaves only
content-addressed orphan parquet under the table dir, removable by
``table_log.vacuum``; the log and every committed snapshot stay
consistent. At cluster scale the same loop runs per arriving-prefix
partition (one ingestor per prefix; the optimistic claims make
overlapping ingestors safe, just wasteful).
"""

from __future__ import annotations

import os
import time
from typing import Any

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.pipelines.extract_pipeline import (build_extraction_aligned,
                                               list_parquet_files)
from raydoc.state import table_log


def _relpaths(files: list[str], input_dir: str) -> list[str]:
    root = input_dir if os.path.isdir(input_dir) else \
        os.path.dirname(input_dir)
    return [os.path.relpath(p, root) for p in files]


def ingest_new_shards(input_dir: str, table_dir: str,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      group_size: int = 16,
                      stats_cols: list[str] | None = None,
                      matviews: list[tuple] | None = None
                      ) -> dict[str, Any]:
    """Extract-and-commit every input shard not yet in the table log.
    Returns a report (files seen/new/ingested, rows, versions).
    ``matviews`` = [(view_dir, group_cols, sum_cols), ...]: after any
    commit lands, each materialized view refreshes incrementally
    (state/matview.py), so downstream rollups stay current with zero
    extra passes over old data."""
    files = list_parquet_files(input_dir)
    rels = _relpaths(files, input_dir)
    done = table_log.ingested_sources(table_dir)
    pending = [(p, r) for p, r in zip(files, rels) if r not in done]
    report: dict[str, Any] = {
        "files_seen": len(files),
        "files_new": len(pending),
        "files_ingested": 0,
        "rows_ingested": 0,
        "versions": [],
    }
    for off in range(0, len(pending), group_size):
        group = pending[off:off + group_size]
        ds = build_extraction_aligned([p for p, _ in group], cfg)
        version = table_log.append_once(
            ds, table_dir, [r for _, r in group],
            stats_cols=stats_cols or ["conv_id"])
        if version is None:       # a racing ingestor beat us to the group
            continue
        report["files_ingested"] += len(group)
        report["versions"].append(version)
        report["rows_ingested"] += sum(
            a.get("n_rows", 0)
            for a in table_log.commit_info(table_dir, version)["actions"]
            if "add" in a)
    if report["versions"] and matviews:
        from raydoc.state.matview import refresh_matview
        report["matviews"] = [
            refresh_matview(table_dir, vd, gc, sc)
            for vd, gc, sc in matviews]
    return report


def watch(input_dir: str, table_dir: str,
          cfg: PipelineConfig = DEFAULT_CONFIG,
          interval_s: float = 30.0, max_rounds: int | None = None,
          group_size: int = 16) -> list[dict[str, Any]]:
    """The daemon loop: rescan-ingest every ``interval_s`` seconds.
    ``max_rounds`` bounds the loop (tests/CLI); None runs forever."""
    reports = []
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        reports.append(ingest_new_shards(input_dir, table_dir, cfg,
                                         group_size=group_size))
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            break
        time.sleep(interval_s)
    return reports
