"""Small-file compaction for partitioned parquet output.

A 100 TB job that checkpoints per partition (or resumes repeatedly)
accumulates many small parquet files; downstream reads then pay one
task + footer fetch per fragment. ``compact_parquet_dir`` rewrites a
directory to target-sized files in a single streaming pass:

- read is a normal ``read_parquet`` (schema preserved, no driver
  materialization),
- write uses Ray's ``min_rows_per_file``/``max_rows_per_file`` so the
  engine packs blocks into files of the requested size,
- output goes to a STAGING directory first and atomically swaps in
  (tmp+rename discipline — a crash mid-compaction never destroys the
  input), with a ``_compaction_manifest.json`` recording the before /
  after file counts and row totals for lineage.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data as rd


def _parquet_files(d: str) -> list[str]:
    return sorted(
        os.path.join(r, f)
        for r, _dirs, files in os.walk(d)
        for f in files if f.endswith(".parquet"))


def compact_parquet_dir(in_dir: str, target_rows_per_file: int = 1_000_000,
                        out_dir: str | None = None) -> dict:
    """Rewrite ``in_dir``'s parquet fragments into ~``target_rows_per_file``
    files. In-place by default (atomic swap via a sibling staging dir);
    pass ``out_dir`` to leave the input untouched. Returns the manifest
    dict (files/rows before and after, wall seconds)."""
    import pyarrow.parquet as pq

    in_files = _parquet_files(in_dir)
    if not in_files:
        raise ValueError(f"no parquet files under {in_dir!r}")
    rows_before = sum(pq.read_metadata(f).num_rows for f in in_files)

    in_place = out_dir is None
    staging = (in_dir.rstrip("/") + ".compact-staging") if in_place \
        else out_dir
    shutil.rmtree(staging, ignore_errors=True)

    t0 = time.perf_counter()
    ds = rd.read_parquet(in_files)
    ds.write_parquet(staging,
                     min_rows_per_file=target_rows_per_file,
                     max_rows_per_file=target_rows_per_file)
    wall = time.perf_counter() - t0

    out_files = _parquet_files(staging)
    rows_after = sum(pq.read_metadata(f).num_rows for f in out_files)
    if rows_after != rows_before:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} in, {rows_after} out")

    manifest = {
        "files_before": len(in_files), "files_after": len(out_files),
        "rows": rows_before, "target_rows_per_file": target_rows_per_file,
        "wall_sec": round(wall, 3),
    }
    with open(os.path.join(staging, "_compaction_manifest.json.tmp"),
              "w") as fh:
        json.dump(manifest, fh)
    os.replace(os.path.join(staging, "_compaction_manifest.json.tmp"),
               os.path.join(staging, "_compaction_manifest.json"))

    if in_place:
        backup = in_dir.rstrip("/") + ".compact-old"
        shutil.rmtree(backup, ignore_errors=True)
        os.replace(in_dir, backup)
        os.replace(staging, in_dir)
        shutil.rmtree(backup, ignore_errors=True)
    return manifest
