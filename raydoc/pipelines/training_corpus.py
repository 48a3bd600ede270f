"""Composed training-data pipeline: the engine's pieces chained end-to-end.

    transcripts ──extract──▶ per-turn rows
        │  quality filter (gate_passed ∧ ¬parse_failed ∧ non-empty)
        ▼
    exact near-dup removal on extracted_text (hash-bucket shuffle,
    keep first by (conv_id, turn_idx))
        ▼
    deterministic content-hash train/test split
        ▼
    out_dir/train/ + out_dir/test/ parquet + corpus stats

Everything stays a streaming Dataset until the final writes; the only
exchanges are the extraction pipeline's own (none in aligned mode) plus one
hash-bucket shuffle of (text-hash, key) for dedup.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

import pyarrow as pa

import ray.data as rd

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.pipelines.extract_pipeline import extract_dataset
from raydoc.state import manifest as mstate


def read_extracted(out_dir: str, validate: bool = True) -> rd.Dataset:
    """Consumer-side reader for checkpointed extraction output: optionally
    require every file-granular manifest to be present and well-formed
    before reading (catches half-finished jobs)."""
    mdir = os.path.join(out_dir, "_manifests")
    # only managed (aligned-mode) outputs carry a _manifests dir; partition
    # outputs validate via completed_partitions at job level instead
    if validate and os.path.isdir(mdir):
        outs = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
        manifests = set(os.listdir(mdir))
        missing = [f for f in outs
                   if f.replace(".extracted.parquet", ".json") not in manifests]
        if missing:
            raise ValueError(
                f"{len(missing)} output files lack manifests (incomplete "
                f"job?): {missing[:5]}")
    return rd.read_parquet(out_dir)


def _quality_filter(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    keep = pc.and_(
        pc.and_(t.column("gate_passed"),
                pc.invert(t.column("parse_failed"))),
        pc.greater(pc.utf8_length(
            pc.utf8_trim_whitespace(t.column("extracted_text"))), 0))
    return t.filter(keep)


def _add_dedup_cols_fn(num_buckets: int):
    def _add_dedup_cols(t: pa.Table) -> pa.Table:
        hashes, buckets, splits = [], [], []
        for v in t.column("extracted_text").to_pylist():
            h = hashlib.md5((v or "").encode()).hexdigest()
            hashes.append(h)
            buckets.append(int(h[:4], 16) % num_buckets)
            splits.append("train" if h[0] < "c" else "test")
        return (t.append_column("text_hash", pa.array(hashes, pa.string()))
                 .append_column("dedup_bucket", pa.array(buckets, pa.int32()))
                 .append_column("split", pa.array(splits, pa.string())))
    return _add_dedup_cols


def _dedupe_bucket(g):
    g = g.sort_values(["text_hash", "conv_id", "turn_idx"],
                      ignore_index=True)
    g = g.drop_duplicates(subset=["text_hash"], keep="first")
    return g.drop(columns=["dedup_bucket"])


def build_training_corpus(transcripts_path: str, out_dir: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          global_dedup_dir: str | None = None,
                          global_neardup_dir: str | None = None
                          ) -> dict[str, Any]:
    """Run the composed pipeline and write train/test parquet; returns corpus
    stats (rows in/kept/deduped, split sizes).

    ``global_dedup_dir``: enable CROSS-JOB dedup — rows whose extracted
    text was seen by any previous corpus build sharing this directory are
    dropped (sharded-actor index, state/dedup_index.py); the updated index
    persists back to the directory after the write.

    ``global_neardup_dir``: the MinHash-LSH analog (state/lsh_index.py) —
    also drops rows NEAR-duplicate (band collision) of anything any prior
    build ingested; runs after the exact index so it only pays for
    first-seen rows."""
    from raydoc.functions._buckets import reduce_bucket_count
    ds = extract_dataset(transcripts_path, cfg)
    ds = ds.map_batches(_quality_filter, batch_format="pyarrow")
    ds = ds.map_batches(_add_dedup_cols_fn(reduce_bucket_count()),
                        batch_format="pyarrow")
    ds = ds.groupby("dedup_bucket").map_groups(_dedupe_bucket,
                                               batch_format="pandas")


    cols = ["conv_id", "turn_idx", "extracted_text", "language",
            "quality_score", "text_hash", "split"]
    ds = ds.select_columns(cols)

    index = None
    if global_dedup_dir:
        # after the projection (the spans object column can't cross a
        # pandas→arrow boundary); only digests travel to the index actors
        from raydoc.state.dedup_index import (create_dedup_index,
                                              incremental_dedup, load_index)
        index = (load_index(global_dedup_dir)
                 if os.path.isdir(global_dedup_dir)
                 else create_dedup_index())
        # one fresh salt per BUILD RUN: task retries inside this run share
        # it (idempotent), while a rerun over identical input gets new
        # tokens, so its rows hit the real seen-set instead of replaying
        # the first run's memoized "all new" answers
        import uuid
        ds = incremental_dedup(ds, index, col="extracted_text",
                               token_salt=uuid.uuid4().hex)
    nd_index = None
    if global_neardup_dir:
        from raydoc.state.lsh_index import (create_lsh_index,
                                            incremental_neardup,
                                            load_lsh_index)
        import uuid
        nd_index = (load_lsh_index(global_neardup_dir)
                    if os.path.isdir(global_neardup_dir)
                    else create_lsh_index())
        ds = incremental_neardup(ds, nd_index, col="extracted_text",
                                 token_salt=uuid.uuid4().hex)
    # replace, never append — but via a STAGING dir + swap-on-success: the
    # previous corpus stays intact until the new one is fully written, so
    # a crash mid-build (or a fully-deduped empty rerun) can never destroy
    # the existing output (the same tmp+rename discipline as the file
    # sinks, at directory granularity)
    import shutil
    staging = out_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    ds.write_parquet(staging, partition_cols=["split"])

    # split sizes from parquet FOOTER metadata only (num_rows per file) —
    # no row data is re-read on the driver
    import glob

    import pyarrow.parquet as pq

    def _rows(split: str) -> int:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in
                   glob.glob(os.path.join(staging, f"split={split}",
                                          "*.parquet")))

    train_rows, test_rows = _rows("train"), _rows("test")
    if ((global_dedup_dir or global_neardup_dir)
            and train_rows + test_rows == 0
            and os.path.isdir(out_dir) and any(os.scandir(out_dir))):
        # 0 rows into a FRESH directory is legitimate (the documented
        # already-ingested case); 0 rows REPLACING an existing corpus is
        # almost certainly a rerun that would silently destroy it
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            "build_training_corpus: global dedup dropped 100% of rows — "
            "this input was already ingested into the shared index; "
            "refusing to replace the existing non-empty corpus at "
            f"{out_dir} with an empty one (left untouched)")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(staging, out_dir)
    if index is not None:
        from raydoc.state.dedup_index import save_index
        save_index(index, global_dedup_dir)
    if nd_index is not None:
        from raydoc.state.lsh_index import save_lsh_index
        save_lsh_index(nd_index, global_neardup_dir)
    return {
        "rows": train_rows + test_rows,
        "train_rows": train_rows,
        "test_rows": test_rows,
        "out_dir": out_dir,
        "config_hash": mstate.config_fingerprint(cfg),
    }
