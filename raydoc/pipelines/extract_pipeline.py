"""End-to-end extraction pipeline (the rebuild of SURVEY.md §3.4).

GENERAL mode (arbitrary input layout; cfg.exchange picks the exchange):

    read_parquet(transcripts)                       # half-CPU read tasks
      → map_batches(_SpillingExtractorActor)        # DEFAULT "bucketed":
          extract + hash-partition + per-bucket IPC # fused actor stage,
          fragment append, emits counts only        # no sort barrier
      → one task per bucket: read frags → document_block_fn
      → write_parquet(out/part=k/) + per-partition manifests  # checkpointed

    (cfg.exchange="sort" falls back to the classic
     map_batches(ExtractorActor) → groupby("shuffle_key").map_groups
     sort shuffle — no extra moving parts, measured ~0.6 scaling.)

ALIGNED mode (cfg.assume_conv_aligned — documented partitioning assumption:
a conversation never spans input files, the standard layout for transcript
corpora written per conversation range):

    from_items(file list)
      → map_batches(FusedFileActor, batch_size=1)   # fused extract+document
         (each task: read one file → extract → document → write one output
          file atomically + file-granular lineage manifest)

Aligned mode elides the conv_id exchange entirely — the recommended 100 TB
topology (zero shuffle, per-file work stealing, resume = skip files with
valid manifests; measured 0.75 raw / 0.93 hw-normalized 8→32-CPU scaling
efficiency vs 0.44 for the general path — see BASELINE.md).

Streaming throughout: nothing materializes the full dataset; the only
all-to-all exchange is the general path's conv_id exchange (bucketed
fragment files or the sort shuffle — never a driver-side collect).
"""

from __future__ import annotations

import os
import time
from typing import Any

import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.stages.document_stage import document_block_fn
from raydoc.stages.extract import ExtractorActor
from raydoc.state import manifest as mstate

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "text"]


def read_transcripts(path: str) -> rd.Dataset:
    """Column-pruned read: only (conv_id, turn_idx, text) leave storage.
    Dispatches on file extension: parquet (default), jsonl/json, csv,
    feather/arrow IPC, orc, avro, warc, or a folder of md/txt/html
    documents.

    Shuffle strategy note: the conv_id groupby uses Ray's default pull-based
    sort shuffle. HASH_SHUFFLE was measured faster in isolation (~1.6×) but
    its aggregator actors deadlock against a fixed-size extractor actor pool
    when the pool holds nearly all CPUs (both sides wait for CPU slots), so
    we keep the sort shuffle — it needs no long-lived reducer actors."""
    fmt = _input_format(path)
    if fmt == "json":
        if os.path.isdir(path):
            # skip _-prefixed metadata (e.g. the sink's manifest), keep
            # data shards incl. .jsonl.gz (Ray decompresses by extension)
            files = sorted(
                os.path.join(root, f)
                for root, _, fs in os.walk(path) for f in fs
                if not f.startswith("_")
                and (f.endswith(".json") or f.endswith(".jsonl")
                     or f.endswith(".jsonl.gz")))
            ds = rd.read_json(files)
        else:
            ds = rd.read_json(path)
        return ds.select_columns(TRANSCRIPT_COLUMNS)
    if fmt == "csv":
        ds = rd.read_csv(path)
        return ds.select_columns(TRANSCRIPT_COLUMNS)
    if fmt == "feather":
        return _read_feather_dataset(path)
    if fmt == "orc":
        from raydoc.functions.orcio import read_orc
        return read_orc(path, columns=TRANSCRIPT_COLUMNS)
    if fmt == "avro":
        from raydoc.functions.avroio import read_avro
        return read_avro(path, columns=TRANSCRIPT_COLUMNS)
    if fmt == "warc":
        return _read_warc_dataset(path)
    if fmt == "pdf":
        return _read_pdf_dir(path)
    if fmt == "textdir":
        return _read_text_dir(path)
    # read tasks at half a CPU: parquet shard reads are IO-bound, and a
    # full-CPU read task can only run in the 2 slots the extract actor
    # pool leaves free — measured as the stage-1 critical path at 16
    # CPUs (actors 69% idle waiting on input). Half-CPU reads interleave
    # with the pool instead of queueing behind it.
    return rd.read_parquet(path, columns=TRANSCRIPT_COLUMNS,
                           ray_remote_args={"num_cpus": 0.5})


_FEATHER_EXTS = {".feather", ".arrow", ".ipc"}
_TEXT_EXTS = {".md", ".txt", ".html", ".htm"}


def _read_text_dir(path: str) -> rd.Dataset:
    """Folder-of-documents source — the reference's native input shape
    (a directory of markdown/HTML/text files, one document each;
    SmolDocling-OCR main.py walks an input dir). Each file becomes a
    single-turn conversation: conv_id = filename stem, turn_idx = 0,
    text = decoded contents. Streams via Ray's native binary-file
    reader (one task per file group, no driver-side file loop)."""
    import pyarrow as pa

    ds = rd.read_binary_files(
        path, include_paths=True,
        file_extensions=[e.lstrip(".") for e in sorted(_TEXT_EXTS)])

    def to_rows(t: pa.Table) -> pa.Table:
        paths = t.column("path").to_pylist()
        blobs = t.column("bytes").to_pylist()
        return pa.table({
            "conv_id": pa.array(
                [os.path.splitext(os.path.basename(p))[0]
                 for p in paths], pa.string()),
            "turn_idx": pa.array([0] * len(paths), pa.int32()),
            "text": pa.array(
                [(b or b"").decode("utf-8", "replace") for b in blobs],
                pa.string()),
        })

    return ds.map_batches(to_rows, batch_format="pyarrow")


def _read_pdf_dir(path: str) -> rd.Dataset:
    """Folder-of-PDFs source — the reference's FIRST-TOUCH input shape
    (structure_engine.py:304 ingests a PDF path). Each PDF becomes a
    single-turn conversation: conv_id = filename stem, turn_idx = 0,
    text = the extracted text layer (sources/pdf.py minimal stream-text
    walk: raw/Flate streams, BT/ET show operators). A scanned or
    malformed PDF fail-softs to empty text and flows through the
    pipeline's parse_failed path — the reference would OCR it (network
    non-goal, SURVEY.md §2.1). Streams via Ray's binary-file reader."""
    import pyarrow as pa

    from raydoc.sources.pdf import pdf_extract_text

    ds = rd.read_binary_files(path, include_paths=True,
                              file_extensions=["pdf"])

    def to_rows(t: pa.Table) -> pa.Table:
        paths = t.column("path").to_pylist()
        texts = []
        for b in t.column("bytes").to_pylist():
            try:
                texts.append(pdf_extract_text(b or b""))
            except ValueError:
                texts.append("")
        return pa.table({
            "conv_id": pa.array(
                [os.path.splitext(os.path.basename(p))[0]
                 for p in paths], pa.string()),
            "turn_idx": pa.array([0] * len(paths), pa.int32()),
            "text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(to_rows, batch_format="pyarrow")


def _read_warc_dataset(path: str) -> rd.Dataset:
    """WARC crawl-archive corpus (sources/warc.py): each response
    record becomes a single-turn conversation — conv_id = the
    WARC-Target-URI, turn_idx = 0, text = the HTTP payload. The native
    input shape of a web-scale extraction job (Common Crawl hands you
    exactly this)."""
    import pyarrow as pa

    from raydoc.sources.warc import read_warc

    def to_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pc.cast(t.column("url"), pa.string()),
            "turn_idx": pa.array([0] * t.num_rows, pa.int32()),
            "text": pc.cast(t.column("text"), pa.string()),
        })

    return read_warc(path).map_batches(to_rows, batch_format="pyarrow")


def _read_feather_dataset(path: str) -> rd.Dataset:
    """Arrow IPC / Feather corpus: one read task per file (Ray has no
    native IPC reader; the file list fans out and each task returns its
    table column-pruned — same per-file parallelism as the parquet path)."""
    import pyarrow as pa
    import pyarrow.feather as pf

    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if os.path.splitext(f)[1].lower() in _FEATHER_EXTS)

    def read_files(t: pa.Table) -> pa.Table:
        tables = [pf.read_table(p, columns=TRANSCRIPT_COLUMNS)
                  for p in t.column("path").to_pylist()]
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        read_files, batch_format="pyarrow", batch_size=1)


def _input_format(path: str) -> str:
    """Sniff the corpus format from its file extensions. `_`-prefixed
    metadata files (sink manifests like _orc_manifest.json) don't count
    — an export_* output dir must dispatch on its data shards."""
    names = [f.lower()
             for f in (os.listdir(path) if os.path.isdir(path) else [path])
             if not os.path.basename(f).startswith("_")]
    if any(f.endswith(".warc") or f.endswith(".warc.gz") for f in names):
        return "warc"
    if any(f.endswith(".jsonl.gz") for f in names):
        return "json"          # Ray's JSON reader decompresses .gz natively
    exts = {os.path.splitext(f)[1] for f in names}
    if exts & {".jsonl", ".json"}:
        return "json"
    if ".csv" in exts:
        return "csv"
    if exts & _FEATHER_EXTS:
        return "feather"
    if ".orc" in exts:
        return "orc"
    if ".avro" in exts:
        return "avro"
    if ".pdf" in exts:
        return "pdf"
    if exts & _TEXT_EXTS:
        return "textdir"
    return "parquet"


def dedup_turns(ds: rd.Dataset) -> rd.Dataset:
    """Optional ingest dedup of duplicated (conv_id, turn_idx) rows — keep
    first by text order (SURVEY.md §7.3). Costs a shuffle; off by default.

    Shuffles on a coarse hash bucket of conv_id (all copies of a key land in
    one block) and deduplicates per block with one vectorized
    drop_duplicates — not one map_groups call per (conv_id, turn_idx)."""
    import hashlib as _hashlib

    import pandas as pd
    import pyarrow as pa

    from raydoc.functions._buckets import reduce_bucket_count
    nbuckets = reduce_bucket_count()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = [int(_hashlib.md5(c.encode()).hexdigest()[:8], 16) % nbuckets
                for c in t.column("conv_id").to_pylist()]
        return t.append_column("dedup_bucket", pa.array(keys, pa.int32()))

    def dedupe_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "text"], ignore_index=True)
        g = g.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
        return g.drop(columns=["dedup_bucket"])

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("dedup_bucket").map_groups(dedupe_block,
                                                batch_format="pandas"))


def _default_concurrency() -> int:
    """Fixed-size extractor pool of (cluster CPUs − 2) actors so the read,
    shuffle and write stages are never starved. Fixed (not autoscaling from
    1) because actor init is cheap and the autoscaler's ramp-up serializes
    the first half of the job (measured 2× slower at 32 CPUs)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, cpus - 2)


def build_extraction(ds: rd.Dataset,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Lazy pipeline: extractor actor pool → conv_id document stage."""
    extracted = ds.map_batches(
        ExtractorActor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency or _default_concurrency(),
        num_cpus=1,
    )
    # Shuffle on the fine hash bucket, not raw conv_id: the reduce function
    # receives a whole bucket of complete conversations per call, amortizing
    # per-group overhead; conv co-location is preserved because the bucket is
    # a function of conv_id alone.
    out = extracted.groupby("shuffle_key").map_groups(
        lambda g: document_block_fn(g, cfg), batch_format="pyarrow")
    return out


_STAGE1_MARKER = "_STAGE1_DONE.json"


def build_extraction_bucketed(ds: rd.Dataset,
                              cfg: PipelineConfig = DEFAULT_CONFIG,
                              spill_root: str | None = None,
                              resume_token: str | None = None
                              ) -> tuple[rd.Dataset, str]:
    """General-path exchange WITHOUT the global sort barrier.

    Stage 1 (eager): extractor actor pool → each output batch is
    partitioned by ``shuffle_key % buckets`` with one stable argsort and
    appended to its buckets as Arrow IPC fragments (atomic tmp+rename) —
    a disk-backed hash exchange: O(1) per batch, no sampling pass, no
    sort, and no long-lived reducer actors (the documented
    HASH_SHUFFLE/actor-pool deadlock cannot occur). Stage 2 (lazy): one
    independent task per non-empty bucket reads its fragments and runs
    the document stage — conversations are co-located because the bucket
    is a function of conv_id alone.

    The only barrier is stage-1 completion (inherent to any hash
    exchange); its fixed cost is directory setup, not a sample+sort of
    the dataset — the term that pinned the sort path's measured scaling
    at ~0.6 (BASELINE.md rounds 2-4). On a multi-node cluster
    ``spill_root`` must be shared storage — the standard external-
    shuffle topology (map tasks write bucket files, reduce tasks read
    them), which additionally makes the exchange resumable at bucket
    granularity.

    A ``resume_token`` makes the EXCHANGE ITSELF a checkpoint: when
    stage 1 completed for the same token (marker file in the spill
    root), the whole extraction stage is skipped and stage 2 reads the
    existing fragments — a job that crashed between the exchange and
    the output write never re-pays extraction. A spill tree WITHOUT a
    valid marker (crash mid-stage-1) is wiped first, since appending a
    rerun's fragments over partial ones would duplicate rows.

    Returns (dataset, spill_root); the caller owns spill cleanup after
    consuming the dataset."""
    import json as _json
    import uuid

    import numpy as np
    import pyarrow as pa
    import pyarrow.ipc as ipc

    nb = cfg.num_output_partitions * max(1, cfg.spill_fineness)
    if spill_root is None:
        import tempfile
        spill_root = os.path.join(
            tempfile.gettempdir(),
            f"raydoc_exchange_{uuid.uuid4().hex[:8]}")

    marker = os.path.join(spill_root, _STAGE1_MARKER)
    stage1_done = False
    if resume_token is not None and os.path.isfile(marker):
        try:
            with open(marker) as fh:
                stage1_done = _json.load(fh).get("token") == resume_token
        except (OSError, ValueError):
            stage1_done = False
    if not stage1_done and os.path.isdir(spill_root):
        import shutil as _sh                 # partial stage 1: wipe —
        _sh.rmtree(spill_root, ignore_errors=True)  # never append over it

    if not stage1_done:
        for k in range(nb):
            os.makedirs(os.path.join(spill_root, f"b{k:05d}"),
                        exist_ok=True)
        # stage 1 is ONE fused actor stage (extract + partition +
        # fragment write in the same __call__, emitting only count
        # rows): a separate spill operator would compete with the
        # extract pool for CPU slots AND ship every heavy extracted
        # block (pickled elements) through the object store — fusing
        # removes both. spill_batch_rows sets the actor batch so each
        # call writes few, reasonably-sized fragments.
        extracted = ds.map_batches(
            _SpillingExtractorActor,
            fn_constructor_kwargs={"cfg": cfg, "spill": spill_root,
                                   "nb": nb},
            batch_format="pyarrow",
            batch_size=cfg.spill_batch_rows,
            concurrency=cfg.extract_concurrency or _default_concurrency(),
            num_cpus=1,
        )
        extracted.sum("rows")  # the exchange barrier: stage-1 complete
        if resume_token is not None:
            tmp = marker + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump({"token": resume_token, "buckets": nb}, fh)
            os.replace(tmp, marker)

    spill = spill_root
    nonempty = [k for k in range(nb)
                if os.listdir(os.path.join(spill, f"b{k:05d}"))]
    if not nonempty:
        empty = document_block_fn(_empty_extract_block(), cfg)
        return rd.from_arrow(empty), spill_root

    buckets = rd.from_items([{"bucket": k} for k in nonempty])

    def process_bucket(t: pa.Table) -> pa.Table:
        k = int(t.column("bucket")[0].as_py())
        bdir = os.path.join(spill, f"b{k:05d}")
        frags = sorted(os.path.join(bdir, f) for f in os.listdir(bdir)
                       if f.endswith(".arrow"))
        tbl = pa.concat_tables([ipc.open_file(f).read_all()
                                for f in frags])
        return document_block_fn(tbl, cfg)

    out = buckets.map_batches(process_bucket, batch_format="pyarrow",
                              batch_size=1, num_cpus=1)
    return out, spill_root


class _SpillingExtractorActor:
    """Fused stage-1 worker for the bucketed exchange: runs the normal
    ExtractorActor kernel on each batch, hash-partitions the result by
    ``shuffle_key % nb`` with one stable argsort, and appends each run
    to its bucket directory as an Arrow IPC fragment (atomic
    tmp+rename). Emits only per-batch row counts — the heavy extracted
    payload never enters the object store."""

    def __init__(self, cfg: PipelineConfig, spill: str, nb: int) -> None:
        self._inner = ExtractorActor(cfg=cfg)
        self._spill = spill
        self._nb = nb

    def __call__(self, batch) -> "Any":
        import hashlib as _hl

        import numpy as np
        import pyarrow as pa
        import pyarrow.ipc as ipc

        t = self._inner(batch)
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        keys = (t.column("shuffle_key").to_numpy(zero_copy_only=False)
                .astype(np.int64) % self._nb)
        order = np.argsort(keys, kind="stable")
        by_key = t.take(pa.array(order))
        ks = keys[order]
        bounds = np.flatnonzero(np.diff(ks)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(ks)]])
        # fragment tag is a CONTENT hash of the batch's row identities,
        # not a uuid: a Ray task/actor retry re-running the same batch
        # produces the same filenames and os.replace overwrites the
        # first attempt's fragments — the exchange stays exactly-once
        # under retries instead of duplicating rows
        h = _hl.blake2s(digest_size=8)
        h.update(";".join(by_key.column("conv_id").to_pylist()).encode())
        h.update(by_key.column("turn_idx").to_numpy(
            zero_copy_only=False).astype(np.int64).tobytes())
        tag = h.hexdigest()
        for s, e in zip(starts, ends):
            frag = by_key.slice(int(s), int(e - s))
            path = os.path.join(self._spill, f"b{int(ks[s]):05d}",
                                f"{tag}-{int(s)}.arrow")
            # pid-scoped tmp: a speculative retry racing the first
            # attempt must not corrupt its half-written tmp file (both
            # os.replace to the same final name with identical content)
            tmp = f"{path}.tmp-{os.getpid()}"
            with pa.OSFile(tmp, "wb") as fh, \
                    ipc.new_file(fh, frag.schema) as w:
                w.write_table(frag)
            os.replace(tmp, path)      # readers never see partial frags
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})


def _empty_extract_block() -> "Any":
    """Zero-row block with the extractor output schema (for the 0-input
    edge so the bucketed path still yields a correctly-typed dataset)."""
    import pyarrow as pa
    return pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "elements": pa.array([], pa.binary()),
        "was_html": pa.array([], pa.bool_()),
        "strip_ratio": pa.array([], pa.float32()),
        "parse_failed": pa.array([], pa.bool_()),
        "part": pa.array([], pa.int32()),
        "shuffle_key": pa.array([], pa.int32()),
    })


def list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in sorted(files)
                   if f.endswith(".parquet"))
    return sorted(out)


def build_extraction_aligned(input_path: str,
                             cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Shuffle-elision pipeline for conversation-aligned input files
    (cfg.assume_conv_aligned): file list → fused extract+document actor
    pool, one file per task, zero exchange. Streaming end-to-end; skew is
    handled by file-granular work stealing (many files ≫ actors)."""
    from raydoc.stages.extract import FusedFileActor
    files = (list(input_path) if isinstance(input_path, (list, tuple))
             else list_parquet_files(input_path))
    ds = rd.from_items([{"path": p} for p in files])
    return ds.map_batches(
        FusedFileActor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=cfg.extract_concurrency or _aligned_concurrency(),
        num_cpus=1,
    )


def _aligned_concurrency() -> int:
    """cpus−1 actors for the fused path: the only other consumers are the
    tiny file-list read and the parquet write tasks (one spare CPU is
    enough; cpus−2 left 25% idle at 8 CPUs)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, cpus - 1)


def extract_dataset(path_or_ds, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    if isinstance(path_or_ds, str) and cfg.assume_conv_aligned:
        return build_extraction_aligned(path_or_ds, cfg)
    ds = read_transcripts(path_or_ds) if isinstance(path_or_ds, str) else path_or_ds
    if cfg.exchange == "bucketed":
        # eager stage-1 exchange; the spill tree lives until process exit
        # (consumers may iterate the lazy stage-2 dataset any time) — the
        # checkpointed job path (run_job) instead cleans up per wave
        import atexit
        import shutil as _sh
        out, spill = build_extraction_bucketed(ds, cfg)
        atexit.register(_sh.rmtree, spill, ignore_errors=True)
        return out
    return build_extraction(ds, cfg)


def input_fingerprint(path: str) -> str:
    """Cheap lineage fingerprint of an input directory/file: names + sizes
    (content hash would re-read 100 TB; size+name catches regeneration)."""
    import hashlib
    h = hashlib.sha256()
    paths = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            paths.extend(os.path.join(root, f) for f in sorted(files))
    else:
        paths = [path]
    for p in sorted(paths):
        try:
            h.update(f"{os.path.basename(p)}:{os.path.getsize(p)};".encode())
        except OSError:
            pass
    return h.hexdigest()[:16]


def run_job(input_path: str, out_dir: str,
            cfg: PipelineConfig = DEFAULT_CONFIG,
            resume: bool = True) -> dict[str, Any]:
    """Checkpointed job: skip completed partitions, write the rest, then
    stamp per-partition manifests with extraction metrics.

    Returns a job report (partitions written/skipped, rows, turns/sec).
    """
    if cfg.assume_conv_aligned:
        return run_job_aligned(input_path, out_dir, cfg, resume=resume)

    fingerprint = input_fingerprint(input_path)
    cfg_hash = mstate.config_fingerprint(cfg)
    n_parts = cfg.num_output_partitions
    done = (mstate.completed_partitions(out_dir, n_parts,
                                        input_fingerprint=fingerprint,
                                        config_hash=cfg_hash)
            if resume else set())
    pending = sorted(set(range(n_parts)) - done)
    report: dict[str, Any] = {
        "partitions_total": n_parts,
        "partitions_skipped": sorted(done),
        "partitions_written": pending,
        "rows_written": 0,
        "wall_sec": 0.0,
    }
    if not pending:
        _append_history(out_dir, report)   # no-op resumes appear too (O6)
        return report

    # Checkpoint WAVES: partitions process in `cfg.checkpoint_waves`
    # sequential groups, each ending with its manifests stamped — so a
    # mid-job crash loses at most one wave, making the general path's
    # restartability real (one monolithic write would lose everything;
    # the aligned path already checkpoints per file). waves=1 keeps the
    # single-barrier topology for maximum throughput. Waves pay one extra
    # read + sort barrier each; extraction work is NOT repeated (the wave
    # filter runs before the extractor).
    waves = max(1, min(cfg.checkpoint_waves, len(pending)))
    wave_lists = [pending[i::waves] for i in range(waves)]
    report["checkpoint_waves"] = waves

    t0 = time.perf_counter()
    total_rows = 0
    for wave_parts in wave_lists:
        total_rows += _run_partition_wave(
            input_path, out_dir, wave_parts, cfg,
            fingerprint=fingerprint, cfg_hash=cfg_hash, n_parts=n_parts,
            filter_needed=bool(done) or waves > 1)
    wall = time.perf_counter() - t0

    report["rows_written"] = total_rows
    report["wall_sec"] = round(wall, 3)
    report["turns_per_sec"] = round(total_rows / wall, 2) if wall > 0 else None
    _append_history(out_dir, report)
    return report


def _run_partition_wave(input_path: str, out_dir: str, wave_parts: list[int],
                        cfg: PipelineConfig, *, fingerprint: str,
                        cfg_hash: str, n_parts: int,
                        filter_needed: bool) -> int:
    """Extract + write + stamp manifests for ONE group of partitions;
    returns rows written. Partition assignment depends only on conv_id, so
    the wave filter runs BEFORE the expensive extraction stage and no
    conversation is ever parsed twice across waves/resumes."""
    import shutil

    # Rewritten partitions are replaced, not appended to: clear their dirs
    # (including any half-written files from a crashed run) before writing.
    for part in wave_parts:
        pdir = mstate.partition_dir(out_dir, part)
        if os.path.isdir(pdir):
            shutil.rmtree(pdir, ignore_errors=True)

    t0 = time.perf_counter()
    wave_set = frozenset(wave_parts)
    ds = read_transcripts(input_path)
    if filter_needed:
        from raydoc.stages.extract import partition_of

        def _only_wave(t):
            import pyarrow as pa
            mask = pa.array(
                [partition_of(c, n_parts) in wave_set
                 for c in t.column("conv_id").to_pylist()], pa.bool_())
            return t.filter(mask)

        ds = ds.map_batches(_only_wave, batch_format="pyarrow")
    spill = None
    if cfg.exchange == "bucketed":
        # stable spill root + token: a rerun of the SAME wave over the
        # SAME input/config finds the finished exchange and skips
        # extraction entirely (crash-between-exchange-and-write resume);
        # cleanup happens only after the wave's manifests are stamped.
        import hashlib as _h
        import tempfile
        token = f"{fingerprint}:{cfg_hash}:w{','.join(map(str, wave_parts))}"
        spill = os.path.join(
            tempfile.gettempdir(),
            "raydoc_exchange_" + _h.blake2s(
                (os.path.abspath(out_dir) + token).encode(),
                digest_size=8).hexdigest())
        ds, _ = build_extraction_bucketed(ds, cfg, spill,
                                          resume_token=token)
    else:
        ds = build_extraction(ds, cfg)
    ds.write_parquet(out_dir, partition_cols=["part"])
    wall = time.perf_counter() - t0

    # Per-partition metrics from the (small) written columns → manifests.
    # Stamping reads 3 small columns per partition — IO-bound and
    # independent per partition, so it runs in a thread pool instead of
    # a serial driver loop (measured ~1-1.5 s serial at 32 partitions:
    # a FIXED per-job term that dilutes scaling efficiency).
    from concurrent.futures import ThreadPoolExecutor

    def _stamp(part: int) -> int:
        pdir = mstate.partition_dir(out_dir, part)
        if not os.path.isdir(pdir):
            # a pending partition that got NO rows (no conversation hashes
            # into it at this corpus size) is still complete — stamp an
            # empty manifest so resume doesn't re-run it forever. Only the
            # directory being absent qualifies: a transient read error below
            # must propagate so the partition stays pending for the retry.
            mstate.write_manifest(out_dir, part,
                                  input_fingerprint=fingerprint,
                                  config_hash=cfg_hash,
                                  metrics={"rows": 0, "conversations": 0,
                                           "parse_failures": 0,
                                           "mean_strip_ratio": 0.0,
                                           "wall_sec_job": round(wall, 3),
                                           "turns_per_sec_job": None})
            return 0
        t = pq.read_table(pdir, columns=["conv_id", "strip_ratio",
                                         "parse_failed"])
        rows = t.num_rows
        metrics = {
            "rows": rows,
            "conversations": len(pc.unique(t.column("conv_id"))),
            "parse_failures": pc.sum(pc.cast(t.column("parse_failed"),
                                             "int64")).as_py() or 0,
            "mean_strip_ratio": round(
                (pc.mean(t.column("strip_ratio")).as_py() or 0.0), 6),
            "wall_sec_job": round(wall, 3),
            "turns_per_sec_job": round(rows / wall, 2) if wall > 0 else None,
        }
        mstate.write_manifest(out_dir, part, input_fingerprint=fingerprint,
                              config_hash=cfg_hash, metrics=metrics)
        return rows

    with ThreadPoolExecutor(max_workers=8) as pool:
        total_rows = sum(pool.map(_stamp, wave_parts))
    if spill is not None:               # exchange checkpoint no longer
        shutil.rmtree(spill, ignore_errors=True)   # needed once stamped
    return total_rows


HISTORY_LIMIT = 10


def _append_history(out_dir: str, report: dict[str, Any]) -> None:
    """O6 usage-history sink (≙ the reference's session history keeping the
    last 10 entries, app.py history limit): append this job's report to
    ``_history.json`` in the output dir, capped at HISTORY_LIMIT entries.
    Atomic tmp+rename; best-effort (history must never fail a job)."""
    import json
    path = os.path.join(out_dir, "_history.json")
    try:
        try:
            with open(path) as fh:
                history = json.load(fh)
        except (OSError, ValueError):
            history = []
        history.append(report)
        history = history[-HISTORY_LIMIT:]
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(history, fh, indent=1, default=str)
        os.replace(tmp, path)
    except OSError:
        pass


def run_job_aligned(input_path: str, out_dir: str,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    resume: bool = True) -> dict[str, Any]:
    """Checkpointed shuffle-elision job (cfg.assume_conv_aligned).

    Topology: one fused extract+document actor task per INPUT FILE; each
    task writes exactly one output parquet (atomic tmp+rename) plus a
    file-granular lineage manifest with extraction metrics. No exchange, no
    hive fan-out (one output file per input file — no tiny-file explosion),
    and resume granularity = input file: a rerun processes only files whose
    manifest is missing or stale. The dataset flowing through Ray is the
    tiny metrics table, so the driver never touches row data.
    """
    from raydoc.stages.extract import FusedFileActor

    cfg_hash = mstate.config_fingerprint(cfg)
    files = list_parquet_files(input_path)
    # Output stems are relpaths from the input root so nested layouts like
    # a/part-0.parquet + b/part-0.parquet never collide on basename.
    input_root = input_path if os.path.isdir(input_path) else \
        os.path.dirname(input_path)
    pending_files = (mstate.pending_input_files(out_dir, files,
                                                config_hash=cfg_hash,
                                                input_root=input_root)
                     if resume else list(files))
    os.makedirs(out_dir, exist_ok=True)
    report: dict[str, Any] = {
        "mode": "aligned",
        "files_total": len(files),
        "files_skipped": len(files) - len(pending_files),
        "files_written": len(pending_files),
        "rows_written": 0,
        "wall_sec": 0.0,
    }
    if not pending_files:
        _append_history(out_dir, report)
        return report

    t0 = time.perf_counter()
    ds = rd.from_items([{"path": p} for p in pending_files])
    metrics = ds.map_batches(
        FusedFileActor,
        fn_constructor_kwargs={"cfg": cfg, "out_dir": out_dir,
                               "config_hash": cfg_hash,
                               "input_root": input_root},
        batch_format="pyarrow", batch_size=1,
        concurrency=cfg.extract_concurrency or _aligned_concurrency(),
        num_cpus=1,
    ).take_all()
    wall = time.perf_counter() - t0

    total_rows = sum(m["rows"] for m in metrics)
    report["rows_written"] = total_rows
    report["parse_failures"] = sum(m["parse_failures"] for m in metrics)
    failed = [m for m in metrics if m.get("error")]
    if failed:
        report["files_failed"] = len(failed)
        report["failures"] = [{"file": m["input_file"], "error": m["error"]}
                              for m in failed[:20]]
    report["wall_sec"] = round(wall, 3)
    report["turns_per_sec"] = round(total_rows / wall, 2) if wall > 0 else None
    _append_history(out_dir, report)
    return report
