"""K4 DOCX export over the documents table.

Sink shape: one .docx per document, written inside ``map_batches`` tasks
(atomic tmp+rename — the same sink discipline as the aligned extraction
path); the dataset flowing back to the driver is a tiny per-batch metrics
table. ``docx_meta`` is the deterministic query twin (byte length + sha256
of the generated docx per doc — stable because the writer is
byte-deterministic)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table


def docx_meta(sf_dir: str) -> pa.Table:
    """(doc_id, n_bytes, sha256) of the K4 docx rendering of each doc."""
    from raydoc.kernels.docx import markdown_to_docx_bytes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        sizes, hashes = [], []
        for v in t.column("text").to_pylist():
            b = markdown_to_docx_bytes(v or "")
            sizes.append(len(b))
            hashes.append(hashlib.sha256(b).hexdigest())
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bytes": pa.array(sizes, pa.int64()),
                         "sha256": pa.array(hashes, pa.string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def export_docx(sf_dir: str, out_dir: str) -> int:
    """Write one .docx per document under ``out_dir``; returns the number
    of files written. Files are written by the workers (atomic tmp+rename),
    not shipped to the driver."""
    from raydoc.kernels.docx import markdown_to_docx_bytes

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    from raydoc.kernels.docx import sanitize_filename

    def fn(t: pa.Table) -> pa.Table:
        n = 0
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            data = markdown_to_docx_bytes(text or "")
            path = os.path.join(out_dir,
                                f"doc-{sanitize_filename(str(doc_id))}.docx")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
            n += 1
        return pa.table({"files": pa.array([n], pa.int64())})

    counts = collect_table(ds.map_batches(fn, batch_format="pyarrow"))
    import pyarrow.compute as pc
    return pc.sum(counts.column("files")).as_py() or 0


def export_jsonl(ds: rd.Dataset, out_dir: str,
                 shard_rows: int = 100_000, gz: bool = False) -> "pa.Table":
    """JSONL shard sink — the interchange format most LLM training
    stacks consume. Each input BLOCK writes its own shard from the
    worker (atomic tmp+rename; rows never visit the driver), named by
    a content hash of the shard's bytes, so reruns are idempotent
    (same data ⇒ same filename, replaced in place) and a killed run
    leaves no torn shard — the manifest-discipline of the parquet
    sinks applied to JSONL. Oversized blocks split at ``shard_rows``.
    Returns the manifest (shard, n_rows, n_bytes) sorted by shard, and
    stamps it as ``_jsonl_manifest.json`` for resume checks. Shards in
    ``out_dir`` that this run did not produce are removed (a rerun over
    changed data must not leave the previous run's shards mixed in),
    and byte-identical blocks collapse to ONE shard file + ONE manifest
    row — content-addressed storage semantics: the manifest always
    describes exactly what the directory holds.

    Lines are ``json.dumps(..., sort_keys=True, ensure_ascii=False)``
    of each row dict — byte-deterministic for a given row, so shard
    content hashes are stable across runs and cluster sizes.

    ``gz=True`` writes ``.jsonl.gz`` shards (stdlib gzip, ``mtime=0``
    so the compressed bytes stay deterministic) — the interchange
    format web-scale text corpora actually ship in; shard names hash
    the UNCOMPRESSED payload, so gz and plain runs of the same data
    agree on shard identity."""
    import gzip
    import hashlib
    import json

    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if gz else ".jsonl"

    def write_block(t: pa.Table) -> pa.Table:
        shards, nrows, nbytes = [], [], []
        for off in range(0, max(t.num_rows, 1), shard_rows):
            sub = t.slice(off, shard_rows)
            if sub.num_rows == 0:
                continue
            payload = "".join(
                json.dumps(r, sort_keys=True, ensure_ascii=False,
                           default=str) + "\n"
                for r in sub.to_pylist()).encode()
            name = ("part-"
                    + hashlib.sha256(payload).hexdigest()[:16] + ext)
            if gz:
                payload = gzip.compress(payload, compresslevel=6, mtime=0)
            path = os.path.join(out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.replace(tmp, path)
            shards.append(name)
            nrows.append(sub.num_rows)
            nbytes.append(len(payload))
        return pa.table({"shard": pa.array(shards, pa.string()),
                         "n_rows": pa.array(nrows, pa.int64()),
                         "n_bytes": pa.array(nbytes, pa.int64())})

    manifest = collect_table(
        ds.map_batches(write_block, batch_format="pyarrow")).sort_by("shard")
    # identical blocks hash to the same shard file — keep one manifest
    # row per file so totals match the directory contents
    manifest = manifest.group_by(["shard"], use_threads=False).aggregate(
        [("n_rows", "max"), ("n_bytes", "max")]).rename_columns(
        ["shard", "n_rows", "n_bytes"]).sort_by("shard")
    # drop stale shards from a previous run over different data
    current = set(manifest.column("shard").to_pylist())
    for name in os.listdir(out_dir):
        if (name.endswith(".jsonl") or name.endswith(".jsonl.gz")) \
                and name not in current:
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    import json as _json
    tmp = os.path.join(out_dir, "_jsonl_manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest.to_pylist(), fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_jsonl_manifest.json"))
    return manifest


def jsonl_export_meta(sf_dir: str) -> "pa.Table":
    """(shard, n_rows, n_bytes): manifest of exporting the documents
    table as JSONL shards to scratch — the sink's driver-checkable
    evidence row (byte-deterministic shard hashes ⇒ stable output)."""
    import tempfile

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    out = os.path.join(tempfile.gettempdir(),
                       f"raydoc_jsonl_{os.path.basename(sf_dir.rstrip('/'))}")
    return export_jsonl(ds, out)


def jsonl_gz_roundtrip_stats(sf_dir: str) -> "pa.Table":
    """(event_type, n, sum_value_cents) computed off a gzipped-JSONL
    round-trip of the events table: export (event_type, value) as
    ``.jsonl.gz`` shards to scratch, read them back with Ray's native
    JSON reader (decompresses by extension, one task per file), and
    aggregate in integer cents. Oracle = the same aggregate straight
    off the parquet view — bit-exact proof of the compressed sink +
    source (doubles survive json repr round-trip exactly)."""
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    src = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "value"])
    out = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_jsonlgz_{os.path.basename(sf_dir.rstrip('/'))}")
    export_jsonl(src, out, gz=True)

    back = rd.read_json(out, file_extensions=["gz"])

    def to_cents(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "v_c": pa.array([], pa.int64())})
        return pa.table({
            "event_type": t["event_type"],
            "v_c": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                           pa.int64())})

    agg = partial_groupby(back.map_batches(to_cents,
                                           batch_format="pyarrow"),
                          ["event_type"],
                          {"n": ("v_c", "count"),
                           "sum_value_cents": ("v_c", "sum")})
    return collect_table(agg).sort_by("event_type")
