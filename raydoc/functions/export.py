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


def export_csv(ds: rd.Dataset, out_dir: str,
               shard_rows: int = 100_000) -> "pa.Table":
    """CSV shard sink with the repo's content-addressed discipline:
    each input block writes its own ``.csv`` shard from the worker
    (atomic tmp+rename; rows never visit the driver), named by a
    sha256 of the shard's bytes — reruns are idempotent and a killed
    run leaves no torn shard. Stale shards from a previous run over
    different data are removed; the manifest (shard, n_rows, n_bytes)
    is returned sorted and stamped as ``_csv_manifest.json``.

    Serialization is the stdlib ``csv`` module (QUOTE_MINIMAL,
    ``\\n`` line ends, one header row per shard) over ``str()`` of
    each cell — byte-deterministic; ints round-trip exactly and
    floats use shortest-repr so pyarrow's CSV parser recovers the
    exact double. Embedded newlines/quotes/commas in text survive
    via standard CSV quoting (read back with
    ``ParseOptions(newlines_in_values=True)``)."""
    import csv as _csv
    import hashlib
    import io

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        shards, nrows, nbytes = [], [], []
        names = t.schema.names
        for off in range(0, max(t.num_rows, 1), shard_rows):
            sub = t.slice(off, shard_rows)
            if sub.num_rows == 0:
                continue
            buf = io.StringIO()
            w = _csv.writer(buf, quoting=_csv.QUOTE_MINIMAL,
                            lineterminator="\n")
            w.writerow(names)
            cols = [sub.column(c).to_pylist() for c in names]
            for row in zip(*cols):
                w.writerow(["" if v is None else str(v) for v in row])
            payload = buf.getvalue().encode()
            name = ("part-"
                    + hashlib.sha256(payload).hexdigest()[:16] + ".csv")
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
    manifest = manifest.group_by(["shard"], use_threads=False).aggregate(
        [("n_rows", "max"), ("n_bytes", "max")]).rename_columns(
        ["shard", "n_rows", "n_bytes"]).sort_by("shard")
    current = set(manifest.column("shard").to_pylist())
    for name in os.listdir(out_dir):
        if name.endswith(".csv") and name not in current:
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    import json as _json
    tmp = os.path.join(out_dir, "_csv_manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest.to_pylist(), fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_csv_manifest.json"))
    return manifest


def csv_roundtrip_stats(sf_dir: str) -> "pa.Table":
    """(source, n_docs, sum_chars, checksum) computed off a CSV
    round-trip of the documents table: export (doc_id, text, source)
    as CSV shards to scratch, read them back with Ray's native CSV
    reader (quoted embedded newlines enabled, explicit column types —
    text columns full of commas/quotes/newlines are the stress case),
    and aggregate per source with the orders_checksum limb discipline:
    checksum = Σ md5₆₄("doc_id|text") mod 2⁶⁴. Oracle = the same
    aggregate straight off the parquet view — any row the sink or
    source loses, duplicates, or alters flips the hash."""
    import tempfile

    import pyarrow.compute as pc
    from pyarrow import csv as pacsv

    from raydoc.functions.agg import partial_groupby

    src = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text", "source"])
    out = os.path.join(tempfile.gettempdir(),
                       f"raydoc_csv_{os.path.basename(sf_dir.rstrip('/'))}")
    export_csv(src, out)

    back = rd.read_csv(
        out, file_extensions=["csv"],
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={"doc_id": pa.int64(), "text": pa.string(),
                          "source": pa.string()},
            strings_can_be_null=False))

    def partial(t: pa.Table) -> pa.Table:
        per: dict[str, list[int]] = {}
        for d, x, s0 in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist(),
                            t.column("source").to_pylist()):
            x = x or ""
            h = int(hashlib.md5(
                f"{d}|{x}".encode("utf-8")).hexdigest()[:16], 16)
            s = per.setdefault(s0, [0, 0, 0, 0, 0, 0])
            s[0] += 1
            s[1] += len(x)
            for i in range(4):
                s[2 + i] += (h >> (16 * i)) & 0xFFFF
        hosts = sorted(per)
        cols = {"source": pa.array(hosts, pa.string()),
                "n": pa.array([per[k][0] for k in hosts], pa.int64()),
                "nc": pa.array([per[k][1] for k in hosts], pa.int64())}
        for i in range(4):
            cols[f"s{i}"] = pa.array([per[k][2 + i] for k in hosts],
                                     pa.int64())
        return pa.table(cols)

    spec = {"n_docs": ("n", "sum"), "sum_chars": ("nc", "sum")}
    for i in range(4):
        spec[f"s{i}"] = (f"s{i}", "sum")
    g = collect_table(partial_groupby(
        back.map_batches(partial, batch_format="pyarrow"), ["source"],
        spec)).sort_by("source")
    sums = [(int(a) + (int(b) << 16) + (int(c) << 32) + (int(d) << 48))
            % (1 << 64)
            for a, b, c, d in zip(g.column("s0").to_pylist(),
                                  g.column("s1").to_pylist(),
                                  g.column("s2").to_pylist(),
                                  g.column("s3").to_pylist())]
    return pa.table({
        "source": g.column("source"),
        "n_docs": pc.cast(g.column("n_docs"), pa.int64()),
        "sum_chars": pc.cast(g.column("sum_chars"), pa.int64()),
        "checksum": pa.array([format(v, "016x") for v in sums],
                             pa.string())})
