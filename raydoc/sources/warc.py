"""WARC interchange: crawl-archive sink + per-file fan-out source.

WARC (ISO 28500) is the native input format of web-scale text
pipelines — Common Crawl ships response records with an HTTP envelope,
one gzip member per record. This module implements both directions
dependency-free (the format is line-oriented headers + Content-Length
framing), with the repo's sink/source disciplines (reference analog:
the S2 input-dispatch surface, SmolDocling-OCR main.py's
walk-the-input-dir loop; same shape as ``functions/orcio.py``):

- ``export_warc`` mirrors ``export_orc``: each input BLOCK writes its
  own shard from the worker (atomic tmp+rename, rows never visit the
  driver), named by a content hash of the shard's uncompressed record
  bytes so reruns are idempotent and stale shards are removed; each
  record is its own gzip member (mtime=0 ⇒ byte-deterministic output),
  the Common Crawl convention that lets a reader split members without
  decompressing the whole file. A ``_warc_manifest.json`` records what
  the directory holds.
- ``read_warc`` fans the file list out via ``from_items`` — one parse
  task per shard, no driver-side loop. Parsing is a per-record byte
  scan (inherent to a framed byte format, same as the media codecs);
  the unit of parallelism and recovery at 100 TB is the shard file.
  A malformed record stops that file's parse at the last good record
  (fail-soft, like the per-row codec discipline in multimodal.py).

``warc_roundtrip_stats`` is the driver-checkable twin: documents →
WARC response records → read back → per-source counts + an
order-independent md5 content checksum, oracled by the same aggregate
straight off the parquet view — bit-exact end-to-end proof that the
sink and source lose/alter nothing (URL, payload bytes, grouping).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table

_FIXED_DATE = "2020-01-01T00:00:00Z"  # no wall clock anywhere (FIXTURES.md §4)


def _record_bytes(url: str, body: bytes, date: str = _FIXED_DATE,
                  mime: str = "text/html; charset=utf-8") -> bytes:
    """One WARC/1.0 response record with an HTTP/1.1 envelope.
    Record-ID is content-derived (md5 of url+body) — deterministic."""
    http = (f"HTTP/1.1 200 OK\r\nContent-Type: {mime}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii") + body
    rid = hashlib.md5(url.encode("utf-8") + b"\x00" + body).hexdigest()
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: response\r\n"
           f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
           f"WARC-Date: {date}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
    return hdr + http + b"\r\n\r\n"


def export_warc(ds: rd.Dataset, out_dir: str, url_col: str = "url",
                text_col: str = "text", shard_records: int = 50_000,
                gz: bool = True) -> pa.Table:
    """Write ``ds`` as content-addressed WARC shards under ``out_dir``.
    One response record per row (``url_col`` → WARC-Target-URI,
    ``text_col`` utf-8 encoded → HTTP body). Returns the manifest table
    (shard, n_records, n_bytes) and stamps ``_warc_manifest.json``."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gz else ".warc"

    def write_block(t: pa.Table) -> pa.Table:
        shards, nrecs, nbytes = [], [], []
        for off in range(0, max(t.num_rows, 1), shard_records):
            sub = t.slice(off, shard_records)
            if sub.num_rows == 0:
                continue
            urls = sub.column(url_col).to_pylist()
            texts = sub.column(text_col).to_pylist()
            recs = [_record_bytes(u or "", (x or "").encode("utf-8"))
                    for u, x in zip(urls, texts)]
            raw = b"".join(recs)
            digest = hashlib.sha256(raw).hexdigest()[:16]
            name = f"part-{digest}{ext}"
            path = os.path.join(out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            if gz:
                # one gzip member per record (Common Crawl convention);
                # mtime=0 keeps the compressed bytes deterministic
                data = b"".join(
                    gzip.compress(r, compresslevel=6, mtime=0)
                    for r in recs)
            else:
                data = raw
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
            shards.append(name)
            nrecs.append(sub.num_rows)
            nbytes.append(len(data))
        return pa.table({"shard": pa.array(shards, pa.string()),
                         "n_records": pa.array(nrecs, pa.int64()),
                         "n_bytes": pa.array(nbytes, pa.int64())})

    manifest = collect_table(
        ds.map_batches(write_block, batch_format="pyarrow")).sort_by("shard")
    manifest = manifest.group_by(["shard"], use_threads=False).aggregate(
        [("n_records", "max"), ("n_bytes", "max")]).rename_columns(
        ["shard", "n_records", "n_bytes"]).sort_by("shard")
    current = set(manifest.column("shard").to_pylist())
    for name in os.listdir(out_dir):
        if (name.endswith(".warc") or name.endswith(".warc.gz")) \
                and name not in current:
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    tmp = os.path.join(out_dir, "_warc_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest.to_pylist(), fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_warc_manifest.json"))
    return manifest


def _parse_warc(data: bytes, record_types: tuple[str, ...],
                warc_file: str) -> pa.Table:
    """Scan one decompressed WARC byte stream into rows. Stops at the
    first malformed record (fail-soft): everything before it survives."""
    urls, dates, rtypes, statuses, ctypes, texts = [], [], [], [], [], []
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode(
                "utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            break
        body = data[hdr_end + 4:hdr_end + 4 + clen]
        if len(body) < clen:
            break
        pos = hdr_end + 4 + clen
        rtype = headers.get("warc-type", "")
        if rtype not in record_types:
            continue
        status, ctype = 0, ""
        payload = body
        if headers.get("content-type", "").startswith("application/http"):
            env_end = body.find(b"\r\n\r\n")
            if env_end >= 0:
                env_lines = body[:env_end].decode(
                    "utf-8", "replace").split("\r\n")
                parts = env_lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in env_lines[1:]:
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "content-type":
                        ctype = v.strip()
                payload = body[env_end + 4:]
        urls.append(headers.get("warc-target-uri", ""))
        dates.append(headers.get("warc-date", ""))
        rtypes.append(rtype)
        statuses.append(status)
        ctypes.append(ctype)
        texts.append(payload.decode("utf-8", "replace"))
    return pa.table({
        "warc_file": pa.array([warc_file] * len(urls), pa.string()),
        "record_type": pa.array(rtypes, pa.string()),
        "url": pa.array(urls, pa.string()),
        "warc_date": pa.array(dates, pa.string()),
        "http_status": pa.array(statuses, pa.int32()),
        "content_type": pa.array(ctypes, pa.string()),
        "text": pa.array(texts, pa.large_string()),
    })


def read_warc(path: str,
              record_types: tuple[str, ...] = ("response",)) -> rd.Dataset:
    """WARC corpus source: one parse task per shard file. ``path`` is a
    single .warc[.gz] file or a directory tree. gzip members concatenate,
    so a multi-member shard decompresses in one stdlib call.

    Memory note: each task holds ONE decompressed shard (export_warc
    bounds shards at ``shard_records``; Common Crawl shards are ~1 GiB
    compressed). Corpora with multi-GiB individual shards should be
    re-sharded first — the unit of parallelism AND of worker memory is
    the shard file."""
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".warc") or f.endswith(".warc.gz"))
    if not files:
        raise ValueError(f"no .warc[.gz] files under {path!r}")

    def parse_one(t: pa.Table) -> pa.Table:
        tables = []
        for p in t.column("path").to_pylist():
            with open(p, "rb") as fh:
                data = fh.read()
            if p.endswith(".gz"):
                data = gzip.decompress(data)
            tables.append(_parse_warc(data, record_types,
                                      os.path.basename(p)))
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        parse_one, batch_format="pyarrow", batch_size=1)


def warc_roundtrip_stats(sf_dir: str) -> pa.Table:
    """(source, n_docs, sum_chars, checksum) computed off a WARC
    round-trip of the documents table: synthesize one crawl URL per doc
    (``http://<source>/doc/<doc_id>``), export response records as
    gzipped WARC shards to scratch, read them back, group by the source
    host recovered FROM THE URL. checksum = Σ md5₆₄("url|text") mod 2⁶⁴
    carried as four 16-bit limb sums (int64-safe to ~1.4·10¹⁴ rows, the
    orders_checksum discipline). Oracle = the same aggregate straight
    off the parquet view — any record the sink or source loses,
    duplicates, or alters (URL or payload bytes) flips the hash."""
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    src = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text", "source"])

    def add_url(t: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            pa.scalar("http://"), t["source"], pa.scalar("/doc/"),
            pc.cast(t["doc_id"], pa.string()), pa.scalar(""))
        return pa.table({"url": url, "text": t["text"]})

    out = os.path.join(tempfile.gettempdir(),
                       f"raydoc_warc_{os.path.basename(sf_dir.rstrip('/'))}")
    export_warc(src.map_batches(add_url, batch_format="pyarrow"), out)

    back = read_warc(out)

    def partial(t: pa.Table) -> pa.Table:
        per: dict[str, list[int]] = {}
        for u, x in zip(t.column("url").to_pylist(),
                        t.column("text").to_pylist()):
            host = u[len("http://"):].split("/", 1)[0]
            h = int(hashlib.md5(
                f"{u}|{x}".encode("utf-8")).hexdigest()[:16], 16)
            s = per.setdefault(host, [0, 0, 0, 0, 0, 0])
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
