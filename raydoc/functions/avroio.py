"""Avro Object Container File interchange: shard sink + fan-out source.

Avro OCF is the row-oriented interchange format the Kafka/Hadoop
ecosystem hands a lakehouse (reference analog: the S2 input-dispatch
surface, SmolDocling-OCR main.py's walk-the-input-dir loop). No Avro
library ships in this environment, so — exactly like the WARC codec in
``sources/warc.py`` — both directions implement the PUBLIC spec
(Apache Avro 1.11 specification, "Object Container Files" +  binary
encoding) dependency-free:

- container = ``Obj\\x01`` magic, a metadata map carrying the JSON
  schema and codec, a 16-byte sync marker, then data blocks of
  ``(row_count, byte_len, payload, sync)``;
- binary encoding = zigzag-varint longs, IEEE little-endian
  float/double, length-prefixed strings/bytes, 1-byte booleans, and
  nullable fields as the 2-branch union ``["null", T]`` (varint branch
  index before the value);
- codec ``deflate`` = raw RFC1951 (no zlib header), the spec's wording.

Sink/source follow the repo's interchange discipline (orcio.py):

- ``export_avro`` writes one content-addressed shard per input block
  from the worker (atomic tmp+rename; rows never visit the driver).
  The shard name AND the sync marker derive from a sha256 of the
  slice's Arrow IPC bytes, so shards are byte-deterministic and reruns
  are idempotent; stale shards from a prior run over different data
  are removed and ``_avro_manifest.json`` records the directory state.
- ``read_avro`` fans the file list out via ``from_items`` — one parse
  task per shard, no driver-side loop. Avro is a ROW format, so column
  pruning cannot skip disk bytes the way parquet/ORC do; instead the
  reader walks unrequested fields with skip-decoders (no Python object
  is materialized for them) and only requested columns leave the task.
  At 100 TB the unit of parallelism/recovery is the shard file.

``avro_roundtrip_stats`` is the driver-checkable twin: events → Avro
shards → read back pruned → grouped integer-cent aggregate, oracled by
the same aggregate straight off the parquet view.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- schema

def _avro_primitive(t: pa.DataType) -> object:
    """Arrow type → Avro schema fragment (primitives + the logical
    types the repo's tables use). Raises on anything unsupported so a
    schema gap fails loudly at the sink, not as a corrupt shard."""
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_timestamp(t) and t.unit == "us":
        return {"type": "long", "logicalType": "timestamp-micros"}
    raise ValueError(f"no Avro mapping for Arrow type {t}")


def _arrow_to_avro_schema(schema: pa.Schema, name: str) -> dict:
    fields = []
    for f in schema:
        avro_t = _avro_primitive(f.type)
        fields.append({"name": f.name, "type": ["null", avro_t]})
    return {"type": "record", "name": name, "fields": fields}


def _branch_arrow_type(avro_t: object) -> pa.DataType:
    if isinstance(avro_t, dict):
        if avro_t.get("logicalType") == "timestamp-micros":
            return pa.timestamp("us")
        avro_t = avro_t["type"]
    return {
        "long": pa.int64(), "int": pa.int32(), "double": pa.float64(),
        "float": pa.float32(), "string": pa.string(),
        "bytes": pa.binary(), "boolean": pa.bool_(),
    }[avro_t]


# ---------------------------------------------------------- primitives

def _enc_long(v: int) -> bytes:
    """Zigzag varint (Avro int/long share this encoding)."""
    v = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _skip_long(buf: bytes, pos: int) -> int:
    while buf[pos] & 0x80:
        pos += 1
    return pos + 1


# Per-branch cell encoders: value -> bytes (value is non-null).
_D = struct.Struct("<d")
_F = struct.Struct("<f")


def _cell_encoder(avro_t: object):
    if isinstance(avro_t, dict):
        avro_t = avro_t["type"]
    if avro_t in ("long", "int"):
        return _enc_long
    if avro_t == "double":
        return _D.pack
    if avro_t == "float":
        return _F.pack
    if avro_t == "string":
        return lambda v: (lambda b: _enc_long(len(b)) + b)(v.encode("utf-8"))
    if avro_t == "bytes":
        return lambda v: _enc_long(len(v)) + v
    if avro_t == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported Avro type {avro_t!r}")


def _cell_decoder(avro_t: object):
    """Returns (decode, skip): decode(buf, pos) -> (value, pos);
    skip(buf, pos) -> pos without materializing a Python value."""
    logical_ts = isinstance(avro_t, dict) \
        and avro_t.get("logicalType") == "timestamp-micros"
    if isinstance(avro_t, dict):
        avro_t = avro_t["type"]
    if avro_t in ("long", "int") or logical_ts:
        return _dec_long, _skip_long
    if avro_t == "double":
        def dec_d(buf, pos):
            return _D.unpack_from(buf, pos)[0], pos + 8
        return dec_d, lambda buf, pos: pos + 8
    if avro_t == "float":
        def dec_f(buf, pos):
            return _F.unpack_from(buf, pos)[0], pos + 4
        return dec_f, lambda buf, pos: pos + 4
    if avro_t in ("string", "bytes"):
        is_str = avro_t == "string"

        def dec_s(buf, pos, _is_str=is_str):
            n, pos = _dec_long(buf, pos)
            raw = bytes(buf[pos:pos + n])
            return (raw.decode("utf-8") if _is_str else raw), pos + n

        def skip_s(buf, pos):
            n, pos = _dec_long(buf, pos)
            return pos + n
        return dec_s, skip_s
    if avro_t == "boolean":
        def dec_b(buf, pos):
            return buf[pos] == 1, pos + 1
        return dec_b, lambda buf, pos: pos + 1
    raise ValueError(f"unsupported Avro type {avro_t!r}")


# ----------------------------------------------------------------- sink

def _encode_rows(t: pa.Table, avro_fields: list[dict]) -> bytes:
    """Binary-encode a table's rows (each field a ["null", T] union:
    branch varint then the value). Cells pre-encode per column, then
    one join interleaves them row-major — the Python loop is the
    unavoidable row-format serialization cost, same as the CSV sink."""
    per_col: list[list[bytes]] = []
    for f in avro_fields:
        enc = _cell_encoder(f["type"][1])
        col = t.column(f["name"])
        if isinstance(f["type"][1], dict):  # timestamp-micros rides a long
            col = col.cast(pa.int64())
        per_col.append([
            b"\x00" if v is None else b"\x02" + enc(v)
            for v in col.to_pylist()])
    return b"".join(b"".join(cells) for cells in zip(*per_col))


def export_avro(ds: rd.Dataset, out_dir: str, shard_rows: int = 250_000,
                codec: str = "deflate") -> pa.Table:
    """Write ``ds`` as content-addressed Avro OCF shards under
    ``out_dir``. Returns the manifest table (shard, n_rows, n_bytes)
    sorted by shard and stamps it as ``_avro_manifest.json``."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        shards, nrows, nbytes = [], [], []
        if t.num_rows:
            avro_schema = _arrow_to_avro_schema(t.schema, "raydoc_row")
            schema_json = json.dumps(
                avro_schema, separators=(",", ":"), sort_keys=True)
        for off in range(0, max(t.num_rows, 1), shard_rows):
            sub = t.slice(off, shard_rows)
            if sub.num_rows == 0:
                continue
            sub = sub.combine_chunks()
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema) as w:
                w.write_table(sub)
            digest = hashlib.sha256(sink.getvalue().to_pybytes()).digest()
            sync = digest[:16]
            name = f"part-{digest.hex()[:16]}.avro"

            payload = _encode_rows(sub, avro_schema["fields"])
            if codec == "deflate":
                comp = zlib.compressobj(9, zlib.DEFLATED, -15)
                payload = comp.compress(payload) + comp.flush()

            header = bytearray(MAGIC)
            meta = {"avro.schema": schema_json.encode(),
                    "avro.codec": codec.encode()}
            header += _enc_long(len(meta))
            for k in sorted(meta):
                kb = k.encode()
                header += _enc_long(len(kb)) + kb
                header += _enc_long(len(meta[k])) + meta[k]
            header += _enc_long(0)
            header += sync

            blob = bytes(header) + _enc_long(sub.num_rows) \
                + _enc_long(len(payload)) + payload + sync
            path = os.path.join(out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
            shards.append(name)
            nrows.append(sub.num_rows)
            nbytes.append(len(blob))
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
        if name.endswith(".avro") and name not in current:
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    tmp = os.path.join(out_dir, "_avro_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest.to_pylist(), fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_avro_manifest.json"))
    return manifest


# --------------------------------------------------------------- source

def _parse_container(blob: bytes,
                     columns: list[str] | None) -> pa.Table:
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _dec_long(blob, pos)
        if n == 0:
            break
        if n < 0:  # negative count: a byte size precedes the entries
            _, pos = _dec_long(blob, pos)
            n = -n
        for _ in range(n):
            klen, pos = _dec_long(blob, pos)
            key = blob[pos:pos + klen].decode()
            pos += klen
            vlen, pos = _dec_long(blob, pos)
            meta[key] = blob[pos:pos + vlen]
            pos += vlen
    sync = blob[pos:pos + 16]
    pos += 16

    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    fields = schema["fields"]
    for f in fields:
        tp = f["type"]
        if not (isinstance(tp, list) and len(tp) == 2 and tp[0] == "null"):
            raise ValueError(
                f"field {f['name']!r}: only [null, T] unions supported")

    schema_names = [f["name"] for f in fields]
    keep = set(schema_names) if columns is None else set(columns)
    missing = keep - set(schema_names)
    if missing:
        raise ValueError(f"columns not in Avro schema: {sorted(missing)}")
    plan = []  # (name, decode-or-None, skip, out-list-or-None)
    out_cols: dict[str, list] = {}
    for f in fields:
        dec, skip = _cell_decoder(f["type"][1])
        if f["name"] in keep:
            out_cols[f["name"]] = []
            plan.append((dec, skip, out_cols[f["name"]]))
        else:
            plan.append((None, skip, None))

    while pos < len(blob):
        count, pos = _dec_long(blob, pos)
        size, pos = _dec_long(blob, pos)
        data = blob[pos:pos + size]
        pos += size
        if blob[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (torn Avro block)")
        pos += 16
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        dp = 0
        for _ in range(count):
            for dec, skip, out in plan:
                branch = data[dp]
                dp += 1
                if branch == 0:          # null (branch varint 0)
                    if out is not None:
                        out.append(None)
                elif out is None:
                    dp = skip(data, dp)
                else:
                    v, dp = dec(data, dp)
                    out.append(v)

    names = [f["name"] for f in fields if f["name"] in keep]
    types = {f["name"]: _branch_arrow_type(f["type"][1]) for f in fields}
    return pa.table(
        {n: pa.array(out_cols[n], types[n]) for n in names})


def read_avro(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Avro corpus source: one parse task per file. ``path`` is a
    single .avro file or a directory tree. Unrequested fields are
    skip-decoded (cursor advance only — see module docstring)."""
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".avro"))
    if not files:
        raise ValueError(f"no .avro files under {path!r}")

    def read_one(t: pa.Table) -> pa.Table:
        tables = []
        for p in t.column("path").to_pylist():
            with open(p, "rb") as fh:
                tables.append(_parse_container(fh.read(), columns))
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        read_one, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------- query

def avro_roundtrip_stats(sf_dir: str) -> pa.Table:
    """(event_type, n, sum_value_cents) computed off an Avro round-trip
    of the events table: export (event_type, value, ts) as deflate OCF
    shards to scratch, read back pruned to two columns (ts is
    skip-decoded — proving the prune path), aggregate in integer cents.
    Oracle = the same aggregate over the parquet view, so any row the
    sink or source loses, duplicates, or alters flips the hash."""
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    src = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "value", "ts"])
    out = os.path.join(tempfile.gettempdir(),
                       f"raydoc_avro_{os.path.basename(sf_dir.rstrip('/'))}")
    export_avro(src, out)

    back = read_avro(out, columns=["event_type", "value"])

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
