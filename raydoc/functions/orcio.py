"""ORC interchange: shard sink + per-file fan-out source.

ORC is the other columnar interchange format a lakehouse neighbor hands
us (Hive/Trino ecosystems); Ray Data has no native reader, so both
directions are expressed Ray-Data-first with the repo's sink/source
disciplines (reference analog: the S2 input-dispatch surface,
SmolDocling-OCR main.py's walk-the-input-dir loop):

- ``export_orc`` mirrors ``export.export_jsonl``: each input BLOCK
  writes its own shard from the worker (atomic tmp+rename, rows never
  visit the driver), named by a content hash of the shard's ROWS (the
  Arrow IPC bytes of the slice — pyarrow's ORC encoder is deterministic
  in this env, but hashing the rows keeps shard names stable even if an
  encoder upgrade changes the container bytes), so reruns are
  idempotent and stale shards from a prior run are removed. A manifest
  (`_orc_manifest.json`) records exactly what the directory holds.
- ``read_orc`` mirrors the Feather source in
  ``pipelines/extract_pipeline.py``: the file list fans out via
  ``from_items`` and each task reads ONE file column-pruned
  (``ORCFile.read(columns=...)`` — only requested columns leave
  storage), giving per-file parallelism with no driver-side loop. At
  100 TB the unit of recovery/parallelism is the shard file, same as
  the parquet paths.

``orc_roundtrip_stats`` is the driver-checkable twin: events → ORC
shards → read back pruned → grouped integer-cent aggregate, oracled by
the same aggregate straight off the parquet view — a bit-exact
end-to-end proof of sink + source.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table


def export_orc(ds: rd.Dataset, out_dir: str,
               shard_rows: int = 250_000) -> pa.Table:
    """Write ``ds`` as content-addressed ORC shards under ``out_dir``.
    Returns the manifest table (shard, n_rows, n_bytes) sorted by shard
    and stamps it as ``_orc_manifest.json``. Oversized blocks split at
    ``shard_rows``; byte-identical blocks collapse to one shard file +
    one manifest row."""
    import pyarrow.orc as po

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        shards, nrows, nbytes = [], [], []
        for off in range(0, max(t.num_rows, 1), shard_rows):
            sub = t.slice(off, shard_rows)
            if sub.num_rows == 0:
                continue
            sub = sub.combine_chunks()
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema) as w:
                w.write_table(sub)
            digest = hashlib.sha256(
                sink.getvalue().to_pybytes()).hexdigest()[:16]
            name = f"part-{digest}.orc"
            path = os.path.join(out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            po.write_table(sub, tmp)
            size = os.path.getsize(tmp)
            os.replace(tmp, path)
            shards.append(name)
            nrows.append(sub.num_rows)
            nbytes.append(size)
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
        if name.endswith(".orc") and name not in current:
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    tmp = os.path.join(out_dir, "_orc_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest.to_pylist(), fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_orc_manifest.json"))
    return manifest


def read_orc(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """ORC corpus source: one read task per file, column-pruned at the
    file reader. ``path`` is a single .orc file or a directory tree."""
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".orc"))
    if not files:
        raise ValueError(f"no .orc files under {path!r}")

    def read_one(t: pa.Table) -> pa.Table:
        import pyarrow.orc as po
        tables = [po.ORCFile(p).read(columns=columns)
                  for p in t.column("path").to_pylist()]
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in files]).map_batches(
        read_one, batch_format="pyarrow", batch_size=1)


def orc_roundtrip_stats(sf_dir: str) -> pa.Table:
    """(event_type, n, sum_value_cents) computed off an ORC round-trip
    of the events table: export (event_type, value [, ts — pruned on
    read-back to prove the column push-down]) as ORC shards to scratch,
    read the shards back pruned to two columns, aggregate in integer
    cents. Oracle = the same aggregate over the parquet view, so any
    row lost/duplicated/corrupted by the sink or source flips the
    hash."""
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    src = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "value", "ts"])
    out = os.path.join(tempfile.gettempdir(),
                       f"raydoc_orc_{os.path.basename(sf_dir.rstrip('/'))}")
    export_orc(src, out)

    back = read_orc(out, columns=["event_type", "value"])

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
