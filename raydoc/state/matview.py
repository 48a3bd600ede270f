"""Incremental materialized aggregate over a table-log table — the
Delta-Live-Tables / streaming-rollup pattern that closes the continuous
ingestion loop (stream_ingest lands shards → refresh folds ONLY what's
new into a persistent per-group aggregate).

State layout under ``view_dir``: ``state.json`` (the table version and
live-shard set the view reflects) + ``partials/`` (a parquet directory
of per-group partial rows — group cols, per-sum-col sums, count). A
refresh:

- reads the table head's live-file set and diffs it against the state:
  * only NEW files (live ⊇ processed) → INCREMENTAL: stream just the
    new shards through the combiner, union with the stored partials,
    fold once, swap — O(new data + |groups|), never the whole table;
  * any processed file GONE from the live set (delete_where/optimize/
    overwrite rewrote history) → REBUILD from the head snapshot (the
    honest fallback: partials can't subtract rewritten shards);
- writes the new partials DISTRIBUTED (write_parquet to a staging dir,
  atomic swap), so no group list ever lands on the driver;
- records the version + live set it folded, so refresh is idempotent
  (re-running at the same head is a no-op).

Crash safety: staging + rename, state.json written last — a crash
mid-refresh leaves the previous consistent view.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import pyarrow as pa

import ray.data as rd

from raydoc.state import table_log


def _state_path(view_dir: str) -> str:
    return os.path.join(view_dir, "state.json")


def _partials_dir(view_dir: str) -> str:
    return os.path.join(view_dir, "partials")


def refresh_matview(table_dir: str, view_dir: str,
                    group_cols: list[str], sum_cols: list[str]
                    ) -> dict[str, Any]:
    """Bring the materialized per-``group_cols`` aggregate (count +
    sum of each ``sum_cols``) up to the table head. Returns a report
    {mode, version, new_files, groups}."""
    from raydoc.functions.agg import partial_groupby

    head = table_log.latest_version(table_dir)
    if head is None:
        raise ValueError(f"{table_dir!r} has no table log")
    snap = table_log.snapshot(table_dir, head)
    live = set(snap["files"])

    state: dict[str, Any] = {"version": -1, "files": []}
    if os.path.exists(_state_path(view_dir)):
        with open(_state_path(view_dir)) as fh:
            state = json.load(fh)
    processed = set(state["files"])

    if processed == live:
        n_groups = state.get("groups", 0)
        return {"mode": "noop", "version": head, "new_files": 0,
                "groups": n_groups}

    spec = {"n_rows": (group_cols[0], "count")}
    for c in sum_cols:
        spec[f"sum_{c}"] = (c, "sum")

    def read_shards(files: list[str]) -> rd.Dataset:
        if not files:       # fully-emptied table (e.g. delete-all)
            empty = {c: pa.array([], pa.string()) for c in group_cols}
            empty |= {c: pa.array([], pa.int64()) for c in sum_cols}
            return rd.from_arrow(pa.table(empty))
        return rd.read_parquet([os.path.join(table_dir, n)
                                for n in sorted(files)],
                               columns=group_cols + sum_cols)

    if processed <= live:
        mode = "incremental"
        new_files = sorted(live - processed)
        new_part = partial_groupby(read_shards(new_files), group_cols,
                                   spec)
        if processed:
            old = rd.read_parquet(_partials_dir(view_dir))
            merge_spec = {"n_rows": ("n_rows", "sum")}
            for c in sum_cols:
                merge_spec[f"sum_{c}"] = (f"sum_{c}", "sum")
            merged = partial_groupby(new_part.union(old), group_cols,
                                     merge_spec)
        else:
            merged = new_part
    else:
        mode = "rebuild"
        new_files = sorted(live)
        merged = partial_groupby(read_shards(new_files), group_cols, spec)

    staging = _partials_dir(view_dir) + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    merged.write_parquet(staging)
    import glob

    import pyarrow.parquet as pq
    groups = sum(pq.ParquetFile(f).metadata.num_rows
                 for f in glob.glob(os.path.join(staging, "*.parquet")))
    shutil.rmtree(_partials_dir(view_dir), ignore_errors=True)
    os.replace(staging, _partials_dir(view_dir))
    with open(_state_path(view_dir) + ".tmp", "w") as fh:
        json.dump({"version": head, "files": sorted(live),
                   "groups": groups, "group_cols": group_cols,
                   "sum_cols": sum_cols}, fh)
    os.replace(_state_path(view_dir) + ".tmp", _state_path(view_dir))
    return {"mode": mode, "version": head,
            "new_files": len(new_files), "groups": groups}


def read_matview(view_dir: str) -> rd.Dataset:
    """Stream the materialized aggregate (group cols, n_rows, sum_*)."""
    return rd.read_parquet(_partials_dir(view_dir))


def events_matview(sf_dir: str) -> pa.Table:
    """(event_type, n_rows, sum_cents): the incremental-maintenance
    loop proven end-to-end at the driver — events land in a table log
    as TWO appends with a refresh after each (the second refresh must
    fold ONLY the second append's shards), then a delete_where forces
    the rebuild path; the final view is read back and compared by the
    oracle against a straight SQL aggregate with the same delete
    applied. Scratch table + view in /tmp per run."""
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table

    base = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_mv_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(base, ignore_errors=True)
    tdir, vdir = os.path.join(base, "t"), os.path.join(base, "v")

    src = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_id", "event_type", "value"])

    def prep(half):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "event_id" not in t.schema.names:
                return pa.table({"event_id": pa.array([], pa.int64()),
                                 "event_type": pa.array([], pa.string()),
                                 "cents": pa.array([], pa.int64())})
            keep = pc.equal(pc.bit_wise_and(t["event_id"], 1),
                            pa.scalar(half, pa.int64()))
            t = t.filter(keep)
            return pa.table({
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                                 pa.int64())})
        return fn

    table_log.append(src.map_batches(prep(0), batch_format="pyarrow"),
                     tdir, shard_rows=20_000, stats_cols=["event_id"])
    r1 = refresh_matview(tdir, vdir, ["event_type"], ["cents"])
    table_log.append(src.map_batches(prep(1), batch_format="pyarrow"),
                     tdir, shard_rows=20_000, stats_cols=["event_id"])
    r2 = refresh_matview(tdir, vdir, ["event_type"], ["cents"])
    assert (r1["mode"], r2["mode"]) == ("incremental", "incremental"), \
        (r1, r2)
    # rewrite history: erase event_ids % 1000 == 0 → rebuild path
    max_id = int(src.max("event_id"))
    table_log.delete_where(tdir, "event_id",
                           list(range(0, max_id + 1, 1000)))
    r3 = refresh_matview(tdir, vdir, ["event_type"], ["cents"])
    assert r3["mode"] == "rebuild", r3

    out = collect_table(read_matview(vdir))
    out = pa.table({
        "event_type": out["event_type"],
        "n_rows": pc.cast(out["n_rows"], pa.int64()),
        "sum_cents": pc.cast(out["sum_cents"], pa.int64())})
    shutil.rmtree(base, ignore_errors=True)
    return out.sort_by("event_type")
