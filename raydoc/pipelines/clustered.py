"""Clustered (sort-keyed) parquet output with zone-map pruned reads.

The output-layout half of a 100 TB pipeline: writing a table CLUSTERED
on a key (each file owns a disjoint key range, rows sorted within the
file, per-file min/max recorded in a zone-map manifest) turns every
later range query into an I/O-pruned read — only the files whose zone
overlaps the predicate are opened. This is the lakehouse
``CLUSTER BY`` / zone-map discipline expressed Ray-Data-first:

- one combiner stats pass finds the key extent (no materialization);
- rows route to ORDER-PRESERVING range buckets (same cut machinery as
  ``windows.global_rank_ntile``); each bucket group sorts locally and
  writes its own file from the WORKER (one file per bucket — bucket
  count is the file-size knob);
- the driver assembles ``_zonemap.json`` from tiny per-bucket rows and
  atomically swaps a staging directory in (tmp+rename discipline, same
  as ``compact_parquet_dir`` — a crash never leaves a half-written
  clustered table).

``read_clustered_range`` consults the zone map and feeds ONLY the
overlapping files to ``read_parquet`` — the caller still applies the
exact row filter; the zone map prunes I/O, not rows.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_ZONEMAP = "_zonemap.json"


def write_clustered_parquet(ds: rd.Dataset, out_dir: str, col: str,
                            num_buckets: int = 32) -> dict:
    """Write ``ds`` clustered on numeric ``col``. Returns the zone-map
    manifest dict. One file per non-empty bucket; empty buckets (cut
    landed in a gap) simply emit nothing."""
    import pandas as pd

    from raydoc.functions.windows import _global_min_max

    lo, hi = _global_min_max(ds, col)
    cuts = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    staging = out_dir.rstrip("/") + ".clustered-staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(np.searchsorted(cuts, v, side="right")
                                 .astype(np.int32)))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        b = int(g["__bucket"].iloc[0])
        g = g.sort_values(col, kind="stable", ignore_index=True) \
             .drop(columns="__bucket")
        path = os.path.join(staging, f"part-{b:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       path)
        return pd.DataFrame({
            "bucket": [b], "file": [os.path.basename(path)],
            "rows": [len(g)],
            "min": [float(g[col].iloc[0])],
            "max": [float(g[col].iloc[-1])]})

    zones = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(write_bucket, batch_format="pandas")).take_all()
    zones.sort(key=lambda z: z["bucket"])
    manifest = {"col": col, "num_buckets": num_buckets,
                "zones": [{k: z[k] for k in
                           ("bucket", "file", "rows", "min", "max")}
                          for z in zones]}
    with open(os.path.join(staging, _ZONEMAP), "w") as f:
        json.dump(manifest, f, indent=1)

    # atomic swap with a backup hop (same discipline as
    # compact_parquet_dir): the previous table is never destroyed before
    # the new one is in place
    backup = out_dir.rstrip("/") + ".clustered-backup"
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.exists(out_dir):
        os.replace(out_dir, backup)
    os.replace(staging, out_dir)
    shutil.rmtree(backup, ignore_errors=True)
    return manifest


def read_clustered_range(out_dir: str, lo: float | None = None,
                         hi: float | None = None) -> tuple[rd.Dataset, int]:
    """(dataset, n_files_pruned): a Dataset over ONLY the files whose
    zone overlaps [lo, hi] (None = unbounded). The caller applies the
    exact row predicate; this prunes which files are opened at all."""
    with open(os.path.join(out_dir, _ZONEMAP)) as f:
        manifest = json.load(f)
    keep, pruned = [], 0
    for z in manifest["zones"]:
        if (lo is not None and z["max"] < lo) or \
                (hi is not None and z["min"] > hi):
            pruned += 1
            continue
        keep.append(os.path.join(out_dir, z["file"]))
    if not keep:
        # empty selection: zero-row dataset with the right schema
        first = os.path.join(out_dir, manifest["zones"][0]["file"])
        ds = rd.read_parquet(first).limit(0)
        return ds, pruned
    return rd.read_parquet(keep), pruned


def zonemap_value_scan(sf_dir: str, lo: float = 100.0,
                       hi: float = 200.0) -> pa.Table:
    """(n, sum_cents): range aggregate over events.value served from a
    CLUSTERED copy via zone-map pruning — writes the clustered table
    (scratch under /tmp), prunes the read to overlapping files, applies
    the exact filter, and folds one combiner aggregate. The SQL twin is
    the plain WHERE-BETWEEN aggregate, so the oracle proves the pruned
    path loses no rows."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    out = f"/tmp/raydoc_zonemap_{os.getpid()}"
    try:
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "value"])
        write_clustered_parquet(ds, out, "value")
        pruned_ds, _ = read_clustered_range(out, lo, hi)

        def prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.greater_equal(t["value"], lo),
                                 pc.less_equal(t["value"], hi)))
            return pa.table({
                "k": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                                 pa.int64())})

        agg = collect_table(partial_groupby(
            pruned_ds.map_batches(prep, batch_format="pyarrow"),
            ["k"], {"n": ("one", "sum"), "sum_cents": ("cents", "sum")}))
        if agg.num_rows == 0:     # SQL: COUNT(*)=0 row with NULL sum
            return pa.table({"n": pa.array([0], pa.int64()),
                             "sum_cents": pa.array([None], pa.int64())})
        return pa.table({"n": agg["n"], "sum_cents": agg["sum_cents"]})
    finally:
        shutil.rmtree(out, ignore_errors=True)
