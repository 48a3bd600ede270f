"""Z-ORDERED parquet output — multi-dimensional zone-map pruning.

1-D clustering (``pipelines/clustered.py``) prunes range reads on ONE
column; a query that also constrains a second column still opens every
overlapping file. Z-ordering (the Databricks ``ZORDER BY`` / space-
filling-curve discipline) interleaves the bits of two rank-normalized
columns so rows close in (a, b) space land close on the curve — each
output file then owns a tight BOX in (a, b), and a 2-D box query prunes
on both dimensions at once.

Ray-Data-first shape, mirroring the clustered sink:

- ONE combiner stats pass finds both columns' extents (no
  materialization);
- a map stage quantizes both columns to ``bits``-bit grid cells
  (equi-width; see the docstring note on skew) and interleaves them
  into the z-value; rows route to order-preserving range buckets OF z;
- each bucket group sorts by z and writes its own file from the worker,
  emitting a tiny zone row carrying min/max of BOTH original columns;
- the driver assembles ``_zonemap2d.json`` and atomically swaps the
  staging directory in (tmp+rename, same as ``compact_parquet_dir``).

``read_zordered_box`` opens ONLY the files whose (a, b) box intersects
the query box; callers still apply the exact row predicate.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_ZONEMAP = "_zonemap2d.json"


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``v`` (uint64) two apart —
    the classic Morton-code bit-twiddle, vectorized."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def _zvalues(a: np.ndarray, b: np.ndarray, alo, ahi, blo, bhi,
             bits: int = 16) -> np.ndarray:
    """Interleaved Morton codes of two float arrays, each equi-width
    quantized to ``bits``-bit grid coordinates over its global extent.
    Equi-width keeps the SQL-facing semantics trivial; heavily skewed
    columns would prefer equi-depth (rank) cuts — same interleave, cuts
    from ``windows.value_percentiles``."""
    def quant(v, lo, hi):
        span = (hi - lo) or 1.0
        q = np.floor((v - lo) / span * (2 ** bits - 1))
        return np.clip(q, 0, 2 ** bits - 1).astype(np.uint64)

    return ((_spread_bits(quant(a, alo, ahi)) << np.uint64(1))
            | _spread_bits(quant(b, blo, bhi))).astype(np.int64)


def _minmax2(ds: rd.Dataset, col_a: str, col_b: str):
    """One combiner pass → (alo, ahi, blo, bhi)."""
    from raydoc.functions._collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "alo": pa.array([pc.min(t[col_a]).as_py()], pa.float64()),
            "ahi": pa.array([pc.max(t[col_a]).as_py()], pa.float64()),
            "blo": pa.array([pc.min(t[col_b]).as_py()], pa.float64()),
            "bhi": pa.array([pc.max(t[col_b]).as_py()], pa.float64())})

    p = collect_table(ds.map_batches(partial, batch_format="pyarrow"))
    if p.num_rows == 0 or "alo" not in p.column_names:
        # empty input: Ray emits no blocks (or empty-schema ones)
        return None, None, None, None
    return (pc.min(p["alo"]).as_py(), pc.max(p["ahi"]).as_py(),
            pc.min(p["blo"]).as_py(), pc.max(p["bhi"]).as_py())


def write_zordered_parquet(ds: rd.Dataset, out_dir: str, col_a: str,
                           col_b: str, num_buckets: int = 32,
                           bits: int = 16) -> dict:
    """Write ``ds`` Z-ordered on (``col_a``, ``col_b``). Returns the
    2-D zone-map manifest. One file per non-empty z-range bucket; each
    zone records min/max of BOTH columns."""
    import pandas as pd

    if not 1 <= bits <= 16:
        # _spread_bits interleaves the LOW 16 bits only; a larger value
        # would silently alias distant rows onto one z
        raise ValueError(f"bits must be in [1, 16], got {bits}")

    staging = out_dir.rstrip("/") + ".zorder-staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)

    alo, ahi, blo, bhi = _minmax2(ds, col_a, col_b)
    if alo is None or blo is None:          # empty input
        import pyarrow.parquet as pq
        empty = os.path.join(staging, "part-empty.parquet")
        pq.write_table(ds.schema().base_schema.empty_table(), empty)
        manifest = {"col_a": col_a, "col_b": col_b, "bits": bits,
                    "num_buckets": num_buckets, "zones": [],
                    "empty_file": os.path.basename(empty)}
        with open(os.path.join(staging, _ZONEMAP), "w") as f:
            json.dump(manifest, f, indent=1)
        backup = out_dir.rstrip("/") + ".zorder-backup"
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(out_dir):
            os.replace(out_dir, backup)
        os.replace(staging, out_dir)
        shutil.rmtree(backup, ignore_errors=True)
        return manifest

    zmax = float(2 ** (2 * bits) - 1)
    cuts = np.linspace(0.0, zmax, num_buckets + 1)[1:-1]

    def add_z(t: pa.Table) -> pa.Table:
        a = t.column(col_a).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = t.column(col_b).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        z = _zvalues(a, b, alo, ahi, blo, bhi, bits)
        t = t.append_column("__z", pa.array(z))
        return t.append_column(
            "__bucket", pa.array(np.searchsorted(cuts, z, side="right")
                                 .astype(np.int32)))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        bkt = int(g["__bucket"].iloc[0])
        g = g.sort_values("__z", kind="stable", ignore_index=True) \
             .drop(columns=["__z", "__bucket"])
        path = os.path.join(staging, f"part-{bkt:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       path)
        return pd.DataFrame({
            "bucket": [bkt], "file": [os.path.basename(path)],
            "rows": [len(g)],
            "amin": [float(g[col_a].min())],
            "amax": [float(g[col_a].max())],
            "bmin": [float(g[col_b].min())],
            "bmax": [float(g[col_b].max())]})

    zones = (ds.map_batches(add_z, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(write_bucket, batch_format="pandas")).take_all()
    zones.sort(key=lambda z: z["bucket"])
    manifest = {"col_a": col_a, "col_b": col_b, "bits": bits,
                "num_buckets": num_buckets,
                "zones": [{k: z[k] for k in
                           ("bucket", "file", "rows", "amin", "amax",
                            "bmin", "bmax")} for z in zones]}
    with open(os.path.join(staging, _ZONEMAP), "w") as f:
        json.dump(manifest, f, indent=1)

    backup = out_dir.rstrip("/") + ".zorder-backup"
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.exists(out_dir):
        os.replace(out_dir, backup)
    os.replace(staging, out_dir)
    shutil.rmtree(backup, ignore_errors=True)
    return manifest


def read_zordered_box(out_dir: str, a_lo=None, a_hi=None,
                      b_lo=None, b_hi=None) -> tuple[rd.Dataset, int]:
    """(dataset, n_files_pruned): only the files whose (a, b) zone box
    intersects the query box are opened (None = unbounded side). The
    caller applies the exact row predicate."""
    with open(os.path.join(out_dir, _ZONEMAP)) as f:
        manifest = json.load(f)
    keep, pruned = [], 0
    for z in manifest["zones"]:
        out = ((a_lo is not None and z["amax"] < a_lo)
               or (a_hi is not None and z["amin"] > a_hi)
               or (b_lo is not None and z["bmax"] < b_lo)
               or (b_hi is not None and z["bmin"] > b_hi))
        if out:
            pruned += 1
            continue
        keep.append(os.path.join(out_dir, z["file"]))
    if not keep:
        fallback = (manifest["zones"][0]["file"] if manifest["zones"]
                    else manifest["empty_file"])
        first = os.path.join(out_dir, fallback)
        return rd.read_parquet(first).limit(0), pruned
    return rd.read_parquet(keep), pruned


def zorder_box_scan(sf_dir: str, u_lo: int = 10, u_hi: int = 40,
                    v_lo: float = 100.0, v_hi: float = 300.0) -> pa.Table:
    """(n, sum_cents): a 2-D box aggregate over events (user_id AND
    value both constrained) served from a Z-ORDERED copy — the query
    shape 1-D clustering cannot prune. Writes the z-ordered table
    (scratch under /tmp), prunes files on both dimensions, applies the
    exact filter, folds one combiner aggregate. The SQL twin is the
    plain two-predicate aggregate, so the oracle proves the 2-D-pruned
    path loses no rows."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    out = f"/tmp/raydoc_zorder_{os.getpid()}"
    try:
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "value"])
        write_zordered_parquet(ds, out, "user_id", "value")
        pruned_ds, _ = read_zordered_box(out, u_lo, u_hi, v_lo, v_hi)

        def prep(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.and_(pc.greater_equal(t["user_id"],
                                         pa.scalar(u_lo, pa.int64())),
                        pc.less_equal(t["user_id"],
                                      pa.scalar(u_hi, pa.int64()))),
                pc.and_(pc.greater_equal(t["value"], v_lo),
                        pc.less_equal(t["value"], v_hi)))
            t = t.filter(keep)
            return pa.table({
                "k": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "cents": pc.cast(pc.round(pc.multiply(t["value"],
                                                      100.0)),
                                 pa.int64())})

        agg = collect_table(partial_groupby(
            pruned_ds.map_batches(prep, batch_format="pyarrow"),
            ["k"], {"n": ("one", "sum"), "sum_cents": ("cents", "sum")}))
        if agg.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "sum_cents": pa.array([None], pa.int64())})
        return pa.table({"n": agg["n"], "sum_cents": agg["sum_cents"]})
    finally:
        shutil.rmtree(out, ignore_errors=True)
