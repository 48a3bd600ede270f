"""Hash-bucketed (co-located) parquet storage and the zero-shuffle join.

The lakehouse co-location pattern for 100-TB fact↔fact joins: pay the
exchange ONCE at write time — every table bucketed on the join key with
the SAME hash and bucket count stores matching keys in matching bucket
directories — and every subsequent join on that key is embarrassingly
parallel: one task per bucket id reads ``bucket=i`` from each side and
joins locally, no network exchange at query time (Hive/Spark bucketing,
Iceberg bucket partition transforms). Complements
``pipelines/clustered.py`` (range clustering + zone maps → scan pruning);
bucketing targets JOIN locality instead.

Bucket assignment is ``splitmix64(key) % num_buckets``
(``dedup._splitmix64`` — vectorized, engine-stable), recorded in a
``_buckets_manifest.json``; ``bucketed_join_dataset`` refuses to join
dirs whose manifests disagree on key/hash/bucket-count (the classic
silent-wrong-join foot-gun of mismatched bucketing).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data as rd

_MANIFEST = "_buckets_manifest.json"


def write_bucketed_parquet(ds: rd.Dataset, out_dir: str, key: str,
                           num_buckets: int = 32) -> dict:
    """Write ``ds`` hash-bucketed on int64 ``key`` into
    ``out_dir/bucket=<i>/`` (Ray's partitioned parquet write — each
    block writes its own fragment files worker-side; a bucket dir holds
    many fragments, so no single task materializes a whole bucket).
    Atomic staging swap with a backup hop (the clustered/compact sink
    discipline). Returns the manifest dict."""
    from raydoc.functions.dedup import _splitmix64

    staging = out_dir.rstrip("/") + ".bucketed-staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)

    def add_bucket(t: pa.Table) -> pa.Table:
        ks = t.column(key).to_numpy(zero_copy_only=False)
        b = (_splitmix64(ks) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    ds.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(staging, partition_cols=["bucket"])
    manifest = {"key": key, "hash": "splitmix64",
                "num_buckets": num_buckets}
    with open(os.path.join(staging, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)

    backup = out_dir.rstrip("/") + ".bucketed-backup"
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.exists(out_dir):
        os.replace(out_dir, backup)
    os.replace(staging, out_dir)
    shutil.rmtree(backup, ignore_errors=True)
    return manifest


def _layout_schema(dir_: str) -> pa.Schema | None:
    """Schema of a bucketed layout from its first parquet fragment
    (partition col ``bucket`` is not stored in the files), or None for
    a layout with no data files (an empty dataset writes none)."""
    import glob

    import pyarrow.parquet as pq
    frags = glob.glob(os.path.join(dir_, "bucket=*", "*.parquet"))
    return pq.read_schema(frags[0]) if frags else None


def bucketed_join_dataset(left_dir: str, right_dir: str, key: str,
                          how: str = "inner") -> rd.Dataset:
    """Zero-exchange join of two bucketed tables: a Dataset of bucket
    ids fans out one task per bucket; each task reads ``bucket=i`` from
    BOTH dirs (only that directory's files open) and joins locally with
    the Arrow hash-join kernel. ``how='left'`` null-pads left rows
    whose bucket has no right-side data (a right bucket dir may simply
    not exist — keys can hash into a subset of buckets). Refuses
    mismatched bucket layouts and unknown ``how`` upfront."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    mans = []
    for d in (left_dir, right_dir):
        with open(os.path.join(d, _MANIFEST)) as f:
            mans.append(json.load(f))
    if mans[0] != mans[1] or mans[0]["key"] != key:
        raise ValueError(f"bucket layouts disagree or key mismatch: "
                         f"{mans[0]} vs {mans[1]} (want key={key!r})")
    num_buckets = mans[0]["num_buckets"]

    left_schema = _layout_schema(left_dir)
    right_schema = _layout_schema(right_dir)
    if left_schema is None:
        # no left data at all -> empty join, any schema info we have
        out_schema = pa.schema([])
    else:
        rfields = [] if right_schema is None else \
            [f for f in right_schema if f.name != key]
        out_schema = pa.schema(list(left_schema) + rfields)
    if how == "left" and left_schema is not None and right_schema is None:
        raise ValueError(
            f"right layout {right_dir!r} has no data files; cannot "
            f"infer the null-padding schema for how='left'")

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        outs = []
        for b in t.column("id").to_pylist():
            sides = []
            for d in (left_dir, right_dir):
                p = os.path.join(d, f"bucket={b}")
                sides.append(pq.read_table(p) if os.path.isdir(p)
                             else None)
            lt, rt = sides
            if lt is None or lt.num_rows == 0:
                continue
            if rt is None or rt.num_rows == 0:
                if how == "inner":
                    continue
                rt = right_schema.empty_table()
            outs.append(lt.join(rt, keys=key,
                                join_type={"inner": "inner",
                                           "left": "left outer"}[how]))
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(
            outs, promote_options="default").select(out_schema.names)

    return rd.range(num_buckets).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=1)


def colocated_order_revenue(sf_dir: str, num_buckets: int = 32) -> pa.Table:
    """(o_orderpriority, n_items, revenue_c100): lineitem⋈orders revenue
    by order priority, executed over CO-LOCATED bucketed storage — both
    tables are written bucketed on the orderkey (the once-per-layout
    exchange), then the join runs one-task-per-bucket with no shuffle
    and the tiny priority aggregate folds map-side. The SQL twin is the
    plain join; at 100 TB this is the layout under every repeated
    orderkey join."""
    import tempfile

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.relational import _rev_c100

    # per-run scratch: a fixed path would race concurrent runs through
    # write_bucketed_parquet's directory swap (bench + pytest overlap)
    scratch = tempfile.mkdtemp(prefix="raydoc_bucketed_")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda t: t.rename_columns(
            ["l_orderkey", "o_orderpriority"]), batch_format="pyarrow")
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    try:
        write_bucketed_parquet(li, f"{scratch}/lineitem", "l_orderkey",
                               num_buckets)
        write_bucketed_parquet(orders, f"{scratch}/orders", "l_orderkey",
                               num_buckets)
        joined = bucketed_join_dataset(f"{scratch}/lineitem",
                                       f"{scratch}/orders", "l_orderkey")

        def rev(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "o_orderpriority" not in t.schema.names:
                return pa.table(
                    {"o_orderpriority": pa.array([], pa.string()),
                     "rev": pa.array([], pa.int64())})
            return pa.table({"o_orderpriority": t["o_orderpriority"],
                             "rev": _rev_c100(t)})

        out = partial_groupby(
            joined.map_batches(rev, batch_format="pyarrow"),
            ["o_orderpriority"],
            {"n_items": ("rev", "count"),
             "revenue_c100": ("rev", "sum")})
        t = collect_table(out)
        # drop the storage bucket column if the partitioned read
        # surfaced it
        keep = [c for c in ("o_orderpriority", "n_items", "revenue_c100")
                if c in t.schema.names]
        return t.select(keep).sort_by("o_orderpriority")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def bucketed_point_lookup(dir_: str, key: str,
                          values: list[int]) -> pa.Table:
    """Point lookups served from the bucket layout as a hash index:
    each probe key hashes to ITS bucket directory, so only
    |distinct buckets probed| directories open — the other
    ``num_buckets − k`` never leave storage (the read-side dividend of
    the write-time exchange; the bucket twin of
    ``read_clustered_range``'s zone-map pruning)."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from raydoc.functions.dedup import _splitmix64

    with open(os.path.join(dir_, _MANIFEST)) as f:
        man = json.load(f)
    if man["key"] != key:
        raise ValueError(f"layout is bucketed on {man['key']!r}, "
                         f"not {key!r}")
    vals = np.asarray(sorted(set(values)), dtype=np.int64)
    buckets = np.unique(_splitmix64(vals) % np.uint64(man["num_buckets"]))
    outs = []
    for b in buckets.tolist():
        p = os.path.join(dir_, f"bucket={b}")
        if not os.path.isdir(p):
            continue
        t = pq.read_table(p)
        outs.append(t.filter(pc.is_in(t[key], value_set=pa.array(
            vals, pa.int64()))))
    if not outs:
        schema = _layout_schema(dir_)
        return schema.empty_table() if schema is not None else pa.table({})
    return pa.concat_tables(outs, promote_options="default")
