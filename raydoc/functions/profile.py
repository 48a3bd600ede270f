"""Distributed table profiling — the data-quality summary every ingest
pipeline runs before committing a 100 TB load.

``profile_columns`` computes, per column, in two streaming passes over a
column-pruned read:

- row count / non-null count / min / max: per-batch pyarrow partials
  (one row per column per batch) folded by a tiny groupby — the combiner
  pattern, nothing but k×#batches partial rows ever crosses the wire;
- exact distinct count: per-batch LOCAL dedup to (column, value) pairs,
  one combiner groupby over the pairs, then a per-column count — the same
  shape as ``distinct_flags``; shuffle volume is bounded by the TRUE
  cardinality per batch, not the row count. (At 100 TB, swap the exact
  pass for the HLL in functions/sketches.py — same call shape; the exact
  pass is the oracle-checkable twin.)

min/max are computed on the NATIVE type (so numeric order, not string
order) and rendered to strings only at the end, matching the SQL twin's
``CAST(MIN(col) AS VARCHAR)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raydoc.functions._collect import collect_table
from raydoc.functions.agg import partial_groupby


def _render(val, typ: pa.DataType) -> str | None:
    """str() of a scalar exactly as DuckDB CAST(x AS VARCHAR) renders it
    for the profiled types (int64 / string pass through)."""
    if val is None:
        return None
    return str(val)


def profile_columns(ds: rd.Dataset, columns: list[str]) -> pa.Table:
    """One profile row per column: (column, n_rows, n_nonnull, n_distinct,
    min_val, max_val); min/max rendered as strings of the native-type
    extremes. ``ds`` should already be column-pruned to ``columns``."""
    types = {n: t for n, t in zip(ds.schema().names, ds.schema().types)}

    def _family(typ: pa.DataType) -> str:
        if pa.types.is_integer(typ):
            return "i"
        if pa.types.is_floating(typ):
            return "f"
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return "s"
        raise ValueError(
            f"profile_columns supports int/float/string columns; got "
            f"{typ} — cast the column first")

    for name in columns:
        _family(types[name])

    # pass 1: counts + native min/max partials, one row per column per
    # batch. Extremes fold in THREE parallel typed columns — int64,
    # float64, string (a string fold of numbers would say "9" > "10") —
    # each null outside its family so min/max aggregation skips it.
    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n_rows": [], "n_nonnull": [],
                "min_s": [], "max_s": [], "min_i": [], "max_i": [],
                "min_f": [], "max_f": []}
        for name in columns:
            col = t.column(name)
            fam = _family(col.type)
            rows["column"].append(name)
            rows["n_rows"].append(t.num_rows)
            rows["n_nonnull"].append(t.num_rows - col.null_count)
            mn = pc.min(col).as_py() if t.num_rows else None
            mx = pc.max(col).as_py() if t.num_rows else None
            rows["min_i"].append(mn if fam == "i" else None)
            rows["max_i"].append(mx if fam == "i" else None)
            rows["min_f"].append(mn if fam == "f" else None)
            rows["max_f"].append(mx if fam == "f" else None)
            rows["min_s"].append(_render(mn, col.type)
                                 if fam == "s" else None)
            rows["max_s"].append(_render(mx, col.type)
                                 if fam == "s" else None)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_nonnull": pa.array(rows["n_nonnull"], pa.int64()),
            "min_s": pa.array(rows["min_s"], pa.string()),
            "max_s": pa.array(rows["max_s"], pa.string()),
            "min_i": pa.array(rows["min_i"], pa.int64()),
            "max_i": pa.array(rows["max_i"], pa.int64()),
            "min_f": pa.array(rows["min_f"], pa.float64()),
            "max_f": pa.array(rows["max_f"], pa.float64()),
        })

    partials = ds.map_batches(stats_partial, batch_format="pyarrow")
    stats = collect_table(partial_groupby(partials, ["column"], {
        "n_rows": ("n_rows", "sum"),
        "n_nonnull": ("n_nonnull", "sum"),
        "min_s": ("min_s", "min"),
        "max_s": ("max_s", "max"),
        "min_i": ("min_i", "min"),
        "max_i": ("max_i", "max"),
        "min_f": ("min_f", "min"),
        "max_f": ("max_f", "max"),
    }))
    # an extreme folded over an all-null family column comes back as a
    # NULL-typed column (no family member among `columns`); pin the
    # declared types so the join below accepts it
    for name, typ in [("min_i", pa.int64()), ("max_i", pa.int64()),
                      ("min_f", pa.float64()), ("max_f", pa.float64()),
                      ("min_s", pa.string()), ("max_s", pa.string())]:
        idx = stats.schema.get_field_index(name)
        if stats.schema.field(idx).type != typ:
            stats = stats.set_column(idx, name,
                                     stats.column(name).cast(typ))

    # pass 2: exact distinct — batch-local dedup to (column, value-string)
    # pairs with a COARSE int32 bucket cut from a vectorized value hash:
    # the exchange sorts int32 buckets, never the value strings; the
    # bucket is routing only (equal values always share a bucket), so the
    # per-bucket dedup on the actual values stays collision-proof exact.
    # Per-bucket distinct counts are additive across buckets.
    from raydoc.functions._buckets import reduce_bucket_count
    mask = reduce_bucket_count() - 1

    def pairs(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        cols, vals, buckets = [], [], []
        for name in columns:
            u = pc.drop_null(t.column(name).combine_chunks()).unique()
            rendered = [_render(v, t.column(name).type)
                        for v in u.to_pylist()]
            # categorize=False: the default categorize path hashes via
            # the array's category set, so the SAME value can bucket
            # differently across batches — per-value determinism needs
            # the plain siphash path
            h = pd.util.hash_array(np.array(rendered, dtype=object),
                                   categorize=False)
            cols.extend([name] * len(rendered))
            vals.extend(rendered)
            buckets.append((h & np.uint64(mask)).astype(np.int32))
        return pa.table({
            "column": pa.array(cols, pa.string()),
            "value": pa.array(vals, pa.string()),
            "bucket": pa.array(
                np.concatenate(buckets) if buckets
                else np.array([], dtype=np.int32))})

    def per_bucket(g: pa.Table) -> pa.Table:
        d = g.group_by(["column", "value"]).aggregate([("value", "count")])
        c = d.group_by(["column"]).aggregate([("value", "count")])
        return pa.table({"column": c["column"],
                         "n": c["value_count"]})

    bucket_partials = (ds.map_batches(pairs, batch_format="pyarrow")
                       .groupby("bucket")
                       .map_groups(per_bucket, batch_format="pyarrow"))
    ndist = collect_table(partial_groupby(
        bucket_partials, ["column"], {"n_distinct": ("n", "sum")}))

    stats = stats.join(ndist.select(["column", "n_distinct"]),
                       keys="column", join_type="left outer")
    fams = [_family(types[c]) for c in stats.column("column").to_pylist()]
    picked = {"i": stats["min_i"].cast(pa.string()),
              "f": pa.array([_render(v, None) for v in
                             stats["min_f"].to_pylist()], pa.string()),
              "s": stats["min_s"].combine_chunks()}
    picked_max = {"i": stats["max_i"].cast(pa.string()),
                  "f": pa.array([_render(v, None) for v in
                                 stats["max_f"].to_pylist()], pa.string()),
                  "s": stats["max_s"].combine_chunks()}
    min_val = pa.array([picked[f][i].as_py()
                        for i, f in enumerate(fams)], pa.string())
    max_val = pa.array([picked_max[f][i].as_py()
                        for i, f in enumerate(fams)], pa.string())
    out = pa.table({
        "column": stats["column"],
        "n_rows": stats["n_rows"],
        "n_nonnull": stats["n_nonnull"],
        "n_distinct": pc.coalesce(stats["n_distinct"],
                                  pa.scalar(0, pa.int64())),
        "min_val": min_val,
        "max_val": max_val,
    })
    return out.sort_by("column")


def profile_events(sf_dir: str) -> pa.Table:
    """Profile the int64/string columns of the events table — the types
    whose VARCHAR rendering is bit-identical between Python and DuckDB.
    Float columns fold with real float64 extremes (see profile_columns)
    but Python repr and DuckDB VARCHAR render doubles differently, so the
    oracle twin sticks to the exact-rendering types."""
    cols = ["event_id", "user_id", "event_type", "props"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    return profile_columns(ds, cols)


def constraint_report(sf_dir: str) -> pa.Table:
    """(rule, n_violations): the dbt-style data-quality gate a 100 TB
    ingest runs before committing — five constraint families, each as
    its own bounded distributed pass, only scalar counts reaching the
    driver:

    - ``doc_text_not_null`` / ``doc_min_words_20``: one shared
      vectorized pass over documents (per-batch counts → scalar sum);
    - ``doc_text_unique``: docs whose exact text (md5) appears ≥ 2
      times — combiner hash counts, violating groups filter MAP-SIDE,
      then a scalar sum (the corpus-cardinality hash table never
      collects);
    - ``orders_fk_customer``: referential integrity via the adaptive
      anti semi-join (broadcast key set ≤ 4M keys, bucketed beyond) —
      a distributed ``count()`` of orphans;
    - ``lineitem_qty_range``: domain check 0 < qty ≤ 50, vectorized.
    """
    import hashlib

    import numpy as np

    import ray.data as rd

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.joins import bucket_semi_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def doc_counts(t: pa.Table) -> pa.Table:
        col = t.column("text")
        n_null = int(pc.sum(pc.cast(pc.is_null(col), pa.int64()))
                     .as_py() or 0)
        words = pc.list_value_length(
            pc.split_pattern(pc.fill_null(col, ""), " "))
        n_short = int(pc.sum(pc.cast(pc.less(words, 20), pa.int64()))
                      .as_py() or 0)
        return pa.table({"n_null": pa.array([n_null], pa.int64()),
                         "n_short": pa.array([n_short], pa.int64())})

    dc = collect_table(docs.map_batches(doc_counts,
                                        batch_format="pyarrow"))
    n_null = int(pc.sum(dc["n_null"]).as_py() or 0)
    n_short = int(pc.sum(dc["n_short"]).as_py() or 0)

    def text_hashes(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t.column("text").to_pylist() if x is not None]
        return pa.table({"h": pa.array(hs, pa.string())})

    hash_counts = partial_groupby(
        docs.map_batches(text_hashes, batch_format="pyarrow"),
        ["h"], {"c": ("h", "count")})

    def dup_partial(t: pa.Table) -> pa.Table:
        c = t.column("c")
        dup = pc.sum(c.filter(pc.greater(c, 1))).as_py() or 0
        return pa.table({"d": pa.array([int(dup)], pa.int64())})

    dt = collect_table(hash_counts.map_batches(dup_partial,
                                               batch_format="pyarrow"))
    n_dup = int(pc.sum(dt["d"]).as_py() or 0)

    # NULL FKs are NOT violations (SQL NOT IN / dbt relationship-test
    # semantics) — the anti semi-join would KEEP null left keys (its
    # NOT EXISTS contract), so drop them before the join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["o_custkey"])),
        batch_format="pyarrow")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["o_custkey"]),
        batch_format="pyarrow")
    n_orphan = bucket_semi_join(orders, cust, "o_custkey",
                                anti=True).count()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        bad = int(np.count_nonzero((q <= 0) | (q > 50)))
        return pa.table({"b": pa.array([bad], pa.int64())})

    qt = collect_table(li.map_batches(qty_partial,
                                      batch_format="pyarrow"))
    n_qty = int(pc.sum(qt["b"]).as_py() or 0)

    rules = [("doc_min_words_20", n_short),
             ("doc_text_not_null", n_null),
             ("doc_text_unique", n_dup),
             ("lineitem_qty_range", n_qty),
             ("orders_fk_customer", n_orphan)]
    return pa.table({
        "rule": pa.array([r for r, _ in rules], pa.string()),
        "n_violations": pa.array([v for _, v in rules], pa.int64())})
