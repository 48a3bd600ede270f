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

    # pass 1: counts + native min/max partials, one row per column per
    # batch. Extremes fold in TWO parallel columns — numeric (int columns;
    # a string fold would say "9" > "10") and string (everything else) —
    # each null on the other family's rows so min/max aggregation skips it.
    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n_rows": [], "n_nonnull": [],
                "min_s": [], "max_s": [], "min_i": [], "max_i": []}
        for name in columns:
            col = t.column(name)
            is_int = pa.types.is_integer(col.type)
            rows["column"].append(name)
            rows["n_rows"].append(t.num_rows)
            rows["n_nonnull"].append(t.num_rows - col.null_count)
            mn = pc.min(col).as_py() if t.num_rows else None
            mx = pc.max(col).as_py() if t.num_rows else None
            rows["min_i"].append(mn if is_int else None)
            rows["max_i"].append(mx if is_int else None)
            rows["min_s"].append(None if is_int else _render(mn, col.type))
            rows["max_s"].append(None if is_int else _render(mx, col.type))
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_nonnull": pa.array(rows["n_nonnull"], pa.int64()),
            "min_s": pa.array(rows["min_s"], pa.string()),
            "max_s": pa.array(rows["max_s"], pa.string()),
            "min_i": pa.array(rows["min_i"], pa.int64()),
            "max_i": pa.array(rows["max_i"], pa.int64()),
        })

    partials = ds.map_batches(stats_partial, batch_format="pyarrow")
    stats = collect_table(partial_groupby(partials, ["column"], {
        "n_rows": ("n_rows", "sum"),
        "n_nonnull": ("n_nonnull", "sum"),
        "min_s": ("min_s", "min"),
        "max_s": ("max_s", "max"),
        "min_i": ("min_i", "min"),
        "max_i": ("max_i", "max"),
    }))

    # pass 2: exact distinct — batch-local dedup to (column, value-string)
    # pairs, combiner groupby, per-column count
    def pairs(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for name in columns:
            u = pc.drop_null(t.column(name).combine_chunks()).unique()
            rendered = [_render(v, t.column(name).type)
                        for v in u.to_pylist()]
            cols.extend([name] * len(rendered))
            vals.extend(rendered)
        return pa.table({"column": pa.array(cols, pa.string()),
                         "value": pa.array(vals, pa.string())})

    distinct_pairs = partial_groupby(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["column", "value"], {"__n": ("value", "count")})
    ndist = collect_table(partial_groupby(
        distinct_pairs, ["column"], {"n_distinct": ("value", "count")}))

    stats = stats.join(ndist.select(["column", "n_distinct"]),
                       keys="column", join_type="left outer")
    is_int = pa.array([pa.types.is_integer(types[c])
                       for c in stats.column("column").to_pylist()])
    min_val = pc.if_else(is_int, pc.cast(stats["min_i"], pa.string()),
                         stats["min_s"])
    max_val = pc.if_else(is_int, pc.cast(stats["max_i"], pa.string()),
                         stats["max_s"])
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
    """Profile the int64/string columns of the events table (the types
    whose VARCHAR rendering is bit-identical between Python and DuckDB;
    float/timestamp columns profile fine through ``profile_columns`` but
    render differently, so the oracle twin sticks to exact types)."""
    cols = ["event_id", "user_id", "event_type", "props"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    return profile_columns(ds, cols)
