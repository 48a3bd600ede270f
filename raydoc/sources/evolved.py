"""Schema-evolution-tolerant parquet reads.

A long-lived 100 TB corpus accumulates shards written under different
schema versions: early files lack columns added later, string columns
get widened, new optional metadata appears. ``ray.data.read_parquet``
over such a directory produces ragged batches (each block carries its
file's own schema), so downstream ``map_batches`` code keyed to the
newest schema breaks on old shards.

``read_parquet_evolved`` reads the union normally and widens EVERY batch
to one explicit target schema map-side — missing columns fill with typed
nulls, present columns cast (safe casts only; a genuinely incompatible
column raises a typed error naming it, the same contract as
``joins.arrow_field_types``). No exchange, no extra pass: the widening
rides the read stage.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def widen_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """One batch → the target schema: missing columns become typed
    nulls, present ones cast; extra columns not in the target drop
    (they belong to an abandoned schema branch)."""
    n = batch.num_rows
    cols = {}
    for field in schema:
        if field.name not in batch.column_names:
            cols[field.name] = pa.nulls(n, field.type)
            continue
        col = batch.column(field.name)
        try:
            cols[field.name] = col.cast(field.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError) as exc:
            raise TypeError(
                f"column {field.name!r} arrived as {col.type} but the "
                f"target schema says {field.type} and the cast is not "
                f"safe — migrate the shard or widen the target") from exc
    return pa.table(cols)


def read_parquet_evolved(paths, schema: pa.Schema,
                         **read_kwargs) -> rd.Dataset:
    """``read_parquet`` over shards written under DIFFERENT schema
    versions, normalized map-side to ``schema``. ``columns=`` pruning
    still applies at the read when every requested column exists in a
    shard's footer; pass only ``schema`` columns you need — pruning what
    the target schema omits is automatic (extra columns drop)."""
    cols = read_kwargs.get("columns")
    if cols is not None:
        missing = [f.name for f in schema if f.name not in cols]
        if missing:
            # a narrower read would make widen_to_schema null-fill
            # columns that DO exist on disk — silent data corruption
            raise ValueError(
                f"columns= omits target-schema column(s) {missing}; "
                f"either request them or narrow the target schema")
    ds = rd.read_parquet(paths, **read_kwargs)
    return ds.map_batches(lambda t: widen_to_schema(t, schema),
                          batch_format="pyarrow")
