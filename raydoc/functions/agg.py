"""Partial (combiner-style) aggregation for Ray Data.

A bare ``groupby(key).aggregate(...)`` shuffles every row. These helpers
pre-aggregate inside ``map_batches`` with pyarrow's C++ ``Table.group_by``
(one partial row per key per batch), so only the tiny partials cross the
wire — the combiner pattern the ray_guide prescribes for aggregation at
scale.

Spec format: ``{out_name: (in_col, kind)}`` with kind in
sum|count|min|max. Counts become partial counts summed in the final stage.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

_PARTIAL_FN = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
_FINAL_AGG = {"sum": Sum, "count": Sum, "min": Min, "max": Max}


def partial_groupby(ds: rd.Dataset, keys: list[str],
                    spec: dict[str, tuple[str, str]]) -> rd.Dataset:
    """Pre-aggregate per batch, then combine partials with one small shuffle.

    Returns a dataset with columns keys + spec outputs.
    """
    pairs = [(col, kind) for col, kind in spec.values()]
    if len(set(pairs)) != len(pairs):
        raise ValueError("duplicate (column, kind) pairs in spec")
    arrow_aggs = []
    renames = {}
    for out, (col, kind) in spec.items():
        arrow_aggs.append((col, _PARTIAL_FN[kind]))
        renames[f"{col}_{_PARTIAL_FN[kind]}"] = out

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(arrow_aggs)
        cols = {}
        for name in g.column_names:
            cols[renames.get(name, name)] = g.column(name)
        return pa.table(cols)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    final_aggs = [
        _FINAL_AGG[kind](out, alias_name=out)
        for out, (_, kind) in spec.items()
    ]
    return partials.groupby(keys).aggregate(*final_aggs)


_REFOLD = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def incremental_groupby(base_agg: rd.Dataset | pa.Table, delta: rd.Dataset,
                        keys: list[str],
                        spec: dict[str, tuple[str, str]]) -> rd.Dataset:
    """Incremental aggregate maintenance: merge an EXISTING aggregate
    (the output shape of ``partial_groupby(..., keys, spec)``) with a
    stream of NEW raw rows — the materialized-view refresh. The base
    table is never rescanned as raw data: its rows refold directly
    (counts add as sums, min/max re-fold), the delta pays one combiner
    pass, and one small exchange merges the two.

    Restriction: every ``spec`` kind must be refoldable (sum/count/min/
    max — avg callers carry sum+count and divide at the end, the same
    discipline the rest of the repo uses)."""
    delta_agg = partial_groupby(delta, keys, spec)
    if isinstance(base_agg, pa.Table):
        base_agg = rd.from_arrow(base_agg)
    refold_spec = {out: (out, _REFOLD[kind])
                   for out, (_, kind) in spec.items()}
    return partial_groupby(base_agg.union(delta_agg), keys, refold_spec)
