"""Join strategies for Ray Data datasets.

- ``broadcast_join``: the small side is materialized once into the object
  store (``ray.put``) and hash-looked-up inside every map task — no
  shuffle. Right choice for dimension tables (nation/region/customer…).
- ``bucket_hash_join``: both sides large → explicit partitioned hash join:
  add ``bucket = hash(key) % B`` to both sides, union under a padded common
  schema, group by bucket, join each bucket pairwise with pandas inside
  ``map_groups``. This is the portable large-large pattern (ray_guide
  "Joins and lookups"); B sizes the shuffle granularity and hot keys can be
  salted into sub-buckets by raising B.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _key_hash(arr: pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of an int/string key column."""
    if pa.types.is_integer(arr.type):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64-style scramble so sequential keys spread
        vals = (vals ^ (vals >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        vals = (vals ^ (vals >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return ((vals ^ (vals >> np.uint64(31))) % np.uint64(num_buckets)).astype(np.int32)
    import hashlib
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % num_buckets
         for v in arr.to_pylist()], dtype=np.int32)


def broadcast_join(ds: rd.Dataset, small: pa.Table, key: str,
                   select: list[str] | None = None,
                   how: str = "inner") -> rd.Dataset:
    """Join ``ds`` against a small in-memory table without a shuffle.

    The dimension table is put into the object store ONCE; every task reads
    it zero-copy instead of re-shipping it per batch.
    """
    if select:
        small = small.select([key] + [c for c in select if c != key])
    small_ref = ray.put(small)

    def _join(batch: pa.Table) -> pa.Table:
        # per-worker cache: the object-store read is zero-copy but the
        # pandas conversion isn't — do it once per worker, not per batch
        right = _BROADCAST_CACHE.get(small_ref)
        if right is None:
            if len(_BROADCAST_CACHE) > 8:
                _BROADCAST_CACHE.clear()
            right = ray.get(small_ref).to_pandas()
            _BROADCAST_CACHE[small_ref] = right
        out = batch.to_pandas().merge(right, on=key, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(_join, batch_format="pyarrow")


_BROADCAST_CACHE: dict = {}


def bucket_hash_join(left: rd.Dataset, right: rd.Dataset, key: str,
                     num_buckets: int = 32, how: str = "inner") -> rd.Dataset:
    """Large-large equi-join via explicit hash bucketing + per-bucket merge.

    Requires disjoint non-key column names. Each bucket must fit in one
    worker's memory — raise ``num_buckets`` for bigger inputs or hot keys.
    """
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"column collision in bucket_hash_join: {overlap}")
    all_fields = [(n, left_schema.base_schema.field(n).type) for n in left_cols]
    all_fields += [(n, right_schema.base_schema.field(n).type)
                   for n in right_cols if n != key]

    def _widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    cols[name] = batch.column(name)
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__bucket"] = pa.array(
                _key_hash(batch.column(key).combine_chunks(), num_buckets),
                pa.int32())
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)
        return fn

    tagged = left.map_batches(_widen(0), batch_format="pyarrow").union(
        right.map_batches(_widen(1), batch_format="pyarrow"))

    out_cols = [n for n, _ in all_fields]

    def _join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group.loc[group["__side"] == 0, left_cols]
        r = group.loc[group["__side"] == 1, right_cols]
        if l.empty or r.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        return l.merge(r, on=key, how=how)[out_cols]

    return tagged.groupby("__bucket").map_groups(_join_bucket,
                                                 batch_format="pandas")
