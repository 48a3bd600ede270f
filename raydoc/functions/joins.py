"""Join strategies for Ray Data datasets.

- ``broadcast_join``: the small side is materialized once into the object
  store (``ray.put``) and hash-looked-up inside every map task — no
  shuffle. Right choice for dimension tables (nation/region/customer…).
- ``bucket_hash_join``: both sides large → explicit partitioned hash join:
  add ``bucket = hash(key) % B`` to both sides, union under a padded common
  schema, group by bucket, join each bucket with pyarrow's C++ hash join
  inside ``map_groups``. This is the portable large-large pattern
  (ray_guide "Joins and lookups"); B sizes the shuffle granularity and hot
  keys can be salted into sub-buckets by raising B.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _key_hash(arr: pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of an int/string key column."""
    if pa.types.is_integer(arr.type):
        if arr.null_count:
            # nulls bucket as 0 — the per-bucket logic applies SQL null
            # semantics (a null key never equi-matches anything)
            arr = arr.fill_null(0)
        vals = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64-style scramble so sequential keys spread
        vals = (vals ^ (vals >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        vals = (vals ^ (vals >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return ((vals ^ (vals >> np.uint64(31))) % np.uint64(num_buckets)).astype(np.int32)
    import hashlib
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % num_buckets
         for v in arr.to_pylist()], dtype=np.int32)


_PA_HOW = {"inner": "inner", "left": "left outer",
           "right": "right outer", "full": "full outer"}


def _pa_join_type(how: str) -> str:
    if how not in _PA_HOW:
        raise ValueError(f"unsupported how={how!r}; "
                         f"supported: {sorted(_PA_HOW)}")
    return _PA_HOW[how]


def arrow_field_types(schema, names) -> list[tuple[str, pa.DataType]]:
    """(name, arrow type) pairs from a Dataset schema — handles both
    Arrow-block and pandas-block datasets. A pandas-block object-dtype
    column is ASSUMED to hold strings (the schema carries no more
    information); if it actually holds bytes/lists the widen stage raises
    a typed error naming the column instead of silently miscasting —
    convert such pipelines to Arrow-block batches before a keyed join."""
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return [(n, base.field(n).type) for n in names]
    dtypes = dict(zip(schema.names, schema.types))

    def _arrow(t) -> pa.DataType:
        if isinstance(t, pa.DataType):      # from_pandas datasets carry
            return t                        # Arrow types in .types
        return pa.string() if t == np.dtype("O") \
            else pa.from_numpy_dtype(t)

    return [(n, _arrow(dtypes[n])) for n in names]


def tag_union(left: rd.Dataset, right: rd.Dataset, key: str,
              all_fields: list[tuple[str, pa.DataType]],
              num_buckets: int) -> rd.Dataset:
    """Shared machinery for the keyed two-sided operators (bucket join,
    as-of join, containment anti-join): pad BOTH sides to one schema
    (nulls for the other side's columns), tag ``__side`` and a hash
    ``__bucket`` of the key, and union — ready for a per-bucket reduce.
    ``all_fields`` is computed ONCE by the caller (never per batch, never
    from inside a closure that captures a Dataset)."""

    def _widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_fields:
                if name not in batch.column_names:
                    cols[name] = pa.nulls(n, typ)
                    continue
                col = batch.column(name)
                try:
                    cols[name] = col.cast(typ)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                        pa.ArrowTypeError) as exc:
                    raise TypeError(
                        f"column {name!r} arrived as {col.type} but the "
                        f"declared join schema says {typ} — object-dtype "
                        f"pandas columns are assumed string; use "
                        f"Arrow-block batches for non-string object "
                        f"columns") from exc
            keycol = cols[key]       # padded/cast above — present even
            if isinstance(keycol, pa.ChunkedArray):   # on empty-schema
                keycol = keycol.combine_chunks()      # blocks
            cols["__bucket"] = pa.array(
                _key_hash(keycol, num_buckets), pa.int32())
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)
        return fn

    return left.map_batches(_widen(0), batch_format="pyarrow").union(
        right.map_batches(_widen(1), batch_format="pyarrow"))


def broadcast_join(ds: rd.Dataset, small: pa.Table, key: str,
                   select: list[str] | None = None,
                   how: str = "inner") -> rd.Dataset:
    """Join ``ds`` against a small in-memory table without a shuffle.

    The dimension table is put into the object store ONCE and read
    zero-copy in every task; the per-batch join is pyarrow's C++ hash join
    (no pandas round-trip on the hot path).
    """
    if select:
        small = small.select([key] + [c for c in select if c != key])
    if how not in ("inner", "left"):
        # an unmatched small-side row would be re-emitted by EVERY map
        # task; right/full outer need the bucketed join's co-location
        raise ValueError(f"broadcast_join supports inner/left only, not "
                         f"{how!r} — use bucket_hash_join")
    small_ref = ray.put(small)
    join_type = _pa_join_type(how)

    def _join(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)          # zero-copy object-store read
        return batch.join(right, keys=key, join_type=join_type)

    return ds.map_batches(_join, batch_format="pyarrow")


def bucket_hash_join(left: rd.Dataset, right: rd.Dataset, key: str,
                     num_buckets: int = 32, how: str = "inner") -> rd.Dataset:
    """Large-large equi-join via explicit hash bucketing + per-bucket Arrow
    hash join.

    Requires disjoint non-key column names. Each bucket must fit in one
    worker's memory — raise ``num_buckets`` for bigger inputs or hot keys.
    Emits Arrow blocks with a fixed schema, so the result chains into
    further joins / groupbys.
    """
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"column collision in bucket_hash_join: {overlap}")

    all_fields = arrow_field_types(left_schema, left_cols)
    all_fields += arrow_field_types(right_schema,
                                    [c for c in right_cols if c != key])
    out_schema = pa.schema(all_fields)
    join_type = _pa_join_type(how)

    tagged = tag_union(left, right, key, all_fields, num_buckets)

    out_cols = [n for n, _ in all_fields]

    def _join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        l = group.filter(pc.equal(side, 0)).select(left_cols)
        r = group.filter(pc.equal(side, 1)).select(
            [key] + [c for c in right_cols if c != key])
        # short-circuit only provably-empty results; pyarrow handles empty
        # sides of outer joins correctly (unmatched rows pad with null)
        if ((join_type == "inner" and (l.num_rows == 0 or r.num_rows == 0))
                or (join_type == "left outer" and l.num_rows == 0)
                or (join_type == "right outer" and r.num_rows == 0)
                or (l.num_rows == 0 and r.num_rows == 0)):
            return out_schema.empty_table()
        joined = l.join(r, keys=key, join_type=join_type)
        return joined.select(out_cols).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(_join_bucket,
                                                 batch_format="pyarrow")


def bucket_semi_join(left: rd.Dataset, right: rd.Dataset, key: str,
                     num_buckets: int = 32, anti: bool = False,
                     broadcast_max: int | None = 4_000_000) -> rd.Dataset:
    """Distributed semi-join (``EXISTS``) or anti-join (``NOT EXISTS``):
    keep the ``left`` rows whose ``key`` does (semi) / does not (anti)
    appear in ``right``.

    Scale shape: the right side is reduced to per-batch-distinct keys
    BEFORE the exchange (duplicates across batches land in the same bucket
    and dedup there via set membership), so the shuffle moves left rows +
    right keys only — never right payload columns. Null left keys follow
    SQL semantics: they never match, so semi drops them and anti keeps
    them.

    ADAPTIVE regime: the right key stream is GLOBALLY deduped by a
    combiner groupby and materialized (cluster-resident, bounded by the
    TRUE key cardinality — a hot-key right side of 10⁹ rows with 10³
    keys materializes 10³ rows); when it holds ≤ ``broadcast_max`` keys
    the filter runs map-side against one broadcast key set — the left
    side never shuffles at all. A larger key set falls back to the
    bucketed exchange, reusing the already-deduped keys.
    ``broadcast_max=None`` skips the dedup exchange entirely and runs
    the pure bucketed path (per-batch-distinct keys dedup inside the
    buckets).
    """
    left_schema = left.schema()
    all_fields = arrow_field_types(left_schema, list(left_schema.names))
    key_type = dict(all_fields)[key]
    out_schema = pa.schema(all_fields)
    left_cols = [n for n, _ in all_fields]

    def _dedup_keys(batch: pa.Table) -> pa.Table:
        keys_arr = batch.column(key).combine_chunks().unique().drop_null()
        return pa.table({key: keys_arr.cast(key_type)})

    right_keys = right.map_batches(_dedup_keys, batch_format="pyarrow")

    if broadcast_max is not None:
        from raydoc.functions.agg import partial_groupby
        right_keys = partial_groupby(
            right_keys, [key], {"__n": (key, "count")}).map_batches(
            lambda t: t.select([key]), batch_format="pyarrow") \
            .materialize()
        if right_keys.count() <= broadcast_max:
            from raydoc.functions._collect import collect_table
            collected = collect_table(right_keys)
            # an ALL-empty right stream can surface as a zero-column
            # table (Ray drops the schema of empty aggregate outputs)
            key_set = (collected.column(key).combine_chunks().unique()
                       if key in collected.column_names
                       else pa.array([], key_type))
            keys_ref = ray.put(key_set)

            def _filter_map(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                ks = ray.get(keys_ref)
                if batch.num_rows == 0 or (len(ks) == 0 and not anti):
                    return out_schema.empty_table()
                if len(ks) == 0:
                    return batch.select(left_cols).cast(out_schema)
                hit = pc.fill_null(
                    pc.is_in(batch.column(key), value_set=ks), False)
                return batch.filter(
                    pc.invert(hit) if anti else hit).select(
                    left_cols).cast(out_schema)

            return left.map_batches(_filter_map, batch_format="pyarrow")

    tagged = tag_union(left, right_keys, key, all_fields, num_buckets)

    def _filter_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        l = group.filter(pc.equal(side, 0)).select(left_cols)
        r_keys = group.filter(pc.equal(side, 1)).column(key).combine_chunks()
        if l.num_rows == 0:
            return out_schema.empty_table()
        if len(r_keys) == 0:
            return l.cast(out_schema) if anti else out_schema.empty_table()
        hit = pc.fill_null(
            pc.is_in(l.column(key), value_set=r_keys.unique()), False)
        return l.filter(pc.invert(hit) if anti else hit).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(_filter_bucket,
                                                 batch_format="pyarrow")


def except_distinct(left: rd.Dataset, right: rd.Dataset, key: str,
                    num_buckets: int = 32) -> rd.Dataset:
    """SQL ``EXCEPT`` on a single key column: the distinct non-null
    ``key`` values of ``left`` that never appear in ``right``.

    Both sides are reduced to per-batch-distinct keys before the exchange
    (the combiner pattern), so the shuffle carries keys only; the global
    distinct falls out of the bucket co-location (equal keys share a
    bucket) with a final ``unique`` per bucket.
    """
    left_schema = left.schema()
    key_type = dict(arrow_field_types(left_schema, [key]))[key]
    all_fields = [(key, key_type)]
    out_schema = pa.schema(all_fields)

    def _dedup_keys(batch: pa.Table) -> pa.Table:
        keys_arr = batch.column(key).combine_chunks().unique().drop_null()
        return pa.table({key: keys_arr.cast(key_type)})

    tagged = tag_union(left.map_batches(_dedup_keys, batch_format="pyarrow"),
                       right.map_batches(_dedup_keys, batch_format="pyarrow"),
                       key, all_fields, num_buckets)

    def _except_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        l_keys = group.filter(pc.equal(side, 0)).column(key) \
                      .combine_chunks().unique()
        if len(l_keys) == 0:
            return out_schema.empty_table()
        r_keys = group.filter(pc.equal(side, 1)).column(key).combine_chunks()
        if len(r_keys):
            l_keys = l_keys.filter(
                pc.invert(pc.is_in(l_keys, value_set=r_keys.unique())))
        return pa.table({key: l_keys.cast(key_type)})

    return tagged.groupby("__bucket").map_groups(_except_bucket,
                                                 batch_format="pyarrow")


def intersect_distinct(left: rd.Dataset, right: rd.Dataset, key: str,
                       num_buckets: int = 32) -> rd.Dataset:
    """SQL ``INTERSECT`` on a single key column: the distinct non-null
    ``key`` values present in BOTH sides. Same shape as
    ``except_distinct``: per-batch-distinct combiner on both sides, one
    bucket exchange, set intersection per bucket."""
    left_schema = left.schema()
    key_type = dict(arrow_field_types(left_schema, [key]))[key]
    all_fields = [(key, key_type)]
    out_schema = pa.schema(all_fields)

    def _dedup_keys(batch: pa.Table) -> pa.Table:
        keys_arr = batch.column(key).combine_chunks().unique().drop_null()
        return pa.table({key: keys_arr.cast(key_type)})

    tagged = tag_union(left.map_batches(_dedup_keys, batch_format="pyarrow"),
                       right.map_batches(_dedup_keys, batch_format="pyarrow"),
                       key, all_fields, num_buckets)

    def _intersect_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        l_keys = group.filter(pc.equal(side, 0)).column(key) \
                      .combine_chunks().unique()
        r_keys = group.filter(pc.equal(side, 1)).column(key).combine_chunks()
        if len(l_keys) == 0 or len(r_keys) == 0:
            return out_schema.empty_table()
        both = l_keys.filter(pc.is_in(l_keys, value_set=r_keys.unique()))
        return pa.table({key: both.cast(key_type)})

    return tagged.groupby("__bucket").map_groups(_intersect_bucket,
                                                 batch_format="pyarrow")


def detect_hot_keys(ds: rd.Dataset, key: str, min_count: int = 100_000,
                    top_n: int = 64) -> list:
    """The ``top_n`` key values whose row count exceeds ``min_count`` —
    the skew-detection pass for ``salted_hash_join``. A combiner
    pre-aggregation means only (key, partial_count) rows cross the wire,
    and only the tiny top-N result lands on the driver."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    counts = partial_groupby(ds, [key], {"n": (key, "count")})
    t = collect_table(counts.sort("n", descending=True).limit(top_n))
    return [k for k, n in zip(t.column(key).to_pylist(),
                              t.column("n").to_pylist()) if n >= min_count]


def salted_hash_join(left: rd.Dataset, right: rd.Dataset, key: str,
                     hot_keys: list, num_buckets: int = 32,
                     salt: int = 8, how: str = "inner") -> rd.Dataset:
    """``bucket_hash_join`` with explicit hot-key salting: rows of a hot
    key would all land in ONE bucket group (a single-task straggler at
    scale), so each hot key instead gets ``salt`` dedicated sub-buckets —
    left hot rows spread round-robin across them, right hot rows
    REPLICATE into all of them. Every (left row, right row) pair of a hot
    key meets in exactly one sub-bucket, so the output equals the unsalted
    join (randomized DuckDB-equivalence-tested under a zipf-skewed key).

    Inner/left only: an unmatched right hot row is replicated ``salt``
    times and no sub-bucket can decide unmatchedness locally, so
    right/full outer would emit duplicate null-padded rows — use
    ``bucket_hash_join`` (or pre-aggregate the hot side) for those.

    ``hot_keys`` comes from the caller or ``detect_hot_keys`` (an explicit
    pass, not magic): at 100 TB you detect once on a sample or reuse the
    previous run's histogram.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_hash_join supports inner/left only, "
                         f"not {how!r} — see docstring")
    if salt < 2:
        raise ValueError("salt must be >= 2 (salt=1 is bucket_hash_join)")
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"column collision in salted_hash_join: {overlap}")

    all_fields = arrow_field_types(left_schema, left_cols)
    all_fields += arrow_field_types(right_schema,
                                    [c for c in right_cols if c != key])
    out_schema = pa.schema(all_fields)
    join_type = _pa_join_type(how)
    hot_index = {k: i for i, k in enumerate(hot_keys)}

    def _widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {name: (batch.column(name).cast(typ)
                           if name in batch.column_names
                           else pa.nulls(n, typ))
                    for name, typ in all_fields}
            base = _key_hash(batch.column(key).combine_chunks(), num_buckets)
            keys_py = batch.column(key).to_pylist()
            hot = np.array([hot_index.get(k, -1) for k in keys_py],
                           dtype=np.int64)
            is_hot = hot >= 0
            bucket = base.astype(np.int64)
            t = pa.table(cols)
            if side == 0:
                # left hot rows: round-robin over the key's salt range
                # (any assignment is correct — the right side is in all)
                rr = np.arange(n, dtype=np.int64) % salt
                bucket = np.where(is_hot,
                                  num_buckets + hot * salt + rr, bucket)
            elif is_hot.any():
                # right hot rows: replicate into every salt sub-bucket
                hot_ix = np.flatnonzero(is_hot)
                reps = np.repeat(hot_ix, salt)
                extra = (num_buckets + hot[hot_ix].repeat(salt) * salt
                         + np.tile(np.arange(salt, dtype=np.int64),
                                   len(hot_ix)))
                # non-hot rows keep their hash bucket; hot originals are
                # dropped (they live only in their salt sub-buckets)
                keep = np.flatnonzero(~is_hot)
                take = np.concatenate([keep, reps])
                bucket = np.concatenate([bucket[keep], extra])
                t = t.take(pa.array(take, pa.int64()))
            return (t.append_column("__bucket",
                                    pa.array(bucket, pa.int32()))
                     .append_column("__side",
                                    pa.array(np.full(t.num_rows, side,
                                                     dtype=np.int8))))
        return fn

    tagged = left.map_batches(_widen(0), batch_format="pyarrow").union(
        right.map_batches(_widen(1), batch_format="pyarrow"))
    out_cols = [n for n, _ in all_fields]

    def _join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        l = group.filter(pc.equal(side, 0)).select(left_cols)
        r = group.filter(pc.equal(side, 1)).select(
            [key] + [c for c in right_cols if c != key])
        if ((join_type == "inner" and (l.num_rows == 0 or r.num_rows == 0))
                or l.num_rows == 0):
            return out_schema.empty_table()
        joined = l.join(r, keys=key, join_type=join_type)
        return joined.select(out_cols).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(_join_bucket,
                                                 batch_format="pyarrow")


def bloom_prefiltered_join(left: rd.Dataset, right: rd.Dataset, key: str,
                           num_buckets: int = 32,
                           n_bits: int = 1 << 22) -> rd.Dataset:
    """INNER ``bucket_hash_join`` with a Bloom pre-filter: a compact
    bitmap of the right side's keys is OR-folded in the workers,
    broadcast once, and tested against every LEFT row BEFORE the
    exchange — the classic shuffle-volume reducer when most left rows
    have no match (fact table ⋈ selective dimension). ALWAYS exact for
    inner joins: a false positive merely ships a row that then joins to
    nothing; false negatives never happen. Left/outer joins must keep
    unmatched left rows, so they cannot prefilter — use
    ``bucket_hash_join``.

    Key hashing is pandas ``hash_array(categorize=False)`` — vectorized,
    process-stable siphash for both int and string keys."""
    import pandas as pd

    from raydoc.functions._collect import collect_table
    from raydoc.functions.dedup import _bloom_positions

    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")

    def _key_hashes(batch: pa.Table) -> np.ndarray:
        # keep the arrow type intact before hashing: .to_pandas() on an
        # int column WITH NULLS would promote to float64 and
        # hash_array(1.0) != hash_array(1) — silently poisoning every
        # key in the batch. Nulls map to a sentinel instead (a null key
        # never equi-matches, so at worst a false positive ships a row
        # that joins to nothing — exactness preserved).
        arr = batch.column(key).combine_chunks()
        if arr.null_count:
            sentinel = 0 if pa.types.is_integer(arr.type) else ""
            arr = arr.fill_null(sentinel)
        vals = arr.to_numpy(zero_copy_only=False)
        return pd.util.hash_array(vals, categorize=False)

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        hs = _key_hashes(t)
        if len(hs):
            pos = _bloom_positions(hs, n_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_bits // 8, dtype=np.uint8)
        for blob in t.column("bloom").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    parts = right.map_batches(partial, batch_format="pyarrow")
    for _ in range(2):
        parts = parts.map_batches(fold, batch_format="pyarrow",
                                  batch_size=64)
    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for blob in collect_table(parts).column("bloom").to_pylist():
        acc |= np.frombuffer(blob, dtype=np.uint8)
    bloom_ref = ray.put(acc)

    def prefilter(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        hs = _key_hashes(t)
        if not len(hs):
            return t
        pos = _bloom_positions(hs, n_bits)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return t.filter(pa.array(hit.all(axis=1)))

    return bucket_hash_join(left.map_batches(prefilter,
                                             batch_format="pyarrow"),
                            right, key, num_buckets=num_buckets,
                            how="inner")


def merge_upsert(base: rd.Dataset, updates: rd.Dataset, key: str,
                 version_col: str, num_buckets: int = 32,
                 tiebreak: list[str] | None = None) -> rd.Dataset:
    """Last-writer-wins merge (the CDC/lakehouse UPSERT): one row per
    ``key``, the one with the highest ``version_col`` across base ∪
    updates; an equal-version tie goes to the UPDATES side. Two
    same-side rows tying on (key, version) resolve by the optional
    ``tiebreak`` columns (descending) — without it such duplicates pick
    an arbitrary (block-order-dependent) survivor, so streams that can
    repeat (key, version) should pass one. Both sides must share a
    schema.

    Shape: pad+tag union (the shared keyed-two-sided machinery), one
    bucket exchange, vectorized per-bucket keep-max — the merge-on-read
    compaction shape; at 100 TB the bucket count is the parallelism knob
    and hot keys salt like any bucketed reduce."""
    schema = base.schema()
    all_fields = arrow_field_types(schema, schema.names)
    tagged = tag_union(base, updates, key, all_fields, num_buckets)
    out_names = [n for n, _ in all_fields]
    sort_cols = [key, version_col, "__side"] + list(tiebreak or [])

    def keep_latest(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(sort_cols,
                          ascending=[True] + [False] * (len(sort_cols) - 1),
                          kind="stable", ignore_index=True)
        return g.drop_duplicates(key)[out_names]

    return tagged.groupby("__bucket").map_groups(keep_latest,
                                                 batch_format="pandas")


def auto_join(left: rd.Dataset, right: rd.Dataset, key: str,
              how: str = "inner", num_buckets: int = 32,
              broadcast_max_rows: int = 4_000_000,
              hot_keys: list | None = None,
              detect_skew: bool = False,
              hot_min_count: int = 100_000) -> rd.Dataset:
    """Strategy-picking join facade — the optimizer decision, made
    explicit and cheap:

    1. right side ≤ ``broadcast_max_rows`` and how is inner/left →
       ``broadcast_join`` (one ray.put, zero shuffles);
    2. known-or-detected hot keys and how is inner/left →
       ``salted_hash_join`` (hot keys fan into dedicated sub-buckets);
    3. otherwise → ``bucket_hash_join``.

    ``right.count()`` is one metadata/count pass. Skew detection is an
    EXPLICIT extra combiner pass over the left side (``detect_skew=True``)
    or a caller-provided ``hot_keys`` list (the 100 TB pattern: detect
    once on a sample or reuse the previous run's histogram — see
    ``detect_hot_keys``)."""
    from raydoc.functions._collect import collect_table

    right = right.materialize()     # count + reuse from ONE execution
    n_right = right.count()
    if n_right <= broadcast_max_rows and how in ("inner", "left"):
        return broadcast_join(left, collect_table(right), key, how=how)
    if how in ("inner", "left"):    # salting applies to these only —
        if hot_keys is None and detect_skew:   # never scan left for naught
            hot_keys = detect_hot_keys(left, key, min_count=hot_min_count)
        if hot_keys:
            return salted_hash_join(left, right, key, hot_keys,
                                    num_buckets=num_buckets, how=how)
    return bucket_hash_join(left, right, key, num_buckets=num_buckets,
                            how=how)


def _multiset_op(left: rd.Dataset, right: rd.Dataset, key: str,
                 mode: str, num_buckets: int) -> rd.Dataset:
    """Shared machinery for SQL ``INTERSECT ALL`` / ``EXCEPT ALL`` on a
    single key column (bag semantics: a key appears min(l, r) times for
    intersect, max(l - r, 0) times for except — NULLs never match, SQL
    convention). Both sides collapse to per-batch (key, count) partials
    BEFORE the exchange (the combiner pattern — the shuffle carries one
    row per distinct key per batch, never the row stream), counts fold
    per bucket, and the surviving multiplicities re-expand with one
    vectorized ``take``."""
    left_schema = left.schema()
    key_type = dict(arrow_field_types(left_schema, [key]))[key]
    all_fields = [(key, key_type), ("cnt", pa.int64())]
    out_schema = pa.schema([(key, key_type)])

    def _count_keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:    # empty Ray blocks carry an EMPTY schema
            return pa.table({key: pa.array([], key_type),
                             "cnt": pa.array([], pa.int64())})
        g = (batch.select([key]).drop_null()
             .group_by([key]).aggregate([(key, "count")]))
        return pa.table({key: g.column(key).cast(key_type),
                         "cnt": g.column(f"{key}_count").cast(pa.int64())})

    tagged = tag_union(
        left.map_batches(_count_keys, batch_format="pyarrow"),
        right.map_batches(_count_keys, batch_format="pyarrow"),
        key, all_fields, num_buckets)

    def _expand_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        sides = []
        for s in (0, 1):
            part = group.filter(pc.equal(side, s)).select([key, "cnt"])
            sides.append(part.group_by([key]).aggregate([("cnt", "sum")]))
        l, r = sides
        j = l.join(r, keys=key, join_type="left outer",
                   right_suffix="_r")
        lc = j.column("cnt_sum").to_numpy(zero_copy_only=False)
        rc = np.nan_to_num(
            j.column("cnt_sum_r").to_numpy(zero_copy_only=False), nan=0.0
        ).astype(np.int64)
        if mode == "intersect":
            copies = np.minimum(lc, rc)
        else:
            copies = np.maximum(lc - rc, 0)
        keep = copies > 0
        if not keep.any():
            return out_schema.empty_table()
        total = int(copies[keep].sum())
        if total > 50_000_000:
            raise ValueError(
                f"multiset {mode} would expand {total} rows in one "
                "bucket (a hot key dominates); raise num_buckets or "
                "pre-aggregate the hot key")
        idx = np.repeat(np.flatnonzero(keep), copies[keep])
        keys_out = j.column(key).combine_chunks().take(pa.array(idx))
        return pa.table({key: keys_out.cast(key_type)})

    return tagged.groupby("__bucket").map_groups(_expand_bucket,
                                                 batch_format="pyarrow")


def intersect_all(left: rd.Dataset, right: rd.Dataset, key: str,
                  num_buckets: int = 32) -> rd.Dataset:
    """SQL ``INTERSECT ALL`` on a single key column — see _multiset_op."""
    return _multiset_op(left, right, key, "intersect", num_buckets)


def except_all(left: rd.Dataset, right: rd.Dataset, key: str,
               num_buckets: int = 32) -> rd.Dataset:
    """SQL ``EXCEPT ALL`` on a single key column — see _multiset_op."""
    return _multiset_op(left, right, key, "except", num_buckets)


def scd2_history(versions: rd.Dataset, key: str, version_col: str,
                 num_buckets: int = 32) -> rd.Dataset:
    """Slowly-changing-dimension (type 2) history build: given versioned
    rows (``key``, attrs, ``version_col``), emit every version with its
    validity range — ``valid_to`` = next version − 1, NULL for the
    current row — the warehouse dimension-history operator
    (merge_upsert's keep-all complement).

    Scale shape: ONE coarse key-hash-bucket exchange (a key's versions
    co-locate; a bucket holds many complete keys), then a per-bucket
    vectorized sort + per-key shift. Version count per key bounds the
    task, never the bucket count."""
    import pandas as pd

    left_schema = versions.schema()
    mask = num_buckets - 1

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.schema(
                arrow_field_types(left_schema, list(left_schema.names))
                + [("__bucket", pa.int32())]).empty_table()
        keycol = t.column(key)
        if isinstance(keycol, pa.ChunkedArray):
            keycol = keycol.combine_chunks()
        return t.append_column(
            "__bucket", pa.array(_key_hash(keycol, num_buckets), pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, version_col], ignore_index=True)
        nxt = g.groupby(key, sort=False)[version_col].shift(-1)
        # float64 (NULL -> NaN), not pandas Int64: the nullable-int
        # extension dtype rides the Arrow pandas metadata and flips the
        # column back to Int64 on every later to_pandas()
        g["valid_to"] = (nxt - 1).astype("float64")
        return g.drop(columns=["__bucket"])

    return versions.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def snapshot_diff(base: rd.Dataset, new: rd.Dataset, key: str,
                  compare_cols: list[str],
                  num_buckets: int = 32) -> rd.Dataset:
    """Keyed diff of two table snapshots → one row per differing key:
    ``(key, change ∈ added|removed|changed, old_<c>…, new_<c>…)`` —
    the reverse-CDC operator (what changed between two lake snapshots),
    complementing merge_upsert (which APPLIES a change stream).

    Shape: ONE tag_union bucket exchange on the key (both snapshots
    stream; nothing materializes driver-side); per bucket an Arrow
    full-outer hash join + vectorized null-safe column comparison.
    Unchanged keys — the overwhelming majority between real snapshots —
    are dropped inside the bucket task, so the output is change-sized,
    not snapshot-sized."""
    base_schema = base.schema()
    key_t = dict(arrow_field_types(base_schema, [key]))[key]
    cmp_t = dict(arrow_field_types(base_schema, compare_cols))

    old_names = {c: f"old_{c}" for c in compare_cols}
    new_names = {c: f"new_{c}" for c in compare_cols}

    def _rename(names: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 and key not in t.schema.names:
                return pa.table(
                    {key: pa.array([], key_t),
                     **{names[c]: pa.array([], cmp_t[c])
                        for c in compare_cols}})
            return t.select([key] + compare_cols).rename_columns(
                [key] + [names[c] for c in compare_cols])
        return fn

    all_fields = [(key, key_t)] \
        + [(old_names[c], cmp_t[c]) for c in compare_cols] \
        + [(new_names[c], cmp_t[c]) for c in compare_cols]

    tagged = tag_union(base.map_batches(_rename(old_names),
                                        batch_format="pyarrow"),
                       new.map_batches(_rename(new_names),
                                       batch_format="pyarrow"),
                       key, all_fields, num_buckets)

    out_fields = [(key, key_t), ("change", pa.string())] \
        + [(old_names[c], cmp_t[c]) for c in compare_cols] \
        + [(new_names[c], cmp_t[c]) for c in compare_cols]
    out_schema = pa.schema(out_fields)

    def _diff_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        l = group.filter(pc.equal(side, 0)).select(
            [key] + [old_names[c] for c in compare_cols])
        r = group.filter(pc.equal(side, 1)).select(
            [key] + [new_names[c] for c in compare_cols])
        if l.num_rows == 0 and r.num_rows == 0:
            return out_schema.empty_table()
        l = l.append_column("__inb", pa.array(
            np.ones(l.num_rows, dtype=np.int8)))
        r = r.append_column("__inn", pa.array(
            np.ones(r.num_rows, dtype=np.int8)))
        j = l.join(r, keys=key, join_type="full outer")
        inb = pc.is_valid(j["__inb"])
        inn = pc.is_valid(j["__inn"])
        differs = pa.chunked_array([pa.array(
            np.zeros(j.num_rows, dtype=bool))])
        for c in compare_cols:
            a, b = j[old_names[c]], j[new_names[c]]
            d = pc.or_(pc.fill_null(pc.not_equal(a, b), False),
                       pc.xor(pc.is_null(a), pc.is_null(b)))
            differs = pc.or_(differs, d)
        keep = pc.or_(pc.or_(pc.invert(inb), pc.invert(inn)), differs)
        j = j.filter(keep)
        inb = pc.is_valid(j["__inb"])
        inn = pc.is_valid(j["__inn"])
        change = pc.if_else(
            pc.invert(inb), pa.scalar("added"),
            pc.if_else(pc.invert(inn), pa.scalar("removed"),
                       pa.scalar("changed")))
        cols = {key: j[key], "change": change}
        for c in compare_cols:
            cols[old_names[c]] = j[old_names[c]]
        for c in compare_cols:
            cols[new_names[c]] = j[new_names[c]]
        return pa.table(cols).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(_diff_bucket,
                                                 batch_format="pyarrow")


def apply_changes(base: rd.Dataset, changes: rd.Dataset, key: str,
                  version_col: str, op_col: str,
                  num_buckets: int = 32) -> rd.Dataset:
    """Lakehouse MERGE / CDC-feed apply with DELETES — the tombstone
    completion of ``merge_upsert``: ``changes`` carries full rows plus
    ``op_col`` ('I'/'U'/'D') and ``version_col``; per key the
    highest-version change wins ('U'/'I' replace-or-insert the payload,
    'D' removes the key), keys without changes keep their base row.
    ONE key-bucket exchange (tag_union); per bucket: vectorized argmax-
    version winner per key, anti-filter of the base slice, concat with
    the non-tombstone winners. Change payload columns must match the
    base schema; ties on version are broken by op desc ('U' > 'I' >
    'D' is NOT assumed — give changes unique versions per key, the
    deterministic contract of every CDC feed)."""
    base_schema = base.schema()
    base_cols = list(base_schema.names)
    all_fields = arrow_field_types(base_schema, base_cols)
    all_fields += [(version_col, pa.int64()), (op_col, pa.string())]
    out_schema = pa.schema(arrow_field_types(base_schema, base_cols))

    # tag_union's _widen null-pads the version/op columns missing from
    # base batches — no separate widen pass over the base table needed
    tagged = tag_union(base, changes, key, all_fields, num_buckets)

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        b = group.filter(pc.equal(side, 0)).select(base_cols)
        c = group.filter(pc.equal(side, 1))
        if c.num_rows == 0:
            return b.cast(out_schema)
        win = c.group_by(key).aggregate([(version_col, "max")]) \
               .rename_columns([key, version_col])
        cw = c.join(win, keys=[key, version_col], join_type="inner")
        keys_changed = cw.column(key).combine_chunks().unique()
        if b.num_rows:
            keep = pc.invert(pc.fill_null(
                pc.is_in(b.column(key), value_set=keys_changed), False))
            b = b.filter(keep)
        live = cw.filter(pc.not_equal(cw[op_col], "D")) \
                 .select(base_cols).cast(out_schema)
        return pa.concat_tables([b.cast(out_schema), live])

    return tagged.groupby("__bucket").map_groups(per_bucket,
                                                 batch_format="pyarrow")
