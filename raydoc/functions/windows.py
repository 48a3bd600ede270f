"""Windowed / sessionized aggregates over the events stream table.

Ray Data has no event-time windows; these implement the guide's pattern:
tumbling windows are a grouped aggregate on a truncated-timestamp key
(with per-batch partial aggregation), sessions are per-key
``groupby(user_id).map_groups`` over ts-sorted groups. Both have exact SQL
oracles (counts/min/max only — order-insensitive)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raydoc.functions._collect import collect_table

from raydoc.functions.agg import partial_groupby


def hourly_event_stats(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows per event_type: count / min / max of value."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "event_type": t["event_type"],
            "value": t["value"],
        })

    out = partial_groupby(ds.map_batches(prep, batch_format="pyarrow"),
                          ["window_start", "event_type"], {
                              "n_events": ("value", "count"),
                              "min_value": ("value", "min"),
                              "max_value": ("value", "max"),
                          })
    t = collect_table(out)
    # pin to µs precision (pandas round-trips as ns; DuckDB emits µs — keep
    # the driver's arrow-level compare precision-stable)
    t = t.set_column(t.schema.get_field_index("window_start"), "window_start",
                     t.column("window_start").cast(pa.timestamp("us")))
    return t.sort_by([("window_start", "ascending"),
                      ("event_type", "ascending")])


def hourly_distinct_users(sf_dir: str) -> pa.Table:
    """(window_start, n_users): DISTINCT users per tumbling hour — the
    windowed distinct-count. Two combiner passes: batch-local dedup of
    (hour, user) pairs (shuffle volume bounded by true per-batch
    cardinality), then a per-hour count of the co-located distinct
    pairs. The HLL twin for the approximate regime is
    ``sketches.distinct_users_by_type_hll``'s shape."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        # projection only — partial_groupby's combiner does the
        # batch-local (hour, user) dedup; grouping here too would be
        # the same work twice
        return pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "user_id": t["user_id"],
        })

    pairs = partial_groupby(ds.map_batches(prep, batch_format="pyarrow"),
                            ["window_start", "user_id"],
                            {"__n": ("user_id", "count")})
    out = partial_groupby(pairs, ["window_start"],
                          {"n_users": ("user_id", "count")})
    t = collect_table(out)
    t = t.set_column(t.schema.get_field_index("window_start"),
                     "window_start",
                     t.column("window_start").cast(pa.timestamp("us")))
    return t.sort_by("window_start")


def incremental_hourly_stats(sf_dir: str) -> pa.Table:
    """``hourly_event_stats`` built INCREMENTALLY — the materialized-view
    refresh: the "historical" slice (event_id % 5 != 0) is aggregated
    once, then the "new shipment" slice (event_id % 5 == 0) merges in via
    ``agg.incremental_groupby`` — base raw rows are never rescanned, only
    the base AGGREGATE refolds with the delta's combiner output. The SQL
    twin is the plain full-table aggregate, so the oracle proves refresh
    ≡ recompute."""
    from raydoc.functions.agg import incremental_groupby

    spec = {"n_events": ("value", "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max")}

    def slice_ds(keep_delta: bool) -> rd.Dataset:
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "event_type",
                                      "value"])

        def prep(t: pa.Table) -> pa.Table:
            eid = t["event_id"]
            mod = pc.subtract(eid, pc.multiply(pc.divide(eid, 5),
                                               pa.scalar(5, pa.int64())))
            mask = pc.equal(mod, 0) if keep_delta \
                else pc.not_equal(mod, 0)
            t = t.filter(mask)
            return pa.table({
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                "event_type": t["event_type"],
                "value": t["value"],
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    base_agg = partial_groupby(slice_ds(False),
                               ["window_start", "event_type"], spec)
    out = incremental_groupby(base_agg, slice_ds(True),
                              ["window_start", "event_type"], spec)
    t = collect_table(out)
    t = t.set_column(t.schema.get_field_index("window_start"),
                     "window_start",
                     t.column("window_start").cast(pa.timestamp("us")))
    return t.sort_by([("window_start", "ascending"),
                      ("event_type", "ascending")])


def sessionize(sf_dir: str, gap_minutes: int = 30,
               num_buckets: int | None = None) -> pa.Table:
    """(user_id, n_sessions, n_events): a new session starts when the gap
    to the previous event of the same user exceeds ``gap_minutes``. Ordering
    inside a user is (ts, event_id) — deterministic under ts ties."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t.column("user_id"), mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse bucket (many complete users) per call; the session
        scan is a vectorized sort + diff over the whole block."""
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_session = new_user.copy()
        if len(g) > 1:
            new_session[1:] |= np.diff(ts) > gap
        df = pd.DataFrame({"user_id": uid, "s": new_session.astype(np.int64)})
        agg = df.groupby("user_id", sort=True).agg(
            n_sessions=("s", "sum"), n_events=("s", "size")).reset_index()
        return agg

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    t = collect_table(out)
    return t.sort_by("user_id")


def events_with_prev(sf_dir: str, num_buckets: int | None = None) -> pa.Table:
    """(event_id, user_id, prev_event_id): each event joined to the previous
    event of the same user under (ts, event_id) ordering — the lag / as-of
    pattern: coarse-bucket the users, one vectorized sort + shift per block
    (no per-user micro-groups). Oracle: LAG() OVER."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        prev = np.empty(len(g), dtype=object)
        prev[0] = None
        prev[1:] = np.where(uid[1:] == uid[:-1], eid[:-1], None)
        return pd.DataFrame({"event_id": eid, "user_id": uid,
                             "prev_event_id": prev})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    t = collect_table(out)
    return t.set_column(
        t.schema.get_field_index("prev_event_id"), "prev_event_id",
        t.column("prev_event_id").cast(pa.int64())).sort_by("event_id")


def user_running_value(sf_dir: str,
                       num_buckets: int | None = None) -> pa.Table:
    """(event_id, user_id, running_cents): per-user cumulative sum of the
    event value under (ts, event_id) ordering — the running-total window
    aggregate. Values sum as integer cents so accumulation order can never
    perturb the result (bit-identical to SUM() OVER in SQL).

    Same scale shape as ``events_with_prev``: coarse-bucket the users so a
    block holds many complete users, one vectorized sort + segmented
    cumsum per block — no per-user micro-groups, no global sort."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()))
        return t.drop_columns(["value"]).append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        cum = g["cents"].to_numpy().cumsum()
        uid = g["user_id"].to_numpy()
        # subtract each user's preceding-segment total (segmented cumsum;
        # np.repeat, not maximum.accumulate — cents may be negative)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg_base = np.zeros(len(starts), dtype=np.int64)
        seg_base[1:] = cum[starts[1:] - 1]
        base = np.repeat(seg_base, np.diff(np.r_[starts, len(g)]))
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": uid,
                             "running_cents": cum - base})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    return collect_table(out).sort_by("event_id")


def sliding_event_stats(sf_dir: str) -> pa.Table:
    """Sliding window (60-min window, 30-min slide): each event belongs to
    exactly two windows (its 30-min bucket's window and the previous one),
    so the op is an explode-by-2 inside map_batches + a combiner groupby —
    no cross-row state. Oracle: the same bucket arithmetic in SQL."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    half = 30 * 60 * 1_000_000   # 30 min in µs

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        bucket = pc.multiply(pc.divide(us, half), half)   # floor to 30 min
        prev = pc.subtract(bucket, half)
        starts = pa.concat_arrays([
            pc.cast(bucket, pa.timestamp("us")).combine_chunks(),
            pc.cast(prev, pa.timestamp("us")).combine_chunks(),
        ])
        return pa.table({"window_start": starts,
                         "one": pa.array([1] * len(starts), pa.int64())})

    out = partial_groupby(ds.map_batches(explode, batch_format="pyarrow"),
                          ["window_start"], {"n_events": ("one", "count")})
    t = collect_table(out)
    t = t.set_column(t.schema.get_field_index("window_start"), "window_start",
                     t.column("window_start").cast(pa.timestamp("us")))
    return t.sort_by("window_start")


def value_percentiles(sf_dir: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
                      ) -> pa.Table:
    """(q, value): EXACT percentiles of events.value by rank-element
    semantics (1-based rank = floor((n−1)·q)+1 under (value, event_id)
    order — deterministic under value ties, bit-identical in SQL).

    Distributed shape: ONE global sort (Ray's sample-based range
    partitioning), then ``split_at_indices`` at the precomputed ranks —
    only the first row of each split is fetched; no full materialization
    on the driver."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value", "event_id"])
    n = ds.count()
    idxs = [int((n - 1) * q) for q in qs]
    # duplicate rank indices (small n) would yield EMPTY splits — split at
    # the unique ranks and map each q back to its (possibly shared) value
    uniq = sorted(set(idxs))
    splits = ds.sort(["value", "event_id"]).split_at_indices(uniq)
    at_rank = {ix: splits[i + 1].take(1)[0]["value"]
               for i, ix in enumerate(uniq)}
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array([at_rank[ix] for ix in idxs],
                                       pa.float64())})


def funnel_counts(sf_dir: str, num_buckets: int | None = None) -> pa.Table:
    """(stage_idx, stage, n_users) for the view → click → purchase funnel:
    users with a view, users with a click at-or-after their first view,
    users with a purchase at-or-after that first qualifying click — the
    ordered-sequence (funnel) analysis of an event pipeline.

    Scale shape: the read keeps only the three funnel event types; users
    are coarse-bucketed so each shuffle group holds many complete users;
    each stage inside a bucket is a vectorized pandas groupby-min +
    merge (no per-user Python loop); buckets emit 3 partial counts each
    and only B×3 tiny rows reach the final combine."""
    from raydoc.functions._buckets import reduce_bucket_count

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              pa.array(["view", "click", "purchase"])))
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = (g[g["event_type"] == "view"]
             .groupby("user_id", sort=False)["ts"].min().rename("t_view"))
        c = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = (c[c["ts"] >= c["t_view"]]
             .groupby("user_id", sort=False)["ts"].min().rename("t_click"))
        p = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = (p[p["ts"] >= p["t_click"]]
             .groupby("user_id", sort=False)["ts"].min())
        return pd.DataFrame({"stage_idx": [0, 1, 2],
                             "n": [len(v), len(c), len(p)]})

    partials = (ds.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas"))
    agg = collect_table(partial_groupby(
        partials, ["stage_idx"], {"n_users": ("n", "sum")})).sort_by(
        "stage_idx")
    names = {0: "view", 1: "click", 2: "purchase"}
    return pa.table({
        "stage_idx": agg.column("stage_idx").cast(pa.int64()),
        "stage": pa.array([names[i] for i in
                           agg.column("stage_idx").to_pylist()], pa.string()),
        "n_users": agg.column("n_users").cast(pa.int64()),
    })


def _global_min_max(ds: rd.Dataset, col: str) -> tuple[float, float]:
    """(min, max) of a column via one combiner pass (per-batch partial
    extremes under a constant key, tiny final fold) — the shared stats
    pass for the range-bucketing operators below."""
    mm = collect_table(partial_groupby(
        ds.map_batches(lambda t: pa.table({"k": pa.array([0] * t.num_rows,
                                                         pa.int8()),
                                           col: t[col]}),
                       batch_format="pyarrow"),
        ["k"], {"lo": (col, "min"), "hi": (col, "max")}))
    return mm.column("lo")[0].as_py(), mm.column("hi")[0].as_py()


def global_rank_ntile(sf_dir: str, n_tiles: int = 4,
                      num_buckets: int = 64) -> pa.Table:
    """(event_id, rn, tile): exact global ROW_NUMBER (1-based) and
    NTILE(``n_tiles``) over the total order (value, event_id) — the
    quantile-bucketing primitive (perplexity binning, difficulty tiers)
    as a distributed dense rank.

    Shape (no global sort): rows go to ORDER-PRESERVING range buckets cut
    linearly between the observed min/max value (cut choice affects only
    balance, never the output — order within and between buckets is
    exact); a combiner pass counts each bucket; the driver exclusive-scans
    the B bucket counts into per-bucket base ranks (B rows, never data
    rows); each bucket then sorts locally and adds its base — the same
    prefix-sum decomposition as ``pack_sequences``. NTILE follows SQL
    semantics: the first n % k tiles take ceil(n/k) rows."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    lo, hi = _global_min_max(ds, "value")
    cuts = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(np.searchsorted(cuts, v, side="right")
                               .astype(np.int32)))

    bucketed = ds.map_batches(add_bucket,
                              batch_format="pyarrow").materialize()
    counts = collect_table(partial_groupby(
        bucketed, ["bucket"], {"cnt": ("value", "count")})).sort_by("bucket")
    bids = counts.column("bucket").to_pylist()
    cnts = counts.column("cnt").to_pylist()
    n = int(sum(cnts))
    bases = dict(zip(bids, np.concatenate(
        ([0], np.cumsum(cnts)[:-1])).astype(np.int64)))

    size_small = n // n_tiles
    n_big = n % n_tiles

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ignore_index=True)
        r0 = bases[int(g["bucket"].iloc[0])] + np.arange(len(g),
                                                         dtype=np.int64)
        big_span = n_big * (size_small + 1)
        tile = np.where(
            r0 < big_span,
            r0 // (size_small + 1) + 1,
            (r0 - big_span) // max(size_small, 1) + n_big + 1)
        return pd.DataFrame({"event_id": g["event_id"],
                             "rn": r0 + 1,
                             "tile": tile.astype(np.int64)})

    out = bucketed.groupby("bucket").map_groups(per_bucket,
                                                batch_format="pandas")
    return collect_table(out).sort_by("event_id")


def median_by_type(sf_dir: str, q: float = 0.5,
                   num_buckets: int = 256) -> pa.Table:
    """(event_type, median_value): EXACT per-group quantile (rank-element
    semantics, 0-based rank floor((n_g−1)·q) in value order — DuckDB
    ``quantile_disc`` convention) WITHOUT putting any group in one task.
    See ``_exact_group_quantile`` for the two-pass selection shape."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    med = _exact_group_quantile(ds, q, num_buckets)
    out_g = sorted(med)
    return pa.table({"event_type": pa.array(out_g, pa.string()),
                     "median_value": pa.array([med[g] for g in out_g],
                                              pa.float64())})


def value_mad_by_type(sf_dir: str, q: float = 0.5,
                      num_buckets: int = 256) -> pa.Table:
    """(event_type, mad_value): per-group MEDIAN ABSOLUTE DEVIATION —
    the robust spread statistic — as a two-LEVEL exact distributed
    selection: level 1 selects each group's exact median (two passes),
    the tiny per-group median table broadcasts into a derived
    ``|value − median|`` stream, and level 2 runs the same selection on
    the deviations. Four bounded passes total, no group ever in one
    task; deviations are single float subtractions (no summation-order
    hazard), so the DuckDB twin hashes identically."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    med = _exact_group_quantile(ds, q, num_buckets)

    med_types = sorted(med)
    med_arr = pa.table({
        "event_type": pa.array(med_types, pa.string()),
        "__med": pa.array([med[g] for g in med_types], pa.float64())})
    import ray as _ray
    med_ref = _ray.put(med_arr)

    def derive(t: pa.Table) -> pa.Table:
        m = _ray.get(med_ref)
        j = t.join(m, keys="event_type", join_type="inner")
        return pa.table({
            "event_type": j["event_type"],
            "value": pc.abs(pc.subtract(j["value"], j["__med"]))})

    # materialize: level 2's min/max pass AND its bucketed pass both
    # consume the derived stream — without this the broadcast join and
    # the parquet read would run twice
    dev = ds.map_batches(derive, batch_format="pyarrow").materialize()
    mad = _exact_group_quantile(dev, q, num_buckets)
    out_g = sorted(mad)
    return pa.table({"event_type": pa.array(out_g, pa.string()),
                     "mad_value": pa.array([mad[g] for g in out_g],
                                           pa.float64())})


def _exact_group_quantile(ds: "rd.Dataset", q: float,
                          num_buckets: int) -> dict[str, float]:
    """EXACT per-group quantile (DuckDB ``quantile_disc`` rank-element
    semantics) over a (event_type, value) Dataset → {group: value}.
    Rank rule: EXACT ceil(q·n) − 1 (0-based), with q the exact DECIMAL
    the SQL literal denotes (never binary-double q·n — 0.9·10 must be
    exactly 9). At q=0.5 this coincides with floor((n−1)/2), which is
    why the median agreed under the previous floor((n−1)·q) formula —
    p90 exposed the difference (n=5 → rank 4, not 3).
    Selection shape: see ``_exact_group_rank_elements``."""
    from fractions import Fraction
    qf = Fraction(str(q))

    def ranks_of(n_g: int) -> list[int]:
        return [max(0, -((-n_g * qf.numerator) // qf.denominator) - 1)]

    counts, elems = _exact_group_rank_elements(ds, ranks_of, num_buckets)
    return {g: elems[g][ranks_of(counts[g])[0]] for g in elems}


def _exact_group_rank_elements(
        ds: "rd.Dataset", ranks_of, num_buckets: int,
) -> tuple[dict[str, int], dict[str, dict[int, float]]]:
    """EXACT per-group order statistics over a (event_type, value)
    Dataset WITHOUT putting any group in one task: for each group g
    with n_g rows, fetch the 0-based ranks ``ranks_of(n_g)`` in value
    order → ({g: n_g}, {g: {rank: value}}).

    Two-pass distributed selection (the scale-exact complement to the
    DDSketch per-group quantiles): pass A counts (group, value-range
    bucket) cells with a combiner — only G×B tiny count rows reach the
    driver, which locates each requested rank's target bucket and the
    rank within it; pass B fetches ONLY the target buckets (≈ n/B of
    the data per group) and selects the exact elements. The range grid
    is PER GROUP (each group's own observed [min, max] cut into B
    linear buckets): groups whose value ranges differ by orders of
    magnitude — e.g. µs timestamps vs counts melted into one stream
    (RFM) — would each collapse into one bucket of a global grid,
    degrading pass B to a whole-group driver fetch. Cut choice affects
    only balance, never the output (selection is exact under any
    order-preserving bucketing). A pathological bucket (all of a
    group's mass on one value) degrades to that bucket's size —
    recurse with finer cuts inside the bucket if that matters."""
    gmm = collect_table(partial_groupby(
        ds, ["event_type"],
        {"lo": ("value", "min"), "hi": ("value", "max")}))
    if gmm.num_rows == 0 or "event_type" not in gmm.schema.names:
        return {}, {}
    lo_map = dict(zip(gmm.column("event_type").to_pylist(),
                      (float(x) for x in gmm.column("lo").to_pylist())))
    hi_map = dict(zip(gmm.column("event_type").to_pylist(),
                      (float(x) for x in gmm.column("hi").to_pylist())))
    nb = num_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64()),
                             "bucket": pa.array([], pa.int32())})
        g = t.column("event_type").to_pandas()
        lo = g.map(lo_map).to_numpy(dtype=np.float64)
        hi = g.map(hi_map).to_numpy(dtype=np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(span > 0, (v - lo) / span, 0.0)
        b = np.clip((frac * nb).astype(np.int64), 0, nb - 1)
        return pa.table({
            "event_type": t["event_type"],
            "value": t["value"],
            "bucket": pa.array(b.astype(np.int32)),
        })

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow") \
                 .materialize()
    cells = collect_table(partial_groupby(
        bucketed, ["event_type", "bucket"],
        {"cnt": ("value", "count")})).to_pandas() \
        .sort_values(["event_type", "bucket"])

    # (group, bucket) -> [(global_rank, rank_within_bucket), ...]
    targets: dict[tuple[str, int], list[tuple[int, int]]] = {}
    counts: dict[str, int] = {}
    for g, sub in cells.groupby("event_type", sort=True):
        cnts = sub["cnt"].to_numpy(dtype=np.int64)
        bks = sub["bucket"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n_g = int(cum[-1])
        counts[g] = n_g
        for k in ranks_of(n_g):
            i = int(np.searchsorted(cum, k, side="right"))
            local = int(k) - (int(cum[i - 1]) if i else 0)
            targets.setdefault((g, int(bks[i])), []).append((int(k),
                                                             local))

    keep = set(targets)

    def only_targets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        mi = pd.MultiIndex.from_arrays(
            [t.column("event_type").to_pandas(),
             t.column("bucket").to_pandas()])
        return t.filter(pa.array(mi.isin(keep)))

    picked = collect_table(
        bucketed.map_batches(only_targets,
                             batch_format="pyarrow")).to_pandas()
    elems: dict[str, dict[int, float]] = {}
    for (g, b), wanted in targets.items():
        sel = picked[(picked["event_type"] == g)
                     & (picked["bucket"] == b)]
        vals = np.sort(sel["value"].to_numpy())
        for k, local_k in wanted:
            elems.setdefault(g, {})[k] = float(vals[local_k])
    return counts, elems


def cohort_retention(sf_dir: str) -> pa.Table:
    """(cohort_day, day_offset, n_users): classic cohort/retention matrix —
    users grouped by their first-activity day (epoch days, integer), and
    for each later day-offset the count of distinct cohort users active
    then. All-integer (epoch_us // 86400e6), so the SQL twin hashes
    identically.

    Shape — ONE data exchange: batches reduce to their distinct
    (user, day) pairs, then users coarse-bucket (hash of user_id) so a
    bucket holds many COMPLETE users; per bucket a vectorized pandas pass
    dedups (user, day), derives each user's cohort (min day) with a
    groupby-transform, and counts distinct users per
    (cohort_day, day_offset) cell. A user lives in exactly one bucket, so
    per-bucket cell counts are additive — the final combine folds B
    bucket-local cell tables (tiny) in a second, partials-only shuffle."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count

    mask = reduce_bucket_count() - 1
    _DAY_US = 86_400_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()),
                        pa.scalar(_DAY_US, pa.int64()))
        g = pa.table({"user_id": t["user_id"],
                      "day": day}).group_by(
            ["user_id", "day"]).aggregate([("day", "count")])
        return g.select(["user_id", "day"]).append_column(
            "bucket", pc.cast(pc.bit_wise_and(g["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id", sort=False)["day"].transform("min")
        cells = pd.DataFrame({"cohort_day": cohort,
                              "day_offset": g["day"] - cohort})
        return (cells.groupby(["cohort_day", "day_offset"], sort=False)
                .size().rename("n").reset_index())

    partials = (ds.map_batches(to_days, batch_format="pyarrow")
                .groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas"))
    out = partial_groupby(partials, ["cohort_day", "day_offset"],
                          {"n_users": ("n", "sum")})
    return collect_table(out).sort_by(
        [("cohort_day", "ascending"), ("day_offset", "ascending")])


def event_transitions(sf_dir: str,
                      num_buckets: int | None = None) -> pa.Table:
    """(prev_type, event_type, n): per-user Markov transition counts —
    how often one event type follows another under (ts, event_id)
    ordering. The behavioral-sequence analysis of an event pipeline
    (session flow graphs, next-action models). Oracle: LAG() + GROUP BY.

    Shape: users coarse-bucket (a bucket holds many COMPLETE users), one
    vectorized sort + shift per bucket, batch-local bigram counts, and a
    tiny (|types|²-row) final combiner."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({"prev_type": et[:-1][same],
                              "event_type": et[1:][same]})
        return (pairs.groupby(["prev_type", "event_type"], sort=False)
                .size().rename("n").reset_index())

    partials = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(per_bucket,
                                              batch_format="pandas"))
    out = partial_groupby(partials, ["prev_type", "event_type"],
                          {"n": ("n", "sum")})
    return collect_table(out).sort_by(
        [("prev_type", "ascending"), ("event_type", "ascending")])


def user_moving_sum(sf_dir: str, window: int = 4,
                    num_buckets: int | None = None) -> pa.Table:
    """(event_id, user_id, moving_cents): per-user moving sum of the last
    ``window`` event values (current + window−1 preceding) under
    (ts, event_id) ordering — the ROWS-frame window aggregate, in integer
    cents so accumulation is order-exact.

    Same coarse-user-bucket shape as ``user_running_value``; inside a
    bucket the frame sum is a segmented cumsum difference (pure int64
    numpy, no per-user loop): base = cum[max(seg_start, i−window+1) − 1]."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()))
        return t.drop_columns(["value"]).append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        m = len(g)
        cum = g["cents"].to_numpy().cumsum()
        uid = g["user_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg_start = np.repeat(starts, np.diff(np.r_[starts, m]))
        w0 = np.maximum(seg_start, np.arange(m, dtype=np.int64)
                        - (window - 1))
        base = np.where(w0 > 0, cum[w0 - 1], 0)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": uid,
                             "moving_cents": cum - base})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("event_id")


def user_time_window_sum(sf_dir: str, window_minutes: int = 60,
                         num_buckets: int | None = None) -> pa.Table:
    """(event_id, user_id, window_cents): per-user sum of event values in
    the trailing TIME window [t−window, t] — the RANGE-frame window
    aggregate (rate limiting, rolling spend), complementing the
    ROWS-frame ``user_moving_sum``. SQL RANGE semantics exactly: the
    frame is CLOSED on both ends and includes ALL peer rows of the
    current timestamp (pandas' rolling('1h') matches neither), in
    integer cents.

    Shape: one coarse user-bucket exchange; per bucket one sort, then a
    per-user-SEGMENT loop whose body is fully vectorized (two
    searchsorted + cumsum differences per segment) — iterations scale
    with users per bucket, never rows."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    gap_us = window_minutes * 60 * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()))
        return t.drop_columns(["value"]).append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        m = len(g)
        uid = g["user_id"].to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        cum = g["cents"].to_numpy().cumsum()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], m]
        out = np.empty(m, dtype=np.int64)
        for s, e in zip(starts, ends):
            seg_ts = us[s:e]
            lo = s + np.searchsorted(seg_ts, seg_ts - gap_us, "left")
            hi = s + np.searchsorted(seg_ts, seg_ts, "right")
            # window sum over global rows [lo, hi): hi > s always (the
            # row itself is in its window); cum[lo-1] at lo == s is the
            # prefix before the segment — subtracted identically
            out[s:e] = cum[hi - 1] - np.where(lo > 0,
                                              cum[np.maximum(lo - 1, 0)],
                                              0)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": uid,
                             "window_cents": out})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("event_id")


def user_favorite_type(sf_dir: str,
                       num_buckets: int | None = None) -> pa.Table:
    """(user_id, favorite_type, n): each user's most frequent event type
    (count desc, type asc on ties) — the per-key MODE / argmax-by-count.

    Shape: a combiner groupby reduces to (user, type, count) partials;
    a coarse user bucket co-locates each user's ≤ |types| rows; the
    per-bucket keep-max is one vectorized sort + drop_duplicates."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    # count on the never-null key: COUNT(event_type) would zero out a
    # (user, NULL) group while the SQL twin's COUNT(*) counts its rows
    counts = partial_groupby(ds, ["user_id", "event_type"],
                             {"n": ("user_id", "count")})

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True],
                          kind="stable", ignore_index=True)
        g = g.drop_duplicates("user_id")
        return pd.DataFrame({"user_id": g["user_id"],
                             "favorite_type": g["event_type"],
                             "n": g["n"]})

    out = (counts.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("user_id")


def latest_user_event(sf_dir: str,
                      num_buckets: int | None = None) -> pa.Table:
    """(user_id, event_id, event_type, ts): each user's LAST event under
    (ts, event_id) ordering — the per-key argmax (QUALIFY ROW_NUMBER = 1
    twin), the snapshot/last-touch primitive.

    Shape: batch-local keep-max partials (a batch's per-user tail row)
    cut the exchange to ≤ users-per-batch rows, then one coarse user
    bucket exchange and a vectorized per-bucket tail(1)."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def local_latest(t: pa.Table) -> pa.Table:
        g = (t.to_pandas()
             .sort_values(["user_id", "ts", "event_id"])
             .drop_duplicates("user_id", keep="last"))
        out = pa.Table.from_pandas(g, preserve_index=False)
        return out.append_column(
            "bucket", pc.cast(pc.bit_wise_and(out["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        return g.drop_duplicates("user_id", keep="last")[
            ["user_id", "event_id", "event_type", "ts"]]

    out = (ds.map_batches(local_latest, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("user_id")


_RADIX = 1 << 31   # split-radix base for exact big sums in int64 columns


def value_outliers(sf_dir: str, k_num: int = 3,
                   k_den: int = 1) -> pa.Table:
    """(event_id, event_type, cents): events whose value deviates from
    their type's mean by more than (k_num/k_den)·σ — anomaly detection
    as EXACT integer arithmetic, so the SQL twin (HUGEINT) hashes
    bit-identically: flag ⇔ k_den²·(n·x − S₁)² > k_num²·(n·S₂ − S₁²)
    over integer cents.

    Scale shape: two streaming passes. Pass 1 folds per-type moment
    partials; per-batch sums stay inside int64 and each partial is
    SPLIT-RADIX encoded (q = v // 2³¹, r = v % 2³¹ in separate int64
    columns) so the cross-batch combiner can never overflow — the driver
    reconstructs exact Python-int totals from one tiny per-type row
    (Σ S₂ is safe up to ~1.9·10²⁸). Pass 2 turns the per-type bound into
    two integer thresholds (|types| values, broadcast in the task
    closure) and filters vectorized — no driver data loop, no
    materialization."""
    import math

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "c": cents, "c2": cents * cents})
        g = df.groupby("event_type", sort=False).agg(
            n=("c", "size"), s1=("c", "sum"), s2=("c2", "sum"))
        out = {"event_type": g.index.to_numpy(),
               "n": g["n"].to_numpy(np.int64)}
        for col in ("s1", "s2"):
            q, r = np.divmod(g[col].to_numpy(np.int64), _RADIX)
            out[f"{col}_q"] = q
            out[f"{col}_r"] = r
        return pa.table(out)

    stats = collect_table(partial_groupby(
        ds.map_batches(moments, batch_format="pyarrow"), ["event_type"],
        {"n": ("n", "sum"), "s1_q": ("s1_q", "sum"),
         "s1_r": ("s1_r", "sum"), "s2_q": ("s2_q", "sum"),
         "s2_r": ("s2_r", "sum")}))

    bounds: dict[str, tuple[int, int]] = {}
    for row in stats.to_pylist():
        n = int(row["n"])
        s1 = int(row["s1_q"]) * _RADIX + int(row["s1_r"])
        s2 = int(row["s2_q"]) * _RADIX + int(row["s2_r"])
        rhs = k_num * k_num * (n * s2 - s1 * s1)   # = k_num²·n²·σ²ₚₒₚ ≥ 0
        # flag ⇔ k_den²(n·x−S₁)² > rhs ⇔ |k_den(n·x−S₁)| > isqrt(rhs)
        thresh = math.isqrt(rhs)
        # n·x > S₁ + thresh/k_den ⇔ k_den·n·x > k_den·S₁ + thresh
        dn = k_den * n
        hi_min = (k_den * s1 + thresh) // dn + 1       # x ≥ hi_min flags
        lo_max = -((-(k_den * s1 - thresh)) // dn) - 1  # x ≤ lo_max flags
        bounds[row["event_type"]] = (lo_max, hi_min)

    def flag(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        types = t["event_type"].to_pylist()
        lo = np.array([bounds[e][0] for e in types], dtype=np.int64)
        hi = np.array([bounds[e][1] for e in types], dtype=np.int64)
        keep = (cents <= lo) | (cents >= hi)
        return pa.table({
            "event_id": t["event_id"].filter(pa.array(keep)),
            "event_type": t["event_type"].filter(pa.array(keep)),
            "cents": pa.array(cents[keep], pa.int64())})

    out = ds.map_batches(flag, batch_format="pyarrow")
    return collect_table(out).sort_by("event_id")


def debounced_events(sf_dir: str, gap_minutes: int = 5,
                     num_buckets: int | None = None) -> pa.Table:
    """(event_id, user_id, event_type, ts): telemetry debounce — drop an
    event when the SAME user emitted the SAME type within ``gap_minutes``
    before it (lag semantics: compared to the previous raw event of that
    (user, type), not the previous kept one — the vectorizable, SQL-LAG
    contract).

    Shape: one coarse user-bucket exchange, one vectorized sort + shift
    per bucket — same lag pattern as ``events_with_prev``."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    gap_us = gap_minutes * 60 * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        close = np.zeros(len(g), dtype=bool)
        close[1:] = (us[1:] - us[:-1]) <= gap_us
        keep = ~(same & close)
        return g.loc[keep, ["event_id", "user_id", "event_type", "ts"]]

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("event_id")


def covariance_by_type(sf_dir: str) -> pa.Table:
    """(event_type, n, cov_num, varx_num, vary_num): EXACT distributed
    covariance/correlation components between value (integer cents, x)
    and hour-of-day (y) per event type:
    cov_num = n·Σxy − Σx·Σy, var*_num = n·Σ*² − (Σ*)² — the integer
    numerators of n²·cov and n²·var (corr² = cov_num²/(varx·vary)).
    Rendered as VARCHAR because the exact values exceed int64 at scale;
    the HUGEINT SQL twin renders identically, so hashes match.

    Shape: same split-radix moment-partial combiner as
    ``value_outliers`` — per-batch pandas groupby sums stay in int64,
    cross-batch folds can never overflow, the driver reconstructs exact
    Python ints from one tiny row per type."""
    _HOUR_US = 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value", "ts"])

    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        y = (us // _HOUR_US) % 24
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "x": x, "y": y, "xy": x * y,
                           "x2": x * x, "y2": y * y})
        g = df.groupby("event_type", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sx2=("x2", "sum"), sy2=("y2", "sum"))
        out = {"event_type": g.index.to_numpy(),
               "n": g["n"].to_numpy(np.int64)}
        for col in ("sx", "sy", "sxy", "sx2", "sy2"):
            q, r = np.divmod(g[col].to_numpy(np.int64), _RADIX)
            out[f"{col}_q"] = q
            out[f"{col}_r"] = r
        return pa.table(out)

    spec = {"n": ("n", "sum")}
    for col in ("sx", "sy", "sxy", "sx2", "sy2"):
        spec[f"{col}_q"] = (f"{col}_q", "sum")
        spec[f"{col}_r"] = (f"{col}_r", "sum")
    stats = collect_table(partial_groupby(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["event_type"], spec))

    types_, ns, covs, vxs, vys = [], [], [], [], []
    for row in sorted(stats.to_pylist(), key=lambda r: r["event_type"]):
        n = int(row["n"])
        tot = {c: int(row[f"{c}_q"]) * _RADIX + int(row[f"{c}_r"])
               for c in ("sx", "sy", "sxy", "sx2", "sy2")}
        types_.append(row["event_type"])
        ns.append(n)
        covs.append(str(n * tot["sxy"] - tot["sx"] * tot["sy"]))
        vxs.append(str(n * tot["sx2"] - tot["sx"] * tot["sx"]))
        vys.append(str(n * tot["sy2"] - tot["sy"] * tot["sy"]))
    return pa.table({"event_type": pa.array(types_, pa.string()),
                     "n": pa.array(ns, pa.int64()),
                     "cov_num": pa.array(covs, pa.string()),
                     "varx_num": pa.array(vxs, pa.string()),
                     "vary_num": pa.array(vys, pa.string())})


def global_percent_rank(sf_dir: str, num_buckets: int = 64) -> pa.Table:
    """(event_id, percent_rank, cume_dist): exact global PERCENT_RANK
    and CUME_DIST over the unique total order (value, event_id) — with a
    tie-broken total order rank(x) = row_number(x), so percent_rank =
    (rn−1)/(n−1) and cume_dist = rn/n, both one IEEE division of exact
    integers (bit-identical to SQL on the same order).

    Same no-global-sort shape as ``global_rank_ntile``: order-preserving
    range buckets + a driver prefix-sum over B bucket counts + local
    sorts."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    lo, hi = _global_min_max(ds, "value")
    cuts = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(np.searchsorted(cuts, v, side="right")
                               .astype(np.int32)))

    bucketed = ds.map_batches(add_bucket,
                              batch_format="pyarrow").materialize()
    counts = collect_table(partial_groupby(
        bucketed, ["bucket"], {"cnt": ("value", "count")})).sort_by("bucket")
    bids = counts.column("bucket").to_pylist()
    cnts = counts.column("cnt").to_pylist()
    n = int(sum(cnts))
    bases = dict(zip(bids, np.concatenate(
        ([0], np.cumsum(cnts)[:-1])).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ignore_index=True)
        rn = bases[int(g["bucket"].iloc[0])] + np.arange(
            1, len(g) + 1, dtype=np.int64)
        pr = (rn - 1) / (n - 1) if n > 1 else np.zeros(len(g))
        return pd.DataFrame({"event_id": g["event_id"],
                             "percent_rank": pr,
                             "cume_dist": rn / n})

    out = bucketed.groupby("bucket").map_groups(per_bucket,
                                                batch_format="pandas")
    return collect_table(out).sort_by("event_id")


def value_histogram(sf_dir: str, n_bins: int = 20) -> pa.Table:
    """(bin, n): fixed-width histogram of events.value between the
    observed min/max — bin = min(floor((v−lo)/width), n_bins−1), the same
    IEEE-double formula the SQL twin evaluates, so boundaries land
    identically. One stats pass + one combiner count pass; only non-empty
    bins emit (SQL GROUP BY semantics)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    lo, hi = _global_min_max(ds, "value")
    # constant column => zero width => NaN bins; width 1.0 puts every row
    # in bin 0 (the SQL twin carries the same CASE guard)
    width = (hi - lo) / float(n_bins) if hi > lo else 1.0

    def to_bins(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor((v - lo) / width),
                       n_bins - 1).astype(np.int64)
        return pa.table({"bin": pa.array(b, pa.int64())})

    out = partial_groupby(ds.map_batches(to_bins, batch_format="pyarrow"),
                          ["bin"], {"n": ("bin", "count")})
    return collect_table(out).sort_by("bin")


def resample_ffill(sf_dir: str, num_buckets: int | None = None) -> pa.Table:
    """(user_id, hour, value): per-user 1-hour resample with forward fill
    — the time-series gap-filling operator. Each user gets a grid of the
    hour boundaries inside their observed span (first boundary at-or-
    after their first event, last at-or-before their last event; a user
    active under an hour emits no rows); every grid instant carries the
    value of the latest event at-or-before it (ties on ts resolve to the
    max event_id), so the fill is total — no nulls on either engine.

    Scale shape: users are coarse-bucketed so one shuffle group holds
    many complete users; inside a block the fill is one sort + per-user
    numpy searchsorted (grid instants against that user's event times) —
    no per-row work, no global sort, no driver pass."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        g = g.drop_duplicates(["user_id", "ts"], keep="last")
        users, hours, vals = [], [], []
        one_h = np.timedelta64(1, "h")
        for uid, sub in g.groupby("user_id", sort=False):
            ts = sub["ts"].to_numpy()
            vs = sub["value"].to_numpy()
            # ceil to the next hour boundary (exact boundary stays)
            h0 = (ts.min() + (one_h - np.timedelta64(1, "us"))) \
                .astype("datetime64[h]")
            h1 = ts.max().astype("datetime64[h]")
            if h0 > h1:
                continue
            grid = np.arange(h0, h1 + one_h)
            idx = np.searchsorted(ts, grid.astype(ts.dtype),
                                  side="right") - 1
            users.append(np.full(len(grid), uid, dtype=np.int64))
            hours.append(grid.astype("datetime64[us]"))
            vals.append(vs[idx].astype(np.float64))
        if not users:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "hour": pd.Series(
                                     [], dtype="datetime64[ns]"),
                                 "value": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({
            "user_id": np.concatenate(users),
            "hour": np.concatenate(hours),
            "value": np.concatenate(vals),
        })

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    t = collect_table(out)
    t = t.set_column(t.schema.get_field_index("hour"), "hour",
                     t.column("hour").cast(pa.timestamp("us")))
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     t.column("value").cast(pa.float64()))
    return t.sort_by([("user_id", "ascending"), ("hour", "ascending")])


def user_event_sequence(sf_dir: str,
                        num_buckets: int | None = None) -> pa.Table:
    """(user_id, seq, n_events): each user's FULL ordered event-type
    sequence joined with '>' under deterministic (ts, event_id) order —
    the ordered string aggregation (``string_agg(.. ORDER BY ..)``),
    the session-mining / sequence-model input primitive.

    Shape: ONE coarse user-bucket exchange (a user's rows co-locate; a
    bucket holds many complete users), then a per-bucket vectorized
    sort + groupby-agg assembles every sequence. Per-user payload is
    that user's own events only — hot users bound the task, not the
    bucket count."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort", ignore_index=True)
        def join_seq(s):
            vals = [v for v in s if v is not None]
            # SQL string_agg is NULL when no non-null value exists
            return ">".join(vals) if vals else None

        agg = g.groupby("user_id", sort=True)["event_type"].agg(
            seq=join_seq, n_events="size")
        return agg.reset_index()[["user_id", "seq", "n_events"]]

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    t = collect_table(out)
    return pa.table({"user_id": t["user_id"].cast(pa.int64()),
                     "seq": t["seq"].cast(pa.string()),
                     "n_events": t["n_events"].cast(pa.int64()),
                     }).sort_by("user_id")


def type_percent_rank(sf_dir: str, num_buckets: int = 64) -> pa.Table:
    """(event_id, event_type, percent_rank, cume_dist): exact PER-GROUP
    PERCENT_RANK / CUME_DIST over the unique (value, event_id) order
    WITHIN each event_type — the PARTITION BY complement to
    ``global_percent_rank``, same no-global-sort shape: one set of
    order-preserving range buckets, per-(group, bucket) combiner counts,
    a driver prefix-sum over the G×B tiny cell table, then per-bucket
    local sorts assign each group segment its offset run. Ranks divide
    per-group exact integers once (bit-identical to SQL on the same
    tie-broken order)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    lo, hi = _global_min_max(ds, "value")
    cuts = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(np.searchsorted(cuts, v, side="right")
                               .astype(np.int32)))

    bucketed = ds.map_batches(add_bucket,
                              batch_format="pyarrow").materialize()
    cells = collect_table(partial_groupby(
        bucketed, ["event_type", "bucket"],
        {"cnt": ("value", "count")})).to_pandas() \
        .sort_values(["event_type", "bucket"])
    bases: dict[tuple, int] = {}
    n_g: dict[str, int] = {}
    for g, sub in cells.groupby("event_type", sort=True):
        cum = 0
        for b, c in zip(sub["bucket"], sub["cnt"]):
            bases[(g, int(b))] = cum
            cum += int(c)
        n_g[g] = cum

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "value", "event_id"],
                          ignore_index=True)
        b = int(g["bucket"].iloc[0])
        local = g.groupby("event_type", sort=False).cumcount() \
                 .to_numpy(dtype=np.int64)
        base = np.array([bases[(t, b)] for t in g["event_type"]],
                        dtype=np.int64)
        rn = base + local + 1
        n = np.array([n_g[t] for t in g["event_type"]], dtype=np.int64)
        pr = np.where(n > 1, (rn - 1) / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame({"event_id": g["event_id"],
                             "event_type": g["event_type"],
                             "percent_rank": pr,
                             "cume_dist": rn / n})

    out = bucketed.groupby("bucket").map_groups(per_bucket,
                                                batch_format="pandas")
    return collect_table(out).sort_by("event_id")


def value_trend_by_type(sf_dir: str) -> pa.Table:
    """(event_type, n, slope_num, slope_den): EXACT per-group OLS trend
    of value (integer cents, y) against time (whole minutes since the
    corpus-minimum timestamp, x): slope = slope_num / slope_den with
    slope_num = n·Σxy − Σx·Σy and slope_den = n·Σx² − (Σx)², both
    rendered as VARCHAR exact integers (they exceed int64 at scale; the
    HUGEINT SQL twin renders identically so hashes match).

    Overflow discipline, tighter than ``covariance_by_type`` because the
    x·y / x² PRODUCTS grow with corpus age: each product splits
    ELEMENT-wise into (q, r) = divmod(·, 2³¹) BEFORE the batch sum (a
    late-corpus block of millions of rows would overflow a raw int64
    Σx² — products reach ~2⁴⁹ at decade spans), and each part's batch
    sum splits AGAIN for the cross-batch fold — so no int64 anywhere
    holds more than ~2⁵⁴ regardless of block size or batch count. The
    epoch pass reads ONLY the ts column."""
    _MIN_US = 60_000_000
    ts_only = rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["ts"])

    def ts_min(t: pa.Table) -> pa.Table:
        return pa.table({"m": pa.array(
            [pc.min(pc.cast(t["ts"], pa.int64())).as_py()], pa.int64())})

    m = collect_table(ts_only.map_batches(ts_min,
                                          batch_format="pyarrow"))
    epoch0 = int(pc.min(m["m"]).as_py())

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value", "ts"])
    # plain batch-sum-then-split columns (terms bounded: x < 2^23
    # minutes for decades, y cents < 2^31) vs element-split product
    # columns (xy/x2 parts: A = Σ q_elem, B = Σ r_elem per batch)
    _PLAIN = ("sx", "sy")
    _PROD = ("sxy", "sx2")
    _PARTS = tuple(f"{c}_{p}" for c in _PROD for p in ("a", "b"))

    def moments(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        x = (us - epoch0) // _MIN_US
        xy_q, xy_r = np.divmod(x * y, _RADIX)
        x2_q, x2_r = np.divmod(x * x, _RADIX)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "x": x, "y": y,
                           "sxy_a": xy_q, "sxy_b": xy_r,
                           "sx2_a": x2_q, "sx2_b": x2_r})
        g = df.groupby("event_type", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            **{c: (c, "sum") for c in _PARTS})
        out = {"event_type": g.index.to_numpy(),
               "n": g["n"].to_numpy(np.int64)}
        for col in _PLAIN + _PARTS:
            q, r = np.divmod(g[col].to_numpy(np.int64), _RADIX)
            out[f"{col}_q"] = q
            out[f"{col}_r"] = r
        return pa.table(out)

    spec = {"n": ("n", "sum")}
    for col in _PLAIN + _PARTS:
        spec[f"{col}_q"] = (f"{col}_q", "sum")
        spec[f"{col}_r"] = (f"{col}_r", "sum")
    stats = collect_table(partial_groupby(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["event_type"], spec))

    types_, ns, nums, dens = [], [], [], []
    for row in sorted(stats.to_pylist(), key=lambda r: r["event_type"]):
        n = int(row["n"])

        def fold(col: str) -> int:
            return int(row[f"{col}_q"]) * _RADIX + int(row[f"{col}_r"])

        sx, sy = fold("sx"), fold("sy")
        sxy = _RADIX * fold("sxy_a") + fold("sxy_b")
        sx2 = _RADIX * fold("sx2_a") + fold("sx2_b")
        types_.append(row["event_type"])
        ns.append(n)
        nums.append(str(n * sxy - sx * sy))
        dens.append(str(n * sx2 - sx * sx))
    return pa.table({"event_type": pa.array(types_, pa.string()),
                     "n": pa.array(ns, pa.int64()),
                     "slope_num": pa.array(nums, pa.string()),
                     "slope_den": pa.array(dens, pa.string())})


def user_value_ewma(sf_dir: str, k: int = 16,
                    num_buckets: int | None = None) -> pa.Table:
    """(user_id, n_recent, decay_num_c): exponentially-decayed recent
    value per user — the newest event (by ts, event_id desc) weighs
    2¹⁵, the next 2¹⁴, … over the last ``k``=16 events:
    ``decay_num_c = Σ value_cents(i-th newest) · 2^(15-i)``. Weights are
    exact powers of two on integer cents, so the score is integer-exact
    and the DuckDB twin (``v_c * (1 << (16 - rn))``) hashes
    bit-identically — the float-EWMA recursion would diverge in last
    bits across engines. This is the recency-weighted user-score
    primitive (session freshness / decay features for ranking models).

    Shape: batch-local keep-newest-k partials cut the exchange to ≤ k
    rows per user per batch, then ONE coarse user-bucket exchange and a
    vectorized per-bucket rank + weighted sum — the
    ``latest_user_event`` argmax pattern generalized to top-k."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["v_c"] = np.round(df["value"] * 100.0).astype(np.int64)
        df = (df.sort_values(["user_id", "ts", "event_id"],
                             ascending=[True, False, False])
              .groupby("user_id", sort=False).head(k))
        out = pa.Table.from_pandas(
            df[["user_id", "ts", "event_id", "v_c"]], preserve_index=False)
        return out.append_column(
            "bucket", pc.cast(pc.bit_wise_and(out["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False],
                          ignore_index=True)
        rn = g.groupby("user_id", sort=False).cumcount()   # 0 = newest
        g = g[rn < k].copy()
        rn = rn[rn < k]
        g["w"] = np.int64(1) << (np.int64(k - 1) - rn.to_numpy())
        g["term"] = g["v_c"].to_numpy() * g["w"].to_numpy()
        agg = g.groupby("user_id", sort=False).agg(
            n_recent=("term", "size"), decay_num_c=("term", "sum"))
        return agg.reset_index()

    out = (ds.map_batches(local_topk, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    t = collect_table(out)
    return t.set_column(
        t.schema.get_field_index("n_recent"), "n_recent",
        t.column("n_recent").cast(pa.int64())).sort_by("user_id")


def resample_linear(sf_dir: str, num_buckets: int | None = None) -> pa.Table:
    """(user_id, hour, value): per-user 1-hour resample with LINEAR
    interpolation between the surrounding events — the imputation
    complement of ``resample_ffill`` (same grid: hour boundaries inside
    each user's observed span; duplicate timestamps collapse to the max
    event_id's value). A grid instant exactly on an event takes that
    event's value; otherwise
    ``v0 + (v1 - v0) · (Δt/ΔT)`` with Δt, ΔT exact int64 microsecond
    differences cast to double — every operation IEEE-exact-rounded in
    the same order as the SQL twin, so the doubles hash bit-identically.

    Scale shape: identical to resample_ffill — ONE coarse user-bucket
    exchange, then per-bucket vectorized searchsorted against each
    user's own event times; no global sort, no driver pass."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        g = g.drop_duplicates(["user_id", "ts"], keep="last")
        users, hours, vals = [], [], []
        one_h = np.timedelta64(1, "h")
        for uid, sub in g.groupby("user_id", sort=False):
            ts = sub["ts"].to_numpy()
            vs = sub["value"].to_numpy().astype(np.float64)
            h0 = (ts.min() + (one_h - np.timedelta64(1, "us"))) \
                .astype("datetime64[h]")
            h1 = ts.max().astype("datetime64[h]")
            if h0 > h1:
                continue
            grid = np.arange(h0, h1 + one_h).astype(ts.dtype)
            i = np.searchsorted(ts, grid, side="right") - 1
            j = np.minimum(i + 1, len(ts) - 1)
            ts_us = ts.astype("datetime64[us]").astype(np.int64)
            grid_us = grid.astype("datetime64[us]").astype(np.int64)
            dt = (grid_us - ts_us[i]).astype(np.float64)
            dT = (ts_us[j] - ts_us[i]).astype(np.float64)
            frac = np.divide(dt, dT, out=np.zeros_like(dt), where=dT > 0)
            v = np.where(dT > 0, vs[i] + (vs[j] - vs[i]) * frac, vs[i])
            users.append(np.full(len(grid), uid, dtype=np.int64))
            hours.append(grid.astype("datetime64[us]"))
            vals.append(v)
        if not users:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "hour": pd.Series(
                                     [], dtype="datetime64[ns]"),
                                 "value": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({
            "user_id": np.concatenate(users),
            "hour": np.concatenate(hours),
            "value": np.concatenate(vals),
        })

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    t = collect_table(out)
    t = t.set_column(t.schema.get_field_index("hour"), "hour",
                     t.column("hour").cast(pa.timestamp("us")))
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     t.column("value").cast(pa.float64()))
    return t.sort_by([("user_id", "ascending"), ("hour", "ascending")])


def user_longest_streak(sf_dir: str,
                        num_buckets: int | None = None) -> pa.Table:
    """(user_id, event_type, streak_len): each user's LONGEST run of
    consecutive same-type events under (ts, event_id) order — the
    gaps-and-islands / streak-detection family (SQL's rn−rn_per_type
    island trick). Ties between equally long runs resolve to the
    lexicographically smallest type, both engines.

    Shape: ONE coarse user-bucket exchange (complete users co-locate),
    then per-bucket vectorized island labeling — a shift-compare cumsum,
    one groupby-size, one head(1) per user; no per-row work."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        new_run = (g["user_id"].ne(g["user_id"].shift())
                   | g["event_type"].ne(g["event_type"].shift()))
        runs = g.groupby(new_run.cumsum(), sort=False).agg(
            user_id=("user_id", "first"),
            event_type=("event_type", "first"),
            streak_len=("user_id", "size"))
        best = runs.sort_values(
            ["user_id", "streak_len", "event_type"],
            ascending=[True, False, True]).groupby(
            "user_id", sort=False).head(1)
        return best[["user_id", "event_type", "streak_len"]]

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    t = collect_table(out)
    if t.num_rows == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "streak_len": pa.array([], pa.int64())})
    return t.set_column(
        t.schema.get_field_index("streak_len"), "streak_len",
        t.column("streak_len").cast(pa.int64())).sort_by("user_id")


def sliding_distinct_users(sf_dir: str, window_hours: int = 3) -> pa.Table:
    """(window_hour, n_users): DISTINCT active users per SLIDING
    ``window_hours``-hour window — window ``w`` covers hours
    [w−window_hours+1, w] — the rolling-reach metric. Sliding DISTINCT
    cannot be combined from per-hour counts (overlap double-counts), so
    the exact shape is: distinct (user, hour) via a combiner groupby →
    explode each to its ``window_hours`` member windows (a bounded,
    batch-local map) → distinct (user, window) via a second combiner →
    per-window counts. Every exchange moves partials keyed by the true
    (user, hour) cardinality, never the event stream. Trailing windows
    past the last active hour are reported (both engines agree)."""
    _HOUR = 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def to_hours(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": t["user_id"],
                         "h": pa.array(us // _HOUR, pa.int64())})

    from raydoc.functions.agg import partial_groupby
    uh = partial_groupby(ds.map_batches(to_hours, batch_format="pyarrow"),
                         ["user_id", "h"], {"n": ("h", "count")})

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("user_id").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        reps = np.repeat(np.arange(len(ids)), window_hours)
        offs = np.tile(np.arange(window_hours, dtype=np.int64), len(ids))
        return pa.table({"user_id": pa.array(ids[reps], pa.int64()),
                         "wh": pa.array(h[reps] + offs, pa.int64())})

    uw = partial_groupby(uh.map_batches(explode, batch_format="pyarrow"),
                         ["user_id", "wh"], {"n": ("wh", "count")})
    out = partial_groupby(uw, ["wh"], {"n_users": ("user_id", "count")})
    t = collect_table(out)
    if t.num_rows == 0:
        return pa.table({"window_hour": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    return pa.table({"window_hour": pc.cast(t["wh"], pa.int64()),
                     "n_users": pc.cast(t["n_users"], pa.int64())}).sort_by(
        "window_hour")


def p90_by_type(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """(event_type, p90_value): EXACT per-group 90th percentile
    (rank-element / ``quantile_disc`` semantics) — the tail-latency /
    tail-quality cut, exercising the two-pass distributed selection
    (`_exact_group_quantile`) at a second quantile so the general-q
    rank math is oracle-pinned, not just the median."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    p90 = _exact_group_quantile(ds, 0.9, num_buckets)
    out_g = sorted(p90)
    return pa.table({"event_type": pa.array(out_g, pa.string()),
                     "p90_value": pa.array([p90[g] for g in out_g],
                                           pa.float64())})


def quantile_cont_by_type(sf_dir: str, q: float = 0.75,
                          num_buckets: int = 256) -> pa.Table:
    """(event_type, p75c_value): EXACT per-group INTERPOLATED quantile
    (DuckDB ``quantile_cont`` semantics) — the continuous complement to
    the rank-element family. Per group with n rows the target position
    is h = (n−1)·q with q the exact decimal the SQL literal denotes
    (Fraction arithmetic — 30·0.1 must be exactly 3, never the binary
    double 3.0000000000000004); the result is the blend
    lo·(1−frac) + hi·frac of the floor(h)/ceil(h) rank elements, which
    bit-matched DuckDB on 300/300 randomized probes (the alternative
    lo + (hi−lo)·frac form does NOT — 257/300).

    Shape: BOTH rank elements of every group come out of ONE
    ``_exact_group_rank_elements`` two-pass selection (the driver sees
    G×B count cells + ≈2/B of the rows); the blend is G tiny float ops
    on the driver."""
    from fractions import Fraction
    qf = Fraction(str(q))

    def ranks_of(n_g: int) -> list[int]:
        h = (n_g - 1) * qf
        f = h.numerator // h.denominator
        return [f] if h == f else [f, f + 1]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    counts, elems = _exact_group_rank_elements(ds, ranks_of, num_buckets)
    out: dict[str, float] = {}
    for g, n_g in counts.items():
        h = (n_g - 1) * qf
        f = h.numerator // h.denominator
        if h == f:
            out[g] = elems[g][f]
        else:
            frac = float(h - f)
            out[g] = elems[g][f] * (1.0 - frac) + elems[g][f + 1] * frac
    out_g = sorted(out)
    return pa.table({"event_type": pa.array(out_g, pa.string()),
                     "p75c_value": pa.array([out[g] for g in out_g],
                                            pa.float64())})


def value_winsorized(sf_dir: str, q_lo: float = 0.1, q_hi: float = 0.9,
                     num_buckets: int = 256) -> pa.Table:
    """(event_id, event_type, value_w): per-group WINSORIZATION — every
    value clipped to its group's exact [p10, p90] (``quantile_disc``
    rank elements), the standard outlier-robust pre-processing step for
    feature columns. Clipping picks existing doubles (no arithmetic),
    so the SQL twin (least/greatest over the same quantiles) hashes
    bit-identically.

    Shape: ONE ``_exact_group_rank_elements`` selection fetches both
    cut ranks of every group together (two bounded passes); the G×2 cut
    table broadcasts via ray.put and the clip is a single vectorized
    map over the stream — no exchange touches the full table."""
    from fractions import Fraction

    def _disc_rank(n_g: int, qf) -> int:
        return max(0, -((-n_g * qf.numerator) // qf.denominator) - 1)

    qfl, qfh = Fraction(str(q_lo)), Fraction(str(q_hi))

    def ranks_of(n_g: int) -> list[int]:
        return sorted({_disc_rank(n_g, qfl), _disc_rank(n_g, qfh)})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    counts, elems = _exact_group_rank_elements(
        ds.select_columns(["event_type", "value"]), ranks_of, num_buckets)
    types = sorted(counts)
    cut_tbl = pa.table({
        "event_type": pa.array(types, pa.string()),
        "__lo": pa.array([elems[g][_disc_rank(counts[g], qfl)]
                          for g in types], pa.float64()),
        "__hi": pa.array([elems[g][_disc_rank(counts[g], qfh)]
                          for g in types], pa.float64()),
    })
    import ray as _ray
    cut_ref = _ray.put(cut_tbl)

    def clip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "value_w": pa.array([], pa.float64())})
        cuts = _ray.get(cut_ref)
        j = t.join(cuts, keys="event_type", join_type="inner")
        return pa.table({
            "event_id": j["event_id"],
            "event_type": j["event_type"],
            "value_w": pc.min_element_wise(
                pc.max_element_wise(j["value"], j["__lo"]), j["__hi"]),
        })

    out = ds.map_batches(clip, batch_format="pyarrow")
    return collect_table(out).sort_by("event_id")


def value_decile(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """(event_id, event_type, decile): per-group EQUAL-FREQUENCY decile
    binning — every value labeled 1..10 by its group's exact
    ``quantile_disc`` cut points (the standard feature-discretization
    step before target encoding / monotone binning). ``decile =
    1 + Σ_k [value > q_k]`` over the nine cuts, so values exactly ON a
    cut fall in the LOWER bin on both engines and the output is pure
    integers (hash-exact SQL twin).

    Shape: all NINE cut ranks of every group come out of ONE
    ``_exact_group_rank_elements`` two-pass selection (driver sees G×B
    count cells + ≈9/B of the rows); the G×9 cut table broadcasts via
    ``ray.put`` and the labeling is one vectorized Arrow join +
    comparison sum per batch — no exchange touches the full table."""
    from fractions import Fraction

    def _disc_rank(n_g: int, qf) -> int:
        return max(0, -((-n_g * qf.numerator) // qf.denominator) - 1)

    qfs = [Fraction(k, 10) for k in range(1, 10)]

    def ranks_of(n_g: int) -> list[int]:
        return sorted({_disc_rank(n_g, qf) for qf in qfs})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    counts, elems = _exact_group_rank_elements(
        ds.select_columns(["event_type", "value"]), ranks_of, num_buckets)
    types = sorted(counts)
    cols: dict[str, list] = {"event_type": list(types)}
    for k, qf in enumerate(qfs, start=1):
        cols[f"__q{k}"] = [elems[g][_disc_rank(counts[g], qf)]
                           for g in types]
    cut_tbl = pa.table({
        "event_type": pa.array(cols["event_type"], pa.string()),
        **{f"__q{k}": pa.array(cols[f"__q{k}"], pa.float64())
           for k in range(1, 10)},
    })
    import ray as _ray
    cut_ref = _ray.put(cut_tbl)

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "decile": pa.array([], pa.int64())})
        cuts = _ray.get(cut_ref)
        j = t.join(cuts, keys="event_type", join_type="inner")
        dec = pa.chunked_array([pa.array([1] * j.num_rows, pa.int64())])
        for k in range(1, 10):
            dec = pc.add(dec, pc.cast(
                pc.greater(j["value"], j[f"__q{k}"]), pa.int64()))
        return pa.table({"event_id": j["event_id"],
                         "event_type": j["event_type"],
                         "decile": dec})

    out = ds.map_batches(label, batch_format="pyarrow")
    return collect_table(out).sort_by("event_id")


def merged_intervals(sf_dir: str,
                     num_buckets: int | None = None) -> pa.Table:
    """(user_id, start_us, end_us, n_merged): per-user INTERVAL
    COALESCING — each event spans [ts, ts + value seconds]; overlapping
    or touching spans of the same user merge into maximal busy
    intervals (the classic gaps-and-islands flattening used for
    availability windows, on-call coverage, GPS track segments).
    All-integer epoch-µs arithmetic (duration = round(value·1e6), the
    ``_cents`` discipline), so the SQL twin — running-MAX(end) OVER
    preceding rows, island breaks where start > that max — hashes
    bit-identically.

    Shape: ONE coarse user-bucket exchange (many complete users per
    block); the merge is a vectorized sort + per-user running max +
    cumsum island labeling over the whole block — no per-user
    micro-groups, no global sort."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def add_iv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "s_us": pa.array([], pa.int64()),
                             "e_us": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        s = pc.cast(t["ts"], pa.int64())
        dur = pc.cast(pc.round(pc.multiply(t["value"],
                                           pa.scalar(1_000_000.0))),
                      pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "s_us": s,
            "e_us": pc.add(s, dur),
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "s_us", "e_us"], ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        s = g["s_us"].to_numpy(dtype=np.int64)
        e = g["e_us"].to_numpy(dtype=np.int64)
        n = len(g)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        # running max of e within user, shifted to exclude current row
        run = pd.Series(e).groupby(uid).cummax().to_numpy(dtype=np.int64)
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[0] = 0
        prev_max[1:] = run[:-1]
        new_iv = new_user | (s > prev_max)
        grp = np.cumsum(new_iv)
        df = pd.DataFrame({"user_id": uid, "s": s, "e": e, "grp": grp})
        agg = df.groupby("grp", sort=True).agg(
            user_id=("user_id", "first"), start_us=("s", "min"),
            end_us=("e", "max"), n_merged=("s", "size"))
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(dtype=np.int64),
            "start_us": agg["start_us"].to_numpy(dtype=np.int64),
            "end_us": agg["end_us"].to_numpy(dtype=np.int64),
            "n_merged": agg["n_merged"].to_numpy(dtype=np.int64),
        })

    out = (ds.map_batches(add_iv, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by([("user_id", "ascending"),
                                       ("start_us", "ascending")])


def value_iqr_outliers(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """(event_id, event_type, value, lo, hi): per-group IQR (Tukey
    fence) outliers — value outside [p25 − 1.5·IQR, p75 + 1.5·IQR] of
    its group. The robust complement of the k-sigma ``value_outliers``
    (median-based fences shrug off the very outliers that inflate a
    sigma fence). Both quartile ranks of every group come out of ONE
    ``_exact_group_rank_elements`` two-pass selection; the fences are
    computed once per group with the same expression shape as the SQL
    twin (p25 − 1.5·(p75−p25), IEEE-identical), broadcast via ray.put,
    and the filter is one vectorized map — no exchange touches the
    full table."""
    from fractions import Fraction

    def _disc_rank(n_g: int, qf) -> int:
        return max(0, -((-n_g * qf.numerator) // qf.denominator) - 1)

    qlo, qhi = Fraction(1, 4), Fraction(3, 4)

    def ranks_of(n_g: int) -> list[int]:
        return sorted({_disc_rank(n_g, qlo), _disc_rank(n_g, qhi)})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    counts, elems = _exact_group_rank_elements(
        ds.select_columns(["event_type", "value"]), ranks_of,
        num_buckets)
    types = sorted(counts)
    lo_v, hi_v = [], []
    for g in types:
        p25 = elems[g][_disc_rank(counts[g], qlo)]
        p75 = elems[g][_disc_rank(counts[g], qhi)]
        iqr = p75 - p25
        lo_v.append(p25 - 1.5 * iqr)
        hi_v.append(p75 + 1.5 * iqr)
    fence_tbl = pa.table({"event_type": pa.array(types, pa.string()),
                          "lo": pa.array(lo_v, pa.float64()),
                          "hi": pa.array(hi_v, pa.float64())})
    import ray as _ray
    fence_ref = _ray.put(fence_tbl)

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        fences = _ray.get(fence_ref)
        j = t.join(fences, keys="event_type", join_type="inner")
        keep = pc.or_(pc.less(j["value"], j["lo"]),
                      pc.greater(j["value"], j["hi"]))
        j = j.filter(pc.fill_null(keep, False))
        return j.select(["event_id", "event_type", "value", "lo", "hi"])

    out = ds.map_batches(pick, batch_format="pyarrow")
    t = collect_table(out)
    if t.num_rows == 0 or "event_id" not in t.schema.names:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "value": pa.array([], pa.float64()),
                         "lo": pa.array([], pa.float64()),
                         "hi": pa.array([], pa.float64())})
    return t.sort_by("event_id")


def user_time_weighted_avg(sf_dir: str,
                           num_buckets: int | None = None) -> pa.Table:
    """(user_id, num_c_us, span_us, twa): per-user TIME-WEIGHTED average
    value — each value weighted by how long it was "current" (until the
    user's next event): ``num = Σ v_c·Δt_µs`` over consecutive events,
    ``span = last−first``, ``twa = num/span`` (one IEEE division of the
    two exact integers, both emitted). The step-function integral —
    sensor/price averaging where event spacing is irregular and a plain
    AVG over-weights bursts. Users with a single event (no span) are
    omitted, matching the LEAD twin. int64 bound: max_v_c·span_µs per
    user < 2⁶³ (≈ 300 years at $500 values) — promote to the split-radix
    partials if a corpus breaks it.

    Shape: batch-local (user, ts, v) rows cut to the needed columns,
    ONE coarse user-bucket exchange, vectorized per-bucket shift/diff —
    the events_with_prev pattern with an integral instead of a lag."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "us": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "v_c": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "v_c": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                           pa.int64()),
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        v = g["v_c"].to_numpy()
        nxt = np.roll(us, -1)
        same = np.roll(uid, -1) == uid
        same[-1] = False
        dt = np.where(same, nxt - us, 0)
        num = v * dt
        df = pd.DataFrame({"user_id": uid, "num": num, "us": us})
        agg = df.groupby("user_id", sort=False).agg(
            num_c_us=("num", "sum"), lo=("us", "min"), hi=("us", "max"))
        agg["span_us"] = agg["hi"] - agg["lo"]
        agg = agg[agg["span_us"] > 0]
        agg["twa"] = agg["num_c_us"] / agg["span_us"]
        return agg.reset_index()[["user_id", "num_c_us", "span_us",
                                  "twa"]]

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    t = collect_table(out)
    if t.num_rows == 0 or "user_id" not in t.schema.names:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "num_c_us": pa.array([], pa.int64()),
                         "span_us": pa.array([], pa.int64()),
                         "twa": pa.array([], pa.float64())})
    return t.sort_by("user_id")


def user_peak_concurrency(sf_dir: str,
                          num_buckets: int | None = None) -> pa.Table:
    """(user_id, peak): the classic +1/−1 sweep-line — maximum number of
    simultaneously-open sessions per user, each event opening a
    [ts, ts + value·1s] session. A session starting exactly when
    another ends COUNTS as concurrent (starts sort before ends at
    equal t — replicated in the twin's ``ORDER BY t, d DESC``).
    Capacity-planning / room-scheduling shape. ONE coarse user-bucket
    exchange; the sweep is a vectorized per-bucket sort + cumsum + max,
    all-integer µs endpoints."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        s = pc.cast(t["ts"], pa.int64())
        dur = pc.cast(pc.round(pc.multiply(t["value"], 1_000_000.0)),
                      pa.int64())
        e = pc.add(s, dur)
        uid2 = pa.concat_arrays([t["user_id"].combine_chunks(),
                                 t["user_id"].combine_chunks()])
        tt = pa.concat_arrays([s.combine_chunks(), e.combine_chunks()])
        n = t.num_rows
        dd = pa.array([1] * n + [-1] * n, pa.int64())
        out = pa.table({"user_id": uid2, "t": tt, "d": dd})
        return out.append_column(
            "bucket", pc.cast(pc.bit_wise_and(out["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "d"],
                          ascending=[True, True, False],
                          ignore_index=True)
        run = g.groupby("user_id", sort=False)["d"].cumsum()
        g["c"] = run
        agg = g.groupby("user_id", sort=False).agg(peak=("c", "max"))
        return agg.reset_index()

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("user_id")


def event_trigrams(sf_dir: str, top_n: int = 25,
                   num_buckets: int | None = None) -> pa.Table:
    """(t1, t2, t3, n): the ``top_n`` most frequent ORDERED event-type
    trigrams across users (consecutive by (ts, event_id)) — sequence
    mining one length up from the Markov bigrams of
    ``event_transitions``. ONE coarse user-bucket exchange; per bucket
    a vectorized double shift builds the paths and pre-counts, a tiny
    (≤ |types|³) combiner groupby folds, the top-N merge is
    driver-side. Ties: n desc, then (t1, t2, t3) asc — same chain in
    the double-LEAD twin."""
    from raydoc.functions._buckets import reduce_bucket_count

    from raydoc.functions.agg import partial_groupby

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "us": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        ty = g["event_type"].to_numpy()
        same2 = np.roll(uid, -2) == uid
        same2[-2:] = False
        t1 = ty[same2]
        t2 = np.roll(ty, -1)[same2]
        t3 = np.roll(ty, -2)[same2]
        df = pd.DataFrame({"t1": t1, "t2": t2, "t3": t3})
        agg = df.groupby(["t1", "t2", "t3"], sort=False).size() \
                .rename("n").reset_index()
        return agg

    counted = (ds.map_batches(prep, batch_format="pyarrow")
               .groupby("bucket").map_groups(per_bucket,
                                             batch_format="pandas"))
    out = partial_groupby(counted, ["t1", "t2", "t3"],
                          {"n": ("n", "sum")})
    t = collect_table(out)
    if t.num_rows == 0 or "n" not in t.schema.names:
        return pa.table({"t1": pa.array([], pa.string()),
                         "t2": pa.array([], pa.string()),
                         "t3": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                        ("t1", "ascending"),
                                        ("t2", "ascending"),
                                        ("t3", "ascending")])[:top_n]
    t = t.take(idx)
    return t.set_column(t.schema.get_field_index("n"), "n",
                        t["n"].cast(pa.int64()))


def user_rfm_segments(sf_dir: str, num_buckets: int = 256,
                      driver_cut_max: int = 2_000_000) -> pa.Table:
    """(user_id, recency_us, frequency, monetary_c, r_score, f_score,
    m_score, rfm): classic RFM segmentation — each user scored 1–5 by
    quintile over the user population on recency (last-event µs),
    frequency (event count) and monetary (exact cents sum), composed
    ``rfm = r·100 + f·10 + m``. Shape: ONE combiner groupby builds the
    per-user aggregate; the 12 quintile cuts come from one numpy sort
    when the user population is driver-resident-small
    (``driver_cut_max``), else the metrics melt into (metric, value)
    rows and ALL cuts come out of a single
    ``_exact_group_rank_elements`` two-pass selection (never a whole
    metric in one task) — both regimes pick identical rank elements;
    the 3×4 cut table broadcasts and scoring is one vectorized map
    over the aggregate stream. Metrics ride float64
    through the selection — exact for integers < 2⁵³ (µs timestamps
    and cent sums at any realistic scale). Score rule ``1 + Σ[v >
    cut]`` (on-cut falls lower) bit-matches the quantile_disc twin."""
    from fractions import Fraction

    from raydoc.functions.agg import partial_groupby

    def _disc_rank(n_g: int, qf) -> int:
        return max(0, -((-n_g * qf.numerator) // qf.denominator) - 1)

    qs = [Fraction(1, 5), Fraction(2, 5), Fraction(3, 5),
          Fraction(4, 5)]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "us": pa.array([], pa.int64()),
                             "v_c": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "v_c": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                           pa.int64()),
            "one": pa.array([1] * t.num_rows, pa.int64()),
        })

    agg = partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"), ["user_id"],
        {"recency_us": ("us", "max"), "frequency": ("one", "sum"),
         "monetary_c": ("v_c", "sum")}).materialize()

    def melt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "recency_us" not in t.schema.names:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        parts = []
        for m in ("recency_us", "frequency", "monetary_c"):
            parts.append(pa.table({
                "event_type": pa.array([m] * t.num_rows, pa.string()),
                "value": pc.cast(t[m], pa.float64())}))
        return pa.concat_tables(parts)

    def ranks_of(n_g: int) -> list[int]:
        return sorted({_disc_rank(n_g, q) for q in qs})

    # adaptive regime (the label_components discipline): the aggregate
    # is user-cardinality; when it is driver-resident-small the 12 cuts
    # come from one numpy sort of three metric columns (saves the two
    # selection exchanges — measured 7.2 s → ~4 s at sf0.1); a larger
    # population runs the distributed two-pass selection
    n_users = agg.count()
    if n_users == 0:
        return pa.table({
            "user_id": pa.array([], pa.int64()),
            "recency_us": pa.array([], pa.int64()),
            "frequency": pa.array([], pa.int64()),
            "monetary_c": pa.array([], pa.int64()),
            "r_score": pa.array([], pa.int64()),
            "f_score": pa.array([], pa.int64()),
            "m_score": pa.array([], pa.int64()),
            "rfm": pa.array([], pa.int64())})
    if n_users <= driver_cut_max:
        t_agg = collect_table(agg)
        cuts = {}
        for m in ("recency_us", "frequency", "monetary_c"):
            v = np.sort(pc.cast(t_agg[m], pa.float64())
                        .combine_chunks().to_numpy(zero_copy_only=False))
            cuts[m] = [float(v[_disc_rank(n_users, q)]) for q in qs]
    else:
        counts, elems = _exact_group_rank_elements(
            agg.map_batches(melt, batch_format="pyarrow"), ranks_of,
            num_buckets)
        cuts = {m: [elems[m][_disc_rank(counts[m], q)] for q in qs]
                for m in ("recency_us", "frequency", "monetary_c")}
    import ray as _ray
    cuts_ref = _ray.put(cuts)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "recency_us" not in t.schema.names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "recency_us": pa.array([], pa.int64()),
                "frequency": pa.array([], pa.int64()),
                "monetary_c": pa.array([], pa.int64()),
                "r_score": pa.array([], pa.int64()),
                "f_score": pa.array([], pa.int64()),
                "m_score": pa.array([], pa.int64()),
                "rfm": pa.array([], pa.int64())})
        c = _ray.get(cuts_ref)
        scores = {}
        for m, alias in (("recency_us", "r_score"),
                         ("frequency", "f_score"),
                         ("monetary_c", "m_score")):
            v = pc.cast(t[m], pa.float64())
            s = pa.array(np.ones(t.num_rows, np.int64))
            for cut in c[m]:
                s = pc.add(s, pc.cast(pc.greater(v, cut), pa.int64()))
            scores[alias] = s
        rfm = pc.add(pc.add(pc.multiply(scores["r_score"], 100),
                            pc.multiply(scores["f_score"], 10)),
                     scores["m_score"])
        return pa.table({
            "user_id": t["user_id"],
            "recency_us": t["recency_us"],
            "frequency": t["frequency"],
            "monetary_c": t["monetary_c"],
            "r_score": scores["r_score"],
            "f_score": scores["f_score"],
            "m_score": scores["m_score"],
            "rfm": rfm,
        })

    out = agg.map_batches(score, batch_format="pyarrow")
    return collect_table(out).sort_by("user_id")


def value_acf_by_type(sf_dir: str) -> pa.Table:
    """(event_type, n_pairs, acf1): lag-1 autocorrelation of each event
    type's value series under (ts, event_id) ordering — the
    seasonality/persistence screen for a metric stream (reference keeps
    per-document sequential stats; this is the events-table twin of
    ``relational.q_value_hour_corr`` over LAGGED pairs instead of an
    attribute pair).

    Scale shape — sequential pairing WITHOUT a per-type group: events
    bucket on the calendar day (a type's day-run is contiguous after an
    in-block sort), each day block emits per-type integer moment
    partials over its in-day lag pairs PLUS the two boundary values
    (first/last cents of the type's run that day). The driver folds
    |types|·|days| tiny rows: cross-day boundary pairs (last of day d,
    first of day d+1 in day order) are added in exact Python bigints, so
    the result is bit-identical to the single-sequence SQL twin. At
    10¹²-row scale, bucket on the hour instead (same code path) and
    split the int64 moment partials into limb sums like
    ``orders_checksum``; moments here are exact int64 at bench scales."""
    import math

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()))
        return t.drop_columns(["value"]).append_column(
            "day", pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                           pa.int64()))

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "ts", "event_id"],
                          ignore_index=True)
        et = g["event_type"].to_numpy()
        x = g["cents"].to_numpy()
        day = int(g["day"].iloc[0])
        same = et[1:] == et[:-1]
        pairs = pd.DataFrame({"event_type": et[1:][same],
                              "x": x[:-1][same], "y": x[1:][same]})
        pairs["xy"] = pairs["x"] * pairs["y"]
        pairs["xx"] = pairs["x"] * pairs["x"]
        pairs["yy"] = pairs["y"] * pairs["y"]
        m = pairs.groupby("event_type", sort=True).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"))
        # first/last cents of each type's in-day run (runs are contiguous)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        ends = np.r_[starts[1:], len(et)] - 1
        runs = pd.DataFrame({"event_type": et[starts],
                             "first_x": x[starts], "last_x": x[ends]}
                            ).set_index("event_type")
        out = runs.join(m, how="left").fillna(0).reset_index()
        out["day"] = day
        for c in ("n", "sx", "sy", "sxy", "sxx", "syy"):
            out[c] = out[c].astype(np.int64)
        return out[["event_type", "day", "n", "sx", "sy", "sxy", "sxx",
                    "syy", "first_x", "last_x"]]

    parts = collect_table(
        ds.map_batches(add_bucket, batch_format="pyarrow")
          .groupby("day").map_groups(per_day, batch_format="pandas"))
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "n_pairs": pa.array([], pa.int64()),
                      "acf1": pa.array([], pa.float64())})
    if parts.num_rows == 0 or "event_type" not in parts.schema.names:
        return empty
    df = parts.to_pandas().sort_values(["event_type", "day"])
    types, ns, rs = [], [], []
    for et, sub in df.groupby("event_type", sort=True):
        n = int(sub["n"].sum())
        sx, sy = int(sub["sx"].sum()), int(sub["sy"].sum())
        sxy = int(sub["sxy"].sum())
        sxx, syy = int(sub["sxx"].sum()), int(sub["syy"].sum())
        lx = sub["last_x"].to_numpy()[:-1]     # day d's run end
        fx = sub["first_x"].to_numpy()[1:]     # day d+1's run start
        for xv, yv in zip(lx.tolist(), fx.tolist()):
            n += 1
            sx += xv
            sy += yv
            sxy += xv * yv
            sxx += xv * xv
            syy += yv * yv
        if n == 0:
            continue
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        rv = (float(num) / (math.sqrt(float(denx)) * math.sqrt(float(deny)))
              if denx > 0 and deny > 0 else float("nan"))
        types.append(et)
        ns.append(n)
        rs.append(rv)
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "n_pairs": pa.array(ns, pa.int64()),
                     "acf1": pa.array(rs, pa.float64())})


def top_session_paths(sf_dir: str, gap_minutes: int = 30, k: int = 20,
                      num_buckets: int | None = None) -> pa.Table:
    """(path, n_sessions): the ``k`` most common full session event-type
    paths (types joined with '>' in (ts, event_id) order inside each
    30-minute-gap session) — the product-analytics "top user journeys"
    query. Composes ``sessionize``'s gap scan with a path roll-up.

    Scale shape: ONE user-bucket exchange (a block holds many complete
    users; sessions never split), paths assemble vectorized per block,
    per-block (path, count) partials feed a tiny combiner groupby over
    distinct paths, and the top-k prunes block-locally before a driver
    merge (``_global_topk`` — no global sort)."""
    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.relational import _global_topk
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_session = np.empty(len(g), dtype=bool)
        new_session[0] = True
        new_session[1:] = uid[1:] != uid[:-1]
        if len(g) > 1:
            new_session[1:] |= np.diff(ts) > gap
        sess = new_session.cumsum()
        paths = pd.DataFrame({"sess": sess,
                              "et": g["event_type"].to_numpy()}) \
            .groupby("sess", sort=False)["et"].agg(">".join)
        counts = paths.value_counts()
        return pd.DataFrame({"path": counts.index.to_numpy(),
                             "n": counts.to_numpy()})

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas"))
    totals = partial_groupby(parts, ["path"], {"n_sessions": ("n", "sum")})
    return _global_topk(totals, ["n_sessions", "path"], [True, False], k)


def event_rate_cusum(sf_dir: str, k_sigma: float = 0.5,
                     h_sigma: float = 5.0) -> pa.Table:
    """(event_type, window_start, cusum): one-sided CUSUM change-point
    alarms over each type's HOURLY event rate — the drift monitor for a
    streaming ingest (alarm when the standardized cumulative excess
    S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ−μ)/σ − k) crosses ``h``). Emits only the
    alarm rows.

    Scale shape: the heavy part — hourly counts per type — is the
    distributed combiner groupby (``hourly_event_stats``'s shape); the
    CUSUM recursion is inherently sequential but runs over the tiny
    aggregated series (|types|·|hours| rows) on the driver, the same
    small-problem regime as the adaptive component-labeling policy.
    μ/σ come from the series itself (retrospective monitoring); a
    live monitor would freeze them from a reference window. Rows-only
    (the recursion is not expressible as a SQL window); property-tested
    on planted rate shifts."""
    import math

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "event_type": t["event_type"]})

    counts_t = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["window_start", "event_type"],
        {"n": ("event_type", "count")}))
    out_t, out_w, out_c = [], [], []
    if counts_t.num_rows == 0 or "event_type" not in counts_t.schema.names:
        counts = pd.DataFrame({"event_type": [], "window_start": [],
                               "n": []})
    else:
        counts = counts_t.to_pandas()
    for et, sub in counts.groupby("event_type", sort=True):
        sub = sub.sort_values("window_start")
        # a rate monitor must see zero-event hours as rate 0, not skip
        # them: reindex over the type's full hourly span so gaps both
        # enter mu/sigma and drain S through the (0-mu)/sigma terms
        full = sub.set_index("window_start")["n"].reindex(
            pd.date_range(sub["window_start"].iloc[0],
                          sub["window_start"].iloc[-1], freq="h"),
            fill_value=0)
        x = full.to_numpy(dtype=np.float64)
        if len(x) < 2:
            continue
        mu = float(x.mean())
        sd = float(x.std())
        if sd == 0.0:
            continue
        s = 0.0
        for w, xi in zip(full.index, x):
            s = max(0.0, s + (xi - mu) / sd - k_sigma)
            if s > h_sigma:
                out_t.append(et)
                out_w.append(w)
                out_c.append(s)
    ws = pa.array(out_w, pa.timestamp("us")) if out_w else \
        pa.array([], pa.timestamp("us"))
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "window_start": ws,
                     "cusum": pa.array(out_c, pa.float64())})


def conversion_latency(sf_dir: str,
                       from_type: str = "view", to_type: str = "purchase",
                       num_buckets: int | None = None) -> pa.Table:
    """(user_id, first_view_us, first_purchase_us, delta_us): per-user
    time from the FIRST ``from_type`` event to the first ``to_type``
    event at-or-after it — the funnel conversion-latency metric
    (complements ``funnel_counts``, which only counts). Users who never
    converted are omitted (inner semantics, like the SQL twin).

    Scale shape: one user-bucket exchange (complete users per block,
    the ``sessionize`` discipline); inside a block both "first view"
    and "first qualifying purchase" are vectorized pandas min-reductions
    — no per-user micro-groups, no self-join of the events table."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array([from_type, to_type])))
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("int64")
        g = pd.DataFrame({"user_id": g["user_id"], "us": us,
                          "et": g["event_type"]})
        v = g[g["et"] == from_type].groupby("user_id")["us"].min() \
            .rename("first_view_us")
        p = g[g["et"] == to_type].merge(v, on="user_id")
        p = p[p["us"] >= p["first_view_us"]]
        if p.empty:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "first_view_us": pd.Series([], dtype="int64"),
                                 "first_purchase_us": pd.Series([], dtype="int64"),
                                 "delta_us": pd.Series([], dtype="int64")})
        out = p.groupby("user_id").agg(
            first_view_us=("first_view_us", "first"),
            first_purchase_us=("us", "min")).reset_index()
        out["delta_us"] = out["first_purchase_us"] - out["first_view_us"]
        return out

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    return collect_table(out).sort_by("user_id")


def late_event_stats(sf_dir: str, delay_days: int = 14,
                     hex_prefix_len: int = 2) -> pa.Table:
    """(window_start, n_ontime, sum_value_cents, n_late): tumbling
    1-hour event-time windows with STREAMING WATERMARK semantics —
    the Beam/Flink allowed-lateness model the strictly-batch reference
    has no analog for (SURVEY.md §2.10). Arrival order is a
    content-derived deterministic scramble (md5 of the event id — the
    repo's seeded-permutation idiom, ``uniform_sample_md5``), modeling
    out-of-order network delivery over the ts-sorted log. The watermark
    before a record arrives is max(event time) over all earlier
    arrivals minus ``delay_days``; records behind the watermark are
    LATE and excluded from their window's aggregate but counted in its
    ``n_late`` — exact dropped-data accounting per window.

    Shape (no global sort): arrivals go to ORDER-PRESERVING buckets by
    the md5 hex prefix (256 lexicographic ranges); a combiner pass
    reduces each bucket to its max event time (B tiny rows); the driver
    exclusive-prefix-maxes the B values into per-bucket incoming
    watermarks; each bucket then sorts locally and runs a vectorized
    prefix max seeded with its base — the prefix-scan decomposition of
    ``global_rank_ntile`` applied to a running max. Per-bucket
    (window, late) partials fold in a final combiner groupby."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "value"])
    delay_us = delay_days * 86_400_000_000
    _NEG = -(1 << 62)  # "no earlier arrival" sentinel (overflow-safe)

    def add_arrival(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return pa.table({"ak": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "vc": pa.array([], pa.int64())})
        ak = [hashlib.md5(str(v).encode()).hexdigest()
              for v in t.column("event_id").to_pylist()]
        return pa.table({
            "ak": pa.array(ak, pa.string()),
            "bucket": pa.array([int(k[:hex_prefix_len], 16) for k in ak],
                               pa.int32()),
            "ts": t["ts"],
            "vc": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                          pa.int64())})

    # materialize: the bucket-max pass and the main pass both consume it
    arr = ds.map_batches(add_arrival, batch_format="pyarrow").materialize()
    bmax = collect_table(partial_groupby(
        arr, ["bucket"], {"mx": ("ts", "max")})).sort_by("bucket")
    bases: dict[int, int] = {}
    run = _NEG
    for b, m in zip(bmax.column("bucket").to_pylist(),
                    pc.cast(bmax.column("mx"), pa.int64()).to_pylist()):
        bases[int(b)] = run
        run = max(run, int(m))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ak", ignore_index=True)
        ts = g["ts"].astype("int64").to_numpy()
        prev = np.empty_like(ts)
        prev[0] = bases[int(g["bucket"].iloc[0])]
        np.maximum.accumulate(ts[:-1], out=prev[1:]) if len(ts) > 1 else None
        np.maximum(prev, prev[0], out=prev)
        late = ts < prev - delay_us
        win = (ts // 3_600_000_000) * 3_600_000_000
        vc = g["vc"].to_numpy()
        f = pd.DataFrame({"w": win, "late": late, "vc": vc})
        out = f.groupby("w", sort=False).agg(
            n_ontime=("late", lambda s: int((~s).sum())),
            sum_value_cents=("vc", "sum"),
            n_late=("late", "sum")).reset_index()
        # sum only on-time values: subtract the late contribution
        late_vc = f.loc[f["late"]].groupby("w", sort=False)["vc"].sum()
        out["sum_value_cents"] = (
            out["sum_value_cents"]
            - out["w"].map(late_vc).fillna(0).astype("int64"))
        return pd.DataFrame({
            "w": out["w"].astype("int64"),
            "n_ontime": out["n_ontime"].astype("int64"),
            "sum_value_cents": out["sum_value_cents"].astype("int64"),
            "n_late": out["n_late"].astype("int64")})

    parts = arr.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pandas")
    out = collect_table(partial_groupby(
        parts, ["w"], {"n_ontime": ("n_ontime", "sum"),
                       "sum_value_cents": ("sum_value_cents", "sum"),
                       "n_late": ("n_late", "sum")})).sort_by("w")
    return pa.table({
        "window_start": pc.cast(pc.cast(out["w"], pa.int64()),
                                pa.timestamp("us")),
        "n_ontime": pc.cast(out["n_ontime"], pa.int64()),
        "sum_value_cents": pc.cast(out["sum_value_cents"], pa.int64()),
        "n_late": pc.cast(out["n_late"], pa.int64())})


def trailing_hour_value(sf_dir: str,
                        num_buckets: int | None = None) -> pa.Table:
    """(event_id, user_id, trail_cents): per event, the sum of the SAME
    user's values over the trailing hour — SQL's RANGE frame
    (``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``),
    which the ROWS-frame moving sum can't express: the frame is bounded
    by event TIME, peers with equal ts share one frame, and a user's
    row count inside the frame varies row to row.

    Scale shape: the events_with_prev bucket discipline — coarse-bucket
    users, ONE exchange, then a fully vectorized per-block kernel: sort
    by (user, ts, event_id), lift each user's timestamps onto a single
    globally ascending axis (per-segment offsets with an hour-plus gap
    so no window can bleed across users), and resolve every frame with
    two whole-block searchsorteds against a prefix-sum of cents. No
    per-user loop, no per-row loop."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    hour = 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()))
        return t.drop_columns(["value"]).append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = g["cents"].to_numpy()
        new = np.empty(len(g), np.bool_)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(new) - 1                       # per-row segment id
        starts = np.flatnonzero(new)
        seg_min = ts[starts]                           # ts ascending per seg
        ends = np.append(starts[1:], len(g)) - 1
        span = ts[ends] - seg_min
        seg_base = np.concatenate(
            [[0], np.cumsum(span + hour + 2)[:-1]])    # gap blocks bleed
        adj = ts - seg_min[seg] + seg_base[seg]        # globally ascending
        left = np.searchsorted(adj, adj - hour, side="left")
        right = np.searchsorted(adj, adj, side="right")
        cum = np.concatenate([[0], np.cumsum(cents)])
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": uid,
                             "trail_cents": cum[right] - cum[left]})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    t = collect_table(out)
    return pa.table({
        "event_id": pc.cast(t["event_id"], pa.int64()),
        "user_id": pc.cast(t["user_id"], pa.int64()),
        "trail_cents": pc.cast(t["trail_cents"], pa.int64()),
    }).sort_by("event_id")


def attribution_linear(sf_dir: str,
                       num_buckets: int | None = None) -> pa.Table:
    """(view_event_id, attributed_cents, n_purchases): linear
    multi-touch attribution — every purchase's value (integer cents)
    splits equally across the SAME user's view events in the preceding
    7 days (ts in (purchase−7d, purchase]); the integer remainder goes
    to the earliest views (ROW_NUMBER by (ts, event_id)), so credit
    conserves exactly: Σ attributed = Σ cents over attributed
    purchases, bit-identical to the SQL twin.

    Scale shape: one coarse user-bucket exchange co-locates each user's
    views and purchases, then a fully vectorized per-block kernel —
    views lift onto the trailing_hour_value global axis (segment
    offsets, 7-day-plus gap), each purchase's window resolves with two
    searchsorteds clipped to its user's view segment, and the
    purchase×view pairs explode via np.repeat + range arithmetic (no
    per-user or per-row loop). Per-view credits pre-fold in-block, one
    combiner groupby finishes."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    week = 7 * 86_400_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["view", "purchase"]))
        t = t.filter(keep)
        t = t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()))
        return t.drop_columns(["value"]).append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "vid": pd.Series([], dtype="int64"),
            "credit": pd.Series([], dtype="int64"),
            "np_": pd.Series([], dtype="int64")})
        v = g[g["event_type"] == "view"].sort_values(
            ["user_id", "ts", "event_id"], ignore_index=True)
        p = g[g["event_type"] == "purchase"]
        if not len(v) or not len(p):
            return empty
        uid_v = v["user_id"].to_numpy()
        ts_v = v["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vid = v["event_id"].to_numpy()
        new = np.empty(len(v), np.bool_)
        new[0] = True
        new[1:] = uid_v[1:] != uid_v[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(v))          # exclusive
        seg_min = ts_v[starts]
        span = ts_v[ends - 1] - seg_min
        seg_base = np.concatenate([[0], np.cumsum(span + week + 2)[:-1]])
        seg = np.cumsum(new) - 1
        adj_v = ts_v - seg_min[seg] + seg_base[seg]

        users = uid_v[starts]                          # sorted unique
        uid_p = p["user_id"].to_numpy()
        pos = np.searchsorted(users, uid_p)
        ok = (pos < len(users)) & (users[np.minimum(
            pos, len(users) - 1)] == uid_p)
        if not ok.any():
            return empty
        p = p[ok]
        pos = pos[ok]
        ts_p = p["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = p["cents"].to_numpy()
        adj_p = ts_p - seg_min[pos] + seg_base[pos]
        left = np.clip(np.searchsorted(adj_v, adj_p - week, side="right"),
                       starts[pos], ends[pos])
        right = np.clip(np.searchsorted(adj_v, adj_p, side="right"),
                        starts[pos], ends[pos])
        nv = right - left
        has = nv > 0
        if not has.any():
            return empty
        left, nv, cents = left[has], nv[has], cents[has]

        total = int(nv.sum())
        rep_end = np.cumsum(nv)
        # view index for each (purchase, view) pair
        offs = np.arange(total) - np.repeat(rep_end - nv, nv)
        vidx = np.repeat(left, nv) + offs
        rn = offs + 1                                   # 1-based, ts order
        base_credit = np.repeat(cents // nv, nv)
        credit = base_credit + (rn <= np.repeat(cents % nv, nv))
        out = pd.DataFrame({"vid": vid[vidx], "credit": credit,
                            "np_": np.ones(total, np.int64)})
        return out.groupby("vid", as_index=False).sum()

    pairs = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas"))
    out = collect_table(partial_groupby(
        pairs, ["vid"], {"attributed_cents": ("credit", "sum"),
                         "n_purchases": ("np_", "sum")}))
    return pa.table({
        "view_event_id": pc.cast(out["vid"], pa.int64()),
        "attributed_cents": pc.cast(out["attributed_cents"], pa.int64()),
        "n_purchases": pc.cast(out["n_purchases"], pa.int64()),
    }).sort_by("view_event_id")


def seasonal_hour_deviation(sf_dir: str,
                            lag_hours: int = 168) -> pa.Table:
    """(event_type, window_start, sum_cents, prev_week_cents,
    delta_cents): hourly revenue per type against the SAME HOUR LAST
    WEEK (``lag_hours`` = 168 back) — the seasonal-baseline anomaly
    screen (traffic is hour-of-week periodic; a raw hour-over-hour
    delta alarms every morning). Hours with no prior-week counterpart
    carry NULLs (LEFT semantics, matching the twin's self-join).

    Shape: the hourly rollup is combiner partials (the
    ``hourly_event_stats`` shape — integer cents, exact); the week-back
    lookup never re-exchanges the event table — the aggregated
    (type, hour) grid coarse-buckets by event_type hash (a bucket holds
    COMPLETE types), and one vectorized pandas self-merge per bucket
    resolves hour−lag. Oracle: hourly CTE + LEFT self-join on
    (type, hour − 168h)."""
    from raydoc.functions._buckets import reduce_bucket_count

    _HOUR_US = 3_600_000_000
    mask = reduce_bucket_count() - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hidx": pc.divide(pc.cast(t["ts"], pa.int64()),
                              pa.scalar(_HOUR_US, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    hourly = partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "hidx"], {"sum_cents": ("cents", "sum")})

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "hidx": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int32())})
        h = pd.util.hash_array(
            t.column("event_type").to_numpy(zero_copy_only=False),
            categorize=False)
        return t.append_column(
            "bucket", pa.array((h & mask).astype("int32")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        prev = g[["event_type", "hidx", "sum_cents"]].copy()
        prev["hidx"] = prev["hidx"] + lag_hours
        prev = prev.rename(columns={"sum_cents": "prev_week_cents"})
        out = g[["event_type", "hidx", "sum_cents"]].merge(
            prev, on=["event_type", "hidx"], how="left")
        out["prev_week_cents"] = out["prev_week_cents"].astype("Int64")
        out["delta_cents"] = (out["sum_cents"]
                              - out["prev_week_cents"]).astype("Int64")
        return out

    t = collect_table(
        hourly.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(per_bucket,
                                      batch_format="pandas"))
    if t.num_rows == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "window_start": pa.array([], pa.timestamp("us")),
            "sum_cents": pa.array([], pa.int64()),
            "prev_week_cents": pa.array([], pa.int64()),
            "delta_cents": pa.array([], pa.int64())})
    ws = pc.cast(pc.multiply(pc.cast(t["hidx"], pa.int64()),
                             pa.scalar(_HOUR_US, pa.int64())),
                 pa.timestamp("us"))
    out = pa.table({
        "event_type": t["event_type"],
        "window_start": ws,
        "sum_cents": pc.cast(t["sum_cents"], pa.int64()),
        "prev_week_cents": pc.cast(t["prev_week_cents"], pa.int64()),
        "delta_cents": pc.cast(t["delta_cents"], pa.int64())})
    return out.sort_by([("event_type", "ascending"),
                        ("window_start", "ascending")])


def value_robust_scale(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """(event_id, event_type, scaled_ppm): robust scaling of every
    value within its type — ⌊10⁶·(cents − median_cents) / IQR_cents⌋
    in exact integer arithmetic (the sklearn RobustScaler transform,
    kept integer so the twin hashes bit-identically; the FLOOR division
    on negative numerators uses the non-negative-remainder split that
    DuckDB's truncating ``//`` replicates exactly). Types whose IQR is
    zero (constant or near-constant values) are omitted by both
    engines.

    Shape: all three quartile ranks of every type come out of ONE
    ``_exact_group_rank_elements`` two-pass selection over the integer
    cents stream (no group in one task); the |types|-row
    (median, IQR) table broadcasts via ray.put and the transform is
    one vectorized map over the events — no exchange touches the full
    table (the value_iqr_outliers discipline)."""
    from fractions import Fraction

    import ray as _ray

    def _disc_rank(n_g: int, qf) -> int:
        return max(0, -((-n_g * qf.numerator) // qf.denominator) - 1)

    q25, q50, q75 = Fraction(1, 4), Fraction(1, 2), Fraction(3, 4)

    def ranks_of(n_g: int) -> list[int]:
        return sorted({_disc_rank(n_g, q) for q in (q25, q50, q75)})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        return pa.table({
            "event_type": t["event_type"],
            # float64 carries cents exactly to 2^53 — the selection
            # machinery is type-agnostic, order is what matters
            "value": pc.cast(pc.cast(pc.round(pc.multiply(
                t["value"], 100.0)), pa.int64()), pa.float64())})

    counts, elems = _exact_group_rank_elements(
        ds.map_batches(to_cents, batch_format="pyarrow"), ranks_of,
        num_buckets)
    med, iqr = {}, {}
    for g, n_g in counts.items():
        e = elems[g]
        med[g] = int(e[_disc_rank(n_g, q50)])
        iqr[g] = int(e[_disc_rank(n_g, q75)]) - int(e[_disc_rank(n_g,
                                                                 q25)])
    live = sorted(g for g in counts if iqr[g] > 0)
    fence_tbl = pa.table({
        "event_type": pa.array(live, pa.string()),
        "med": pa.array([med[g] for g in live], pa.int64()),
        "iqr": pa.array([iqr[g] for g in live], pa.int64())})
    fence_ref = _ray.put(fence_tbl)

    def scale(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "scaled_ppm": pa.array([], pa.int64())})
        j = t.join(_ray.get(fence_ref), keys="event_type",
                   join_type="inner")
        cents = pc.cast(pc.round(pc.multiply(j["value"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        gm = j.column("med").to_numpy(zero_copy_only=False)
        gi = j.column("iqr").to_numpy(zero_copy_only=False)
        scaled = np.floor_divide((cents - gm) * 1_000_000, gi)
        return pa.table({
            "event_id": j["event_id"],
            "event_type": j["event_type"],
            "scaled_ppm": pa.array(scaled, pa.int64())})

    t = collect_table(ds.map_batches(scale, batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "scaled_ppm": pa.array([], pa.int64())})
    return t.sort_by("event_id")


def m4_downsample(sf_dir: str, width_hours: int = 24) -> pa.Table:
    """(event_type, ts, cents): M4 time-series downsampling (Jugel et
    al., VLDB 2014) — per (event_type, time bucket of ``width_hours``)
    keep exactly the FIRST, LAST, MIN-value and MAX-value points, the
    lossless-for-line-rendering reduction used to ship billion-point
    series to a dashboard. Points are deduplicated (a bucket with one
    point emits one row).

    Scale shape: each of the four argpoints is an associative min/max
    over a 16-byte packed key ((ts,cents) big-endian for first/last,
    (cents,ts) for min/max — offset to keep negatives ordered), so the
    whole reduction is per-batch pyarrow partials followed by one
    coarse-bucket fold on aggregated rows; the raw event stream crosses
    the wire only as per-batch partials. Ties break exactly like the
    twin's ROW_NUMBER orderings (secondary key = the other component).

    Oracle: four ROW_NUMBER()=1 picks per (type, bucket) UNION'd then
    DISTINCT."""
    _HOUR_US = 3_600_000_000
    _OFF = np.uint64(1) << np.uint64(63)
    from raydoc.functions._buckets import reduce_bucket_count
    mask = reduce_bucket_count() - 1
    width_us = width_hours * _HOUR_US

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def _pack(hi: np.ndarray, lo: np.ndarray) -> pa.Array:
        n = len(hi)
        packed = np.empty((n, 16), np.uint8)
        packed[:, :8] = (hi + _OFF).astype(">u8").view(np.uint8).reshape(n, 8)
        packed[:, 8:] = (lo + _OFF).astype(">u8").view(np.uint8).reshape(n, 8)
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * 16)
        return pa.BinaryArray.from_buffers(
            pa.binary(), n, [None, offs.buffers()[1],
                             pa.py_buffer(packed.tobytes())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "hbucket": pa.array([], pa.int64()),
                             "kt_min": pa.array([], pa.binary()),
                             "kt_max": pa.array([], pa.binary()),
                             "kv_min": pa.array([], pa.binary()),
                             "kv_max": pa.array([], pa.binary())})
        tus = pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        kt = _pack(tus, cents)
        kv = _pack(cents, tus)
        base = pa.table({
            "event_type": t["event_type"],
            "hbucket": pa.array((tus.astype(np.int64)
                                 // width_us).astype(np.int64)),
            "kt": kt, "kv": kv})
        g = base.group_by(["event_type", "hbucket"]).aggregate(
            [("kt", "min"), ("kt", "max"), ("kv", "min"), ("kv", "max")])
        return g.select(["event_type", "hbucket",
                         "kt_min", "kt_max", "kv_min", "kv_max"])

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "hbucket": pa.array([], pa.int64()),
                             "kt_min": pa.array([], pa.binary()),
                             "kt_max": pa.array([], pa.binary()),
                             "kv_min": pa.array([], pa.binary()),
                             "kv_max": pa.array([], pa.binary()),
                             "bucket": pa.array([], pa.int32())})
        h = pd.util.hash_array(
            t.column("event_type").to_numpy(zero_copy_only=False),
            categorize=False)
        return t.append_column(
            "bucket", pa.array((h & mask).astype("int32")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["event_type", "hbucket"], sort=False).agg(
            kt_min=("kt_min", "min"), kt_max=("kt_max", "max"),
            kv_min=("kv_min", "min"), kv_max=("kv_max", "max"))
        out = agg.reset_index()
        rows = []
        for r in out.itertuples(index=False):
            for key, flip in ((r.kt_min, False), (r.kt_max, False),
                              (r.kv_min, True), (r.kv_max, True)):
                hi = int.from_bytes(key[:8], "big") - (1 << 63)
                lo = int.from_bytes(key[8:], "big") - (1 << 63)
                tus, cents = (lo, hi) if flip else (hi, lo)
                rows.append((r.event_type, tus, cents))
        return pd.DataFrame(rows, columns=["event_type", "tus", "cents"]) \
            .drop_duplicates()

    t = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(fold, batch_format="pandas"))
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "ts": pa.array([], pa.timestamp("us")),
                         "cents": pa.array([], pa.int64())})
    t = pa.table({
        "event_type": t["event_type"],
        "ts": pc.cast(pc.cast(t["tus"], pa.int64()), pa.timestamp("us")),
        "cents": pc.cast(t["cents"], pa.int64())})
    return t.sort_by([("event_type", "ascending"), ("ts", "ascending"),
                      ("cents", "ascending")])


def mannwhitney_value(sf_dir: str) -> pa.Table:
    """(event_type, n, rank_sum2, u2): Mann-Whitney rank-sum screen of
    each event_type's value distribution against the REST of the stream
    — the nonparametric "is this segment's metric shifted?" audit that
    needs no normality assumption. ``rank_sum2`` is twice the tie-
    averaged rank sum (×2 keeps half-ranks integer-exact) and
    ``u2 = rank_sum2 - n*(n+1)`` is twice the U statistic.

    Scale shape: global ranks never materialize — ranks are derived
    from the VALUE HISTOGRAM: rank2(v) = 2·|{x<v}| + |{x=v}| + 1, so
    the whole test reduces to one combiner groupby over (cents,
    event_type) (grid bounded by value-domain × types, NOT by row
    count) plus a driver prefix-sum over the sorted distinct cents —
    the ``value_percentiles`` regime. Oracle: window cumulative counts
    over the same grid."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    grid = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["cents", "event_type"], {"nt": ("cents", "count")}))
    if grid.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "rank_sum2": pa.array([], pa.int64()),
                         "u2": pa.array([], pa.int64())})
    df = grid.to_pandas().sort_values(["cents", "event_type"])
    per_c = df.groupby("cents", sort=True)["nt"].sum()
    cumless = per_c.cumsum().shift(fill_value=0)
    df = df.merge(per_c.rename("nc"), left_on="cents", right_index=True)
    df = df.merge(cumless.rename("cl"), left_on="cents", right_index=True)
    df["r2"] = df["nt"] * (2 * df["cl"] + df["nc"] + 1)
    out = df.groupby("event_type", sort=True).agg(
        n=("nt", "sum"), rank_sum2=("r2", "sum")).reset_index()
    out["u2"] = out["rank_sum2"] - out["n"] * (out["n"] + 1)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "rank_sum2": pa.array(out["rank_sum2"], pa.int64()),
        "u2": pa.array(out["u2"], pa.int64())})


def _hourly_cents_by_type(sf_dir: str) -> "rd.Dataset":
    """Shared combiner rollup: (event_type, hidx, y) hourly cents."""
    _HOUR_US = 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hidx": pc.divide(pc.cast(t["ts"], pa.int64()),
                              pa.scalar(_HOUR_US, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    return partial_groupby(ds.map_batches(prep, batch_format="pyarrow"),
                           ["event_type", "hidx"],
                           {"y": ("cents", "sum")})


def _type_bucketed(hourly: "rd.Dataset", empty_cols: dict) -> "rd.Dataset":
    from raydoc.functions._buckets import reduce_bucket_count
    mask = reduce_bucket_count() - 1

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            cols = dict(empty_cols)
            cols["bucket"] = pa.array([], pa.int32())
            return pa.table(cols)
        h = pd.util.hash_array(
            t.column("event_type").to_numpy(zero_copy_only=False),
            categorize=False)
        return t.append_column(
            "bucket", pa.array((h & mask).astype("int32")))

    return hourly.map_batches(add_bucket, batch_format="pyarrow")


def value_changepoint(sf_dir: str) -> pa.Table:
    """(event_type, split_hidx, n_before, n_after, stat): the single
    most likely level-shift point in each type's hourly revenue series
    — the hour AFTER which the centered-CUSUM statistic
    ``(S1*n - S*n1)^2`` peaks (S1 = prefix cents sum over the first n1
    observed hours; ties -> earliest split). The classic at-most-one-
    change screen run before alerting on a metric. ``stat`` is emitted
    as a decimal STRING: it is exact at ~10^28 and would overflow
    int64 (the twin compares in HUGEINT and casts to VARCHAR).

    Shape: the raw stream folds to (type, hour) combiner partials; the
    argmax scans each type's AGGREGATED series (bounded by the time
    span, never by row count) inside a coarse type-bucket group with
    exact Python-int arithmetic. Oracle: window cumulative sums +
    ROW_NUMBER over the HUGEINT statistic."""
    hourly = _hourly_cents_by_type(sf_dir)
    empty = {"event_type": pa.array([], pa.string()),
             "hidx": pa.array([], pa.int64()),
             "y": pa.array([], pa.int64())}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("hidx", ignore_index=True)
            ys = [int(v) for v in grp["y"]]
            n = len(ys)
            if n < 2:
                continue
            total = sum(ys)
            best_k, best_stat = None, -1
            s1 = 0
            for k in range(1, n):          # split after k-th observation
                s1 += ys[k - 1]
                stat = (s1 * n - total * k) ** 2
                if stat > best_stat:
                    best_k, best_stat = k, stat
            rows.append((et, int(grp["hidx"].iloc[best_k - 1]),
                         best_k, n - best_k, str(best_stat)))
        return pd.DataFrame(rows, columns=[
            "event_type", "split_hidx", "n_before", "n_after", "stat"])

    t = collect_table(
        _type_bucketed(hourly, empty)
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "split_hidx": pa.array([], pa.int64()),
                         "n_before": pa.array([], pa.int64()),
                         "n_after": pa.array([], pa.int64()),
                         "stat": pa.array([], pa.string())})
    return pa.table({
        "event_type": t["event_type"],
        "split_hidx": pc.cast(t["split_hidx"], pa.int64()),
        "n_before": pc.cast(t["n_before"], pa.int64()),
        "n_after": pc.cast(t["n_after"], pa.int64()),
        "stat": pc.cast(t["stat"], pa.string())}).sort_by("event_type")


def holt_forecast_hourly(sf_dir: str) -> pa.Table:
    """(event_type, n_hours, level, trend, forecast_next): Holt linear-
    trend exponential smoothing over each type's DENSE hourly revenue
    series (missing hours are genuine zeros), in integer fixed point so
    the recursive-CTE twin hashes bit-identically: alpha=1/4, beta=1/10
    with FLOOR division —
        l_t = floor((y_t + 3*(l_{t-1} + b_{t-1})) / 4)
        b_t = floor(((l_t - l_{t-1}) + 9*b_{t-1}) / 10)
    seeded l_0 = y_0, b_0 = 0; ``forecast_next = level + trend`` is the
    one-step-ahead revenue forecast — the capacity-planning primitive.

    Shape: combiner partials fold the stream to (type, hour); the
    recurrence is inherently sequential but runs on the AGGREGATED
    series (len = time-span hours, independent of row count) inside a
    coarse type-bucket group. Oracle: WITH RECURSIVE over the
    generate_series-densified grid with the same remainder-split floor
    divisions."""
    hourly = _hourly_cents_by_type(sf_dir)
    empty = {"event_type": pa.array([], pa.string()),
             "hidx": pa.array([], pa.int64()),
             "y": pa.array([], pa.int64())}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("hidx", ignore_index=True)
            h0, h1 = int(grp["hidx"].iloc[0]), int(grp["hidx"].iloc[-1])
            dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
            dense[(grp["hidx"].to_numpy() - h0)] = grp["y"].to_numpy()
            lvl = int(dense[0])
            trd = 0
            for y in dense[1:]:
                prev = lvl
                lvl = (int(y) + 3 * (lvl + trd)) // 4
                trd = ((lvl - prev) + 9 * trd) // 10
            rows.append((et, len(dense), lvl, trd, lvl + trd))
        return pd.DataFrame(rows, columns=[
            "event_type", "n_hours", "level", "trend", "forecast_next"])

    t = collect_table(
        _type_bucketed(hourly, empty)
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_hours": pa.array([], pa.int64()),
                         "level": pa.array([], pa.int64()),
                         "trend": pa.array([], pa.int64()),
                         "forecast_next": pa.array([], pa.int64())})
    return pa.table({
        "event_type": t["event_type"],
        "n_hours": pc.cast(t["n_hours"], pa.int64()),
        "level": pc.cast(t["level"], pa.int64()),
        "trend": pc.cast(t["trend"], pa.int64()),
        "forecast_next": pc.cast(t["forecast_next"], pa.int64())}) \
        .sort_by("event_type")


def hourly_gaps(sf_dir: str) -> pa.Table:
    """(event_type, n_hours_span, n_observed, n_missing, longest_gap):
    feed-outage detection — hours inside each type's [first, last]
    hourly span that recorded NO events, plus the longest consecutive
    silent stretch. The data-freshness monitor that catches a
    partially-dead ingest long before volumes drift.

    Shape: the stream folds to (type, hour) combiner partials; gap
    arithmetic runs on each type's AGGREGATED hour list (bounded by
    the time span) inside a coarse type-bucket group. Oracle: dense
    unnest(range) grid anti-join + window-diff longest gap."""
    hourly = _hourly_cents_by_type(sf_dir)
    empty = {"event_type": pa.array([], pa.string()),
             "hidx": pa.array([], pa.int64()),
             "y": pa.array([], pa.int64())}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            h = np.sort(grp["hidx"].to_numpy())
            span = int(h[-1] - h[0] + 1)
            n_obs = len(h)
            diffs = np.diff(h)
            longest = int(diffs.max() - 1) if len(diffs) else 0
            rows.append((et, span, n_obs, span - n_obs, max(longest, 0)))
        return pd.DataFrame(rows, columns=[
            "event_type", "n_hours_span", "n_observed", "n_missing",
            "longest_gap"])

    t = collect_table(
        _type_bucketed(hourly, empty)
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_hours_span": pa.array([], pa.int64()),
                         "n_observed": pa.array([], pa.int64()),
                         "n_missing": pa.array([], pa.int64()),
                         "longest_gap": pa.array([], pa.int64())})
    return pa.table({
        "event_type": t["event_type"],
        "n_hours_span": pc.cast(t["n_hours_span"], pa.int64()),
        "n_observed": pc.cast(t["n_observed"], pa.int64()),
        "n_missing": pc.cast(t["n_missing"], pa.int64()),
        "longest_gap": pc.cast(t["longest_gap"], pa.int64())}) \
        .sort_by("event_type")


def session_entry_stats(sf_dir: str, gap_minutes: int = 30,
                        num_buckets: int | None = None) -> pa.Table:
    """(entry_type, n_sessions, n_bounces, total_events,
    total_duration_us): landing-page analytics over 30-minute-gap
    sessions — per ENTRY event type (the session's first event under
    (ts, event_id) order): session count, single-event bounces, event
    volume and total dwell time. The funnel-health rollup sitting one
    level above ``sessionize``.

    Shape: the ``sessionize`` coarse-user-bucket scan (whole blocks,
    vectorized sort + diff; no per-user micro-groups) emits per-bucket
    per-entry-type partials; one tiny combiner groupby finishes.
    Oracle: LAG gap flags + window cumsum sid + FIRST_VALUE entry."""
    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_session = np.empty(len(g), dtype=bool)
        new_session[0] = True
        new_session[1:] = uid[1:] != uid[:-1]
        if len(g) > 1:
            new_session[1:] |= np.diff(ts) > gap
        sid = np.cumsum(new_session)
        df = pd.DataFrame({
            "sid": sid, "entry_type": g["event_type"].to_numpy(),
            "tus": ts.astype("datetime64[us]").astype(np.int64)})
        per = df.groupby("sid", sort=False).agg(
            entry_type=("entry_type", "first"),
            ne=("tus", "size"), lo=("tus", "min"), hi=("tus", "max"))
        per["bounce"] = (per["ne"] == 1).astype(np.int64)
        per["dur"] = per["hi"] - per["lo"]
        per["one"] = np.int64(1)
        out = per.groupby("entry_type", sort=False).agg(
            n_sessions=("one", "sum"), n_bounces=("bounce", "sum"),
            total_events=("ne", "sum"),
            total_duration_us=("dur", "sum")).reset_index()
        return out

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas"))
    t = collect_table(partial_groupby(parts, ["entry_type"], {
        "n_sessions": ("n_sessions", "sum"),
        "n_bounces": ("n_bounces", "sum"),
        "total_events": ("total_events", "sum"),
        "total_duration_us": ("total_duration_us", "sum")}))
    if t.num_rows == 0:
        return pa.table({
            "entry_type": pa.array([], pa.string()),
            "n_sessions": pa.array([], pa.int64()),
            "n_bounces": pa.array([], pa.int64()),
            "total_events": pa.array([], pa.int64()),
            "total_duration_us": pa.array([], pa.int64())})
    return pa.table({
        "entry_type": t["entry_type"],
        "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
        "n_bounces": pc.cast(t["n_bounces"], pa.int64()),
        "total_events": pc.cast(t["total_events"], pa.int64()),
        "total_duration_us": pc.cast(t["total_duration_us"],
                                     pa.int64())}).sort_by("entry_type")


def quantile_normalize_values(sf_dir: str,
                              num_buckets: int | None = None
                              ) -> pa.Table:
    """(event_id, event_type, qnorm_cents): quantile normalization —
    every event's value is replaced by the GLOBAL order statistic at
    its within-type rank position (rk·(N−1)//(n_t−1)), mapping each
    type's distribution exactly onto the pooled one. The batch-effect
    remover (microarray-style) for metrics whose per-segment scales
    drift; all arithmetic integer-exact.

    Shape: no global sort of rows — the global order statistic comes
    from the VALUE HISTOGRAM (combiner groupby over cents, driver
    prefix-scan over the bounded distinct-value domain, searchsorted
    lookup); within-type ranks need row identity only at TIE
    resolution, so rows exchange once on a (type, cents) hash bucket
    and rank = per-type cum-less(cents) + local event_id order.
    Oracle: two ROW_NUMBER windows + position join."""
    from raydoc.functions._buckets import reduce_bucket_count

    import ray as _ray

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "cents": pa.array([], pa.int64())})
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()
    grid = collect_table(partial_groupby(
        rows, ["event_type", "cents"], {"n": ("cents", "count")}))
    if grid.num_rows == 0:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "qnorm_cents": pa.array([], pa.int64())})
    gdf = grid.to_pandas().sort_values(["event_type", "cents"],
                                       ignore_index=True)
    # per-type cumulative-less and sizes
    gdf["cumless_t"] = (gdf.groupby("event_type")["n"].cumsum()
                        - gdf["n"])
    n_t = gdf.groupby("event_type")["n"].sum().to_dict()
    # global histogram: sorted distinct cents + inclusive cum counts
    gg = gdf.groupby("cents", sort=True)["n"].sum()
    gvals = gg.index.to_numpy(dtype=np.int64)
    gcum = gg.to_numpy(dtype=np.int64).cumsum()
    n_total = int(gcum[-1])
    cumless_map = {(r.event_type, int(r.cents)): int(r.cumless_t)
                   for r in gdf.itertuples(index=False)}
    ref = _ray.put((cumless_map, n_t, gvals, gcum, n_total))

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "cents": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        h = (pd.util.hash_array(
            t.column("event_type").to_numpy(zero_copy_only=False),
            categorize=False)
            ^ pd.util.hash_array(
                t.column("cents").to_numpy(zero_copy_only=False)))
        return t.append_column(
            "bucket", pa.array((h & mask).astype("int32")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cumless_m, nt_m, gv, gc, n = _ray.get(ref)
        g = g.sort_values(["event_type", "cents", "event_id"],
                          ignore_index=True)
        local = g.groupby(["event_type", "cents"], sort=False).cumcount()
        et = g["event_type"].to_numpy()
        cv = g["cents"].to_numpy()
        rk = np.fromiter(
            (cumless_m[(e, int(c))] for e, c in zip(et, cv)),
            dtype=np.int64, count=len(g)) + local.to_numpy()
        ntv = np.fromiter((nt_m[e] for e in et), dtype=np.int64,
                          count=len(g))
        pos = np.where(ntv > 1, rk * (n - 1) // np.maximum(ntv - 1, 1),
                       (n - 1) // 2)
        qn = gv[np.searchsorted(gc, pos, side="right")]
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "event_type": et, "qnorm_cents": qn})

    t = collect_table(
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(per_bucket,
                                      batch_format="pandas"))
    return pa.table({
        "event_id": pc.cast(t["event_id"], pa.int64()),
        "event_type": pc.cast(t["event_type"], pa.string()),
        "qnorm_cents": pc.cast(t["qnorm_cents"], pa.int64())}) \
        .sort_by("event_id")


def event_type_stationary(sf_dir: str, n_iter: int = 10,
                          scale: int = 10 ** 12) -> pa.Table:
    """(event_type, stationary_fp): the long-run state mix of the
    per-user event-type Markov chain — ``n_iter`` synchronous power-
    iteration steps over the row-stochastic transition matrix in
    integer fixed point (``scale`` = 1.0): p_ij = n_ij·scale // n_i,
    pi'_j = Σ_i pi_i·p_ij // scale, seeded uniform. Fixed iteration
    count + floor division tie the result bit-for-bit to the unrolled
    chained-CTE twin (the ``pagerank`` discipline). States with no
    outgoing transition drop their mass (sub-stochastic, deterministic
    in both engines).

    Shape: the heavy work is the distributed ``event_transitions``
    bigram count (coarse user buckets + combiner); the |types|² matrix
    then iterates on the driver — the aggregated-series regime."""
    tr = event_transitions(sf_dir).to_pandas()
    if tr.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "stationary_fp": pa.array([], pa.int64())})
    states = sorted(set(tr["prev_type"]) | set(tr["event_type"]))
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    n_ij = [[0] * k for _ in range(k)]
    for r in tr.itertuples(index=False):
        n_ij[idx[r.prev_type]][idx[r.event_type]] = int(r.n)
    row_sum = [sum(row) for row in n_ij]
    p = [[(n_ij[i][j] * scale // row_sum[i]) if row_sum[i] else 0
          for j in range(k)] for i in range(k)]
    pi = [scale // k] * k
    for _ in range(n_iter):
        pi = [sum(pi[i] * p[i][j] // scale for i in range(k))
              for j in range(k)]
    return pa.table({
        "event_type": pa.array(states, pa.string()),
        "stationary_fp": pa.array(pi, pa.int64())})


def interevent_gap_percentiles(sf_dir: str,
                               qs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                                        0.9, 0.99),
                               num_buckets: int | None = None
                               ) -> pa.Table:
    """(q, gap_us): EXACT percentiles of per-user inter-event gaps —
    the arrival-process / engagement-latency distribution (p99 gap is
    the "has this feed stalled for anyone" alarm). Gap = microseconds
    since the same user's previous event under (ts, event_id) order;
    rank-element semantics (1-based rank = floor((n−1)·q)+1 under
    (gap, event_id) order) keep it bit-identical to the twin.

    Shape: gaps derive in coarse user buckets (vectorized sort +
    shift, the ``events_with_prev`` scan); percentiles then reuse the
    ``value_percentiles`` decomposition — ONE global sort of the gap
    rows and ``split_at_indices`` at the precomputed ranks; only the
    first row of each split is fetched."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        tus = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = np.empty(len(g), np.int64)
        gap[1:] = tus[1:] - tus[:-1]
        return pd.DataFrame({
            "gap_us": gap[same],
            "event_id": g["event_id"].to_numpy()[same]})

    gaps = (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas")
            ).materialize()
    n = gaps.count()
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "gap_us": pa.array([], pa.int64())})
    idxs = [int((n - 1) * q) for q in qs]
    uniq = sorted(set(idxs))
    splits = gaps.sort(["gap_us", "event_id"]).split_at_indices(uniq)
    at_rank = {ix: splits[i + 1].take(1)[0]["gap_us"]
               for i, ix in enumerate(uniq)}
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "gap_us": pa.array([int(at_rank[ix]) for ix in idxs],
                           pa.int64())})


def hour_of_week_profile(sf_dir: str) -> pa.Table:
    """(event_type, how, n_events, sum_cents): the 168-cell hour-of-week
    traffic fingerprint per type (how = hours-since-epoch mod 168,
    epoch-anchored — a pure modular index, no calendar/timezone
    dependency). The seasonal-baseline table ``seasonal_hour_deviation``
    compares against, exposed directly for capacity planning.

    Shape: one combiner groupby — per-batch partials only."""
    _HOUR_US = 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        hidx = pc.divide(pc.cast(t["ts"], pa.int64()),
                         pa.scalar(_HOUR_US, pa.int64()))
        return pa.table({
            "event_type": t["event_type"],
            "how": pc.subtract(hidx, pc.multiply(
                pc.divide(hidx, pa.scalar(168, pa.int64())),
                pa.scalar(168, pa.int64()))),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    t = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "how"],
        {"n_events": ("cents", "count"), "sum_cents": ("cents", "sum")}))
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "how": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "sum_cents": pa.array([], pa.int64())})
    return pa.table({
        "event_type": t["event_type"],
        "how": pc.cast(t["how"], pa.int64()),
        "n_events": pc.cast(t["n_events"], pa.int64()),
        "sum_cents": pc.cast(t["sum_cents"], pa.int64())}).sort_by(
        [("event_type", "ascending"), ("how", "ascending")])


def user_activity_histogram(sf_dir: str) -> pa.Table:
    """(magnitude, n_users, n_events): the user-activity SKEW profile —
    users bucketed by the bit length of their event count (magnitude m
    covers counts in [2^(m-1), 2^m)). The one-glance answer to "will a
    per-user shuffle group explode": a heavy top magnitude says salt
    the hot keys. Shape: per-user combiner counts, then a tiny
    magnitude combiner. Oracle: GROUP BY user -> length(printf('%b'))."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "one": pa.array(
                             np.ones(t.num_rows, np.int64))})

    per_user = partial_groupby(ds.map_batches(one,
                                              batch_format="pyarrow"),
                               ["user_id"], {"n": ("one", "sum")})

    def mag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.schema.names:
            return pa.table({"magnitude": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64()),
                             "ev": pa.array([], pa.int64())})
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.frompyfunc(int.bit_length, 1, 1)(n).astype(np.int64)
        return pa.table({"magnitude": pa.array(m),
                         "one": pa.array(np.ones(len(n), np.int64)),
                         "ev": pa.array(n)})

    t = collect_table(partial_groupby(
        per_user.map_batches(mag, batch_format="pyarrow"),
        ["magnitude"], {"n_users": ("one", "sum"),
                        "n_events": ("ev", "sum")}))
    if t.num_rows == 0:
        return pa.table({"magnitude": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    return pa.table({
        "magnitude": pc.cast(t["magnitude"], pa.int64()),
        "n_users": pc.cast(t["n_users"], pa.int64()),
        "n_events": pc.cast(t["n_events"], pa.int64())}).sort_by(
        "magnitude")


def hourly_duplicate_rate(sf_dir: str) -> pa.Table:
    """(window_start, n_events, n_distinct, n_dupes): per tumbling hour,
    how many events repeat an identical (user, type, value) tuple
    already seen that hour — the streaming-ingest duplicate monitor
    (at-least-once upstream delivery shows up as a rising dupe rate
    long before totals drift). n_dupes = n_events − n_distinct, so no
    within-hour ordering is needed — two combiner exchanges, both on
    hashes/short keys.

    Exactness: values compare in integer cents."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type",
                                  "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
            "one": pa.array([1] * t.num_rows, pa.int64()),
        })

    groups = partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["window_start", "user_id", "event_type", "cents"],
        {"n": ("one", "sum")})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "window_start" not in t.schema.names:
            z = pa.array([], pa.int64())
            return pa.table({"window_start": pa.array(
                [], pa.timestamp("us")), "n_events": z, "n_distinct": z})
        return pa.table({
            "window_start": t["window_start"],
            "n_events": t["n"],
            "n_distinct": pa.array([1] * t.num_rows, pa.int64())})

    out = collect_table(partial_groupby(
        groups.map_batches(fold, batch_format="pyarrow"),
        ["window_start"], {"n_events": ("n_events", "sum"),
                           "n_distinct": ("n_distinct", "sum")}))
    out = out.set_column(
        out.schema.get_field_index("window_start"), "window_start",
        out.column("window_start").cast(pa.timestamp("us")))
    ne = out.column("n_events").to_pylist()
    nd = out.column("n_distinct").to_pylist()
    return pa.table({
        "window_start": out.column("window_start"),
        "n_events": pa.array([int(v) for v in ne], pa.int64()),
        "n_distinct": pa.array([int(v) for v in nd], pa.int64()),
        "n_dupes": pa.array([int(a) - int(b) for a, b in zip(ne, nd)],
                            pa.int64())}).sort_by("window_start")
