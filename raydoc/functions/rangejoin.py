"""Range (interval-containment) join — the second non-equi join family
Ray Data lacks natively (brief: "as-of join, range join").

``range_join(points, intervals, ...)`` pairs every point row with every
interval row of the same key whose ``[start, end]`` contains the point's
``ts``. Scale shape: intervals explode into the time GRANULES they cover
(explosion factor = interval length / granule — pick a granule near the
typical interval length), points map to their single granule, and the two
sides meet in ONE equi-join on the composite (key, granule) via the
bucketed hash join, followed by an exact containment filter. Each
qualifying (point, interval) pair meets exactly once — in the point's own
granule — so no dedup pass is needed.

Oracle for the wired query: DuckDB's native inequality join (IEJoin).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raydoc.functions.joins import bucket_hash_join


def range_join(points: rd.Dataset, intervals: rd.Dataset, key: str,
               ts: str = "ts", start: str = "start", end: str = "end",
               granule_us: int = 30 * 60 * 1_000_000,
               num_buckets: int = 32,
               on_invalid: str = "raise") -> rd.Dataset:
    """Inner containment join; output = point columns + interval columns
    (minus the interval side's ``key``, folded into the composite).

    ``on_invalid``: what to do with interval rows where end < start —
    ``"raise"`` (default, a clear ValueError instead of a cryptic
    np.repeat failure deep in the pipeline) or ``"drop"``. A warning is
    emitted when some interval explodes into > 10 000 granules (pick a
    coarser ``granule_us`` — the explosion factor is interval length /
    granule)."""
    if on_invalid not in ("raise", "drop"):
        raise ValueError(f"on_invalid must be 'raise' or 'drop', "
                         f"got {on_invalid!r}")

    def _us(col) -> pa.ChunkedArray:
        return pc.cast(col, pa.int64())

    def pt_widen(t: pa.Table) -> pa.Table:
        # numpy floor division, NOT pc.divide (which truncates toward
        # zero) — must match the interval side's // so pre-epoch
        # timestamps land in the same granule on both sides
        g = _us(t[ts]).to_numpy() // granule_us
        ck = pc.binary_join_element_wise(
            pc.cast(t[key], pa.string()),
            pc.cast(pa.array(g, pa.int64()), pa.string()), "|")
        return t.append_column("__ck", ck)

    def iv_widen(t: pa.Table) -> pa.Table:
        s_us = _us(t[start]).to_numpy()
        e_us = _us(t[end]).to_numpy()
        invalid = e_us < s_us
        if invalid.any():
            if on_invalid == "raise":
                raise ValueError(
                    f"range_join: {int(invalid.sum())} interval row(s) "
                    f"with {end} < {start} (first at batch offset "
                    f"{int(np.argmax(invalid))}); pass on_invalid='drop' "
                    f"to skip them")
            t = t.filter(pa.array(~invalid))
            s_us, e_us = s_us[~invalid], e_us[~invalid]
        g0 = s_us // granule_us
        g1 = e_us // granule_us
        reps = (g1 - g0 + 1).astype(np.int64)
        if len(reps) and reps.max() > 10_000:
            import warnings
            warnings.warn(
                f"range_join: an interval spans {int(reps.max())} granules "
                f"(granule_us={granule_us}); consider a coarser granule",
                RuntimeWarning, stacklevel=2)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        # granule sequence per exploded row
        offs = np.concatenate([np.arange(r) for r in reps]) if len(reps) else \
            np.array([], dtype=np.int64)
        granules = np.repeat(g0, reps) + offs
        out = t.take(pa.array(idx))
        ck = pc.binary_join_element_wise(
            pc.cast(out[key], pa.string()),
            pc.cast(pa.array(granules, pa.int64()), pa.string()), "|")
        out = out.append_column("__ck", ck)
        return out.drop_columns([key])   # key survives inside __ck + point side

    pts = points.map_batches(pt_widen, batch_format="pyarrow")
    ivs = intervals.map_batches(iv_widen, batch_format="pyarrow")
    joined = bucket_hash_join(pts, ivs, key="__ck", num_buckets=num_buckets)

    def contain(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(_us(t[ts]), _us(t[start])),
                       pc.less_equal(_us(t[ts]), _us(t[end])))
        return t.filter(keep).drop_columns(["__ck"])

    return joined.map_batches(contain, batch_format="pyarrow")


def q_clicks_after_error(sf_dir: str,
                         window_minutes: int = 30) -> pa.Table:
    """(error_id, click_id): every click within ``window_minutes`` AFTER an
    error by the same user (inclusive bounds). Oracle: DuckDB inequality
    join."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    win_us = window_minutes * 60 * 1_000_000

    def mk_points(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "click_id": t["event_id"]})

    def mk_intervals(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        s = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "start": pc.cast(s, pa.timestamp("us")),
            "end": pc.cast(pc.add(s, win_us), pa.timestamp("us")),
            "error_id": t["event_id"],
        })

    points = ev.map_batches(mk_points, batch_format="pyarrow")
    intervals = ev.map_batches(mk_intervals, batch_format="pyarrow")
    pairs = range_join(points, intervals, key="user_id",
                       granule_us=win_us)

    from raydoc.functions._collect import collect_table
    t = collect_table(pairs)
    out = pa.table({"error_id": t["error_id"].cast(pa.int64()),
                    "click_id": t["click_id"].cast(pa.int64())})
    return out.sort_by([("error_id", "ascending"),
                        ("click_id", "ascending")])


def bbox_containment_antijoin(elements: rd.Dataset, regions: rd.Dataset,
                              key: str = "page_id",
                              num_buckets: int = 32) -> rd.Dataset:
    """Geometric anti-join (J2, ≙ the reference's text-in-table removal,
    structure_engine.py text/bbox containment): drop every element whose
    bbox lies fully inside ANY same-key region bbox. The extraction path
    keeps its domain analog (pipe-row absorption at elementize); this is
    the general operator for layouts that carry real geometry.

    Shape: both sides hash-bucket on the page key (one exchange); each
    block resolves containment with a vectorized interval test
    (elements × regions within one page — the per-page region count is
    small by construction). Expects ``bbox`` = [x0, y0, x1, y1] on both
    sides; region rows need no other columns."""
    from raydoc.functions.joins import arrow_field_types, tag_union

    ekey_cols = list(elements.schema().names)
    # schema computed ONCE on the driver; regions contribute no new
    # columns (key + bbox are shared names, other element columns pad to
    # null on region rows)
    all_fields = arrow_field_types(elements.schema(), ekey_cols)
    regions = regions.select_columns([key, "bbox"])
    tagged = tag_union(elements, regions, key, all_fields, num_buckets)

    def resolve(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        keys = np.asarray(g.column(key).to_pylist())
        boxes = np.array(g.column("bbox").to_pylist(), dtype=np.float64)
        elem_ix = np.where(side == 0)[0]
        reg_ix = np.where(side == 1)[0]
        if len(reg_ix) == 0 or len(elem_ix) == 0:
            keep_rows = elem_ix
        else:
            eb, rb = boxes[elem_ix], boxes[reg_ix]
            ek, rk = keys[elem_ix], keys[reg_ix]
            # (E, R) containment: inside in all four coordinates + same key
            inside = ((eb[:, None, 0] >= rb[None, :, 0]) &
                      (eb[:, None, 1] >= rb[None, :, 1]) &
                      (eb[:, None, 2] <= rb[None, :, 2]) &
                      (eb[:, None, 3] <= rb[None, :, 3]) &
                      (ek[:, None] == rk[None, :]))
            keep_rows = elem_ix[~inside.any(axis=1)]
        out = g.take(pa.array(np.sort(keep_rows)))
        return out.select(ekey_cols)

    return tagged.groupby("__bucket").map_groups(resolve,
                                                 batch_format="pyarrow")


def interval_overlap_join(left: rd.Dataset, right: rd.Dataset,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          key: str | None = None,
                          granule_us: int = 60 * 60 * 1_000_000,
                          num_buckets: int = 32,
                          on_invalid: str = "raise",
                          broadcast_max: int | None = 100_000
                          ) -> rd.Dataset:
    """Inner interval-OVERLAP join — the third non-equi join family
    (genomics/temporal "ranges intersect", vs ``range_join``'s
    point-in-interval): pairs every left row with every right row whose
    CLOSED interval intersects it (``l_start ≤ r_end AND r_start ≤
    l_end``), optionally per ``key``.

    Scale shape: BOTH sides granule-explode and meet in one bucketed
    equi-join on (key, granule). A qualifying pair co-occurs in every
    shared granule, so the join would duplicate it — the dedup-free
    trick: a pair's shared granule range starts at
    ``g(max(l_start, r_start))``, and the post-join filter keeps the
    pair ONLY in that granule. One exchange, no distinct pass, exact
    output. Column names across the two sides must be disjoint.

    ADAPTIVE regime (the ``bucket_semi_join`` pattern): when ``key`` is
    None the right side materializes first; if it holds ≤
    ``broadcast_max`` intervals it broadcasts once (``ray.put``) as a
    granule-indexed lookup and the left side NEVER exchanges — each map
    task probes its rows' granule range and applies the same exact
    filter + first-shared-granule dedup rule, so the output is
    bit-identical to the exchange path (asserted by the randomized
    brute-force tests at both regimes). Right choice whenever the right
    side is intrinsically bounded (outage windows, calendar spans).
    ``broadcast_max=None`` forces the exchange path."""
    if on_invalid not in ("raise", "drop"):
        raise ValueError(f"on_invalid must be 'raise' or 'drop', "
                         f"got {on_invalid!r}")

    if broadcast_max is not None and key is None:
        right = right.materialize()
        if right.count() <= broadcast_max:
            return _interval_overlap_broadcast(
                left, right, l_start, l_end, r_start, r_end,
                granule_us, on_invalid)

    def _us(col):
        return pc.cast(col, pa.int64())

    def _explode(start: str, end: str, side: str):
        def fn(t: pa.Table) -> pa.Table:
            s_us = _us(t[start]).to_numpy()
            e_us = _us(t[end]).to_numpy()
            invalid = e_us < s_us
            if invalid.any():
                if on_invalid == "raise":
                    raise ValueError(
                        f"interval_overlap_join: {int(invalid.sum())} "
                        f"{side} row(s) with {end} < {start}; pass "
                        f"on_invalid='drop' to skip them")
                t = t.filter(pa.array(~invalid))
                s_us, e_us = s_us[~invalid], e_us[~invalid]
            g0 = s_us // granule_us
            g1 = e_us // granule_us
            reps = (g1 - g0 + 1).astype(np.int64)
            if len(reps) and reps.max() > 10_000:
                import warnings
                warnings.warn(
                    f"interval_overlap_join: a {side} interval spans "
                    f"{int(reps.max())} granules; consider a coarser "
                    f"granule_us", RuntimeWarning, stacklevel=2)
            idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
            offs = np.concatenate([np.arange(r) for r in reps]) \
                if len(reps) else np.array([], dtype=np.int64)
            granules = np.repeat(g0, reps) + offs
            out = t.take(pa.array(idx))
            gstr = pc.cast(pa.array(granules, pa.int64()), pa.string())
            if key is not None:
                ck = pc.binary_join_element_wise(
                    pc.cast(out[key], pa.string()), gstr, "|")
                if side == "right":
                    out = out.drop_columns([key])
            else:
                ck = gstr
            out = out.append_column("__ck", ck)
            if side == "left":
                out = out.append_column(
                    "__g", pa.array(granules, pa.int64()))
            return out
        return fn

    lx = left.map_batches(_explode(l_start, l_end, "left"),
                          batch_format="pyarrow")
    rx = right.map_batches(_explode(r_start, r_end, "right"),
                           batch_format="pyarrow")
    joined = bucket_hash_join(lx, rx, key="__ck",
                              num_buckets=num_buckets)

    def exact(t: pa.Table) -> pa.Table:
        # numpy floor division, NOT pc.divide (trunc-toward-zero) —
        # must match the explode side's // for pre-epoch timestamps
        ls = _us(t[l_start]).to_numpy()
        le = _us(t[l_end]).to_numpy()
        rs = _us(t[r_start]).to_numpy()
        re = _us(t[r_end]).to_numpy()
        overlap = (ls <= re) & (rs <= le)
        first_g = np.maximum(ls, rs) // granule_us
        keep = overlap & (first_g == t["__g"].to_numpy())
        return t.filter(pa.array(keep)).drop_columns(["__ck", "__g"])

    return joined.map_batches(exact, batch_format="pyarrow")


def q_session_outage_overlap(sf_dir: str,
                             err_threshold: int = 2) -> pa.Table:
    """(user_id, n_overlaps): how many system-wide OUTAGE hours (hours
    with ≥ ``err_threshold`` error events) each user's per-day activity
    span overlaps. Both interval sets derive distributedly (per-(user,
    day) min/max span via combiner group-by; outage hours via an
    error-count group-by) — but the outage side is BOUNDED BY TIME, not
    by corpus size (one candidate row per wall-clock hour), so instead
    of paying the interval-join exchange it broadcasts once as a sorted
    hour-index array and each span counts its overlaps with two
    vectorized searchsorteds (an hour h overlaps [a_start, a_end] iff
    h ∈ [a_start//H, a_end//H]). Two exchanges total (span fold + final
    per-user fold); the general ``interval_overlap_join`` remains the
    path for two UNBOUNDED interval sets (value_band_pairs et al)."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    _DAY = 86_400_000_000
    _HOUR = 3_600_000_000
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def day_prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(us, pa.scalar(_DAY, pa.int64())),
            "us": us})

    spans = partial_groupby(
        ev.map_batches(day_prep, batch_format="pyarrow"),
        ["user_id", "day"], {"a_start": ("us", "min"),
                             "a_end": ("us", "max")}).map_batches(
        lambda t: t.drop_columns(["day"]), batch_format="pyarrow")

    def err_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "hour": pc.divide(us, pa.scalar(_HOUR, pa.int64())),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    hours = partial_groupby(
        ev.map_batches(err_prep, batch_format="pyarrow"),
        ["hour"], {"c": ("one", "sum")})

    def to_outage(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(
            t["c"], pa.scalar(err_threshold, pa.int64())))
        return pa.table({"hour": t["hour"]})

    import ray as _ray
    outage_hours = np.sort(collect_table(
        hours.map_batches(to_outage, batch_format="pyarrow"))
        .column("hour").to_numpy(zero_copy_only=False).astype(np.int64))
    hours_ref = _ray.put(outage_hours)

    def count_overlaps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        oh = _ray.get(hours_ref)
        a0 = t.column("a_start").to_numpy(zero_copy_only=False) // _HOUR
        a1 = t.column("a_end").to_numpy(zero_copy_only=False) // _HOUR
        n = (np.searchsorted(oh, a1, "right")
             - np.searchsorted(oh, a0, "left")).astype(np.int64)
        keep = n > 0          # inner-join semantics: zero-overlap spans
        g = pa.table({        # (and users) never surface
            "user_id": t.column("user_id").filter(pa.array(keep)),
            "n": pa.array(n[keep])}) \
            .group_by("user_id", use_threads=False).aggregate(
            [("n", "sum")])
        return g.rename_columns(["user_id", "n"])

    out = partial_groupby(
        spans.map_batches(count_overlaps, batch_format="pyarrow"),
        ["user_id"], {"n_overlaps": ("n", "sum")})
    t = collect_table(out)
    return pa.table({"user_id": t["user_id"].cast(pa.int64()),
                     "n_overlaps": t["n_overlaps"].cast(pa.int64()),
                     }).sort_by("user_id")


def _interval_overlap_broadcast(left: "rd.Dataset", right: "rd.Dataset",
                                l_start: str, l_end: str,
                                r_start: str, r_end: str,
                                granule_us: int,
                                on_invalid: str) -> "rd.Dataset":
    """Broadcast regime of ``interval_overlap_join`` (key=None): the
    small right side ships once as a granule→row-indices lookup; each
    left map task cross-checks only its rows' granules. Same exact
    overlap filter and first-shared-granule pair-dedup rule as the
    exchange path."""
    import ray as _ray
    from raydoc.functions._collect import collect_table
    from raydoc.functions.joins import arrow_field_types

    rt = collect_table(right)
    if rt.num_rows and r_start in rt.column_names:
        rs = pc.cast(rt[r_start], pa.int64()).to_numpy()
        re_ = pc.cast(rt[r_end], pa.int64()).to_numpy()
        invalid = re_ < rs
        if invalid.any():
            if on_invalid == "raise":
                raise ValueError(
                    f"interval_overlap_join: {int(invalid.sum())} right "
                    f"row(s) with {r_end} < {r_start}; pass "
                    f"on_invalid='drop' to skip them")
            rt = rt.filter(pa.array(~invalid))
            rs, re_ = rs[~invalid], re_[~invalid]
    else:
        rs = np.array([], dtype=np.int64)
        re_ = np.array([], dtype=np.int64)

    gd_lists: dict[int, list[int]] = {}
    for i in range(len(rs)):
        for g in range(int(rs[i] // granule_us),
                       int(re_[i] // granule_us) + 1):
            gd_lists.setdefault(g, []).append(i)
    gd = {g: np.asarray(v, dtype=np.int64) for g, v in gd_lists.items()}
    right_ref = _ray.put((rs, re_, gd, rt))

    left_schema = left.schema()
    lcols = list(left_schema.names)
    out_fields = arrow_field_types(left_schema, lcols) \
        + [(c, rt.schema.field(c).type) for c in rt.column_names]
    out_schema = pa.schema(out_fields)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or l_start not in t.schema.names:
            return out_schema.empty_table()
        ls = pc.cast(t[l_start], pa.int64()).to_numpy()
        le = pc.cast(t[l_end], pa.int64()).to_numpy()
        invalid = le < ls
        if invalid.any():
            if on_invalid == "raise":
                raise ValueError(
                    f"interval_overlap_join: {int(invalid.sum())} left "
                    f"row(s) with {l_end} < {l_start}; pass "
                    f"on_invalid='drop' to skip them")
            t = t.filter(pa.array(~invalid))
            ls, le = ls[~invalid], le[~invalid]
        b_rs, b_re, b_gd, b_rt = _ray.get(right_ref)
        if t.num_rows == 0 or b_rt.num_rows == 0:
            return out_schema.empty_table()
        g0 = ls // granule_us
        g1 = le // granule_us
        reps = (g1 - g0 + 1).astype(np.int64)
        lidx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) \
            if len(reps) else np.array([], dtype=np.int64)
        grans = np.repeat(g0, reps) + offs
        l_parts, r_parts = [], []
        for g in np.unique(grans):
            cand = b_gd.get(int(g))
            if cand is None:
                continue
            li = lidx[grans == g]
            big_l = np.repeat(li, len(cand))
            big_r = np.tile(cand, len(li))
            a, b = ls[big_l], le[big_l]
            c, d = b_rs[big_r], b_re[big_r]
            ok = (a <= d) & (c <= b) \
                & (np.maximum(a, c) // granule_us == g)
            l_parts.append(big_l[ok])
            r_parts.append(big_r[ok])
        if not l_parts:
            return out_schema.empty_table()
        li_all = np.concatenate(l_parts)
        ri_all = np.concatenate(r_parts)
        lt = t.take(pa.array(li_all))
        rt_sel = b_rt.take(pa.array(ri_all))
        cols = {c: lt[c] for c in lcols}
        for c in b_rt.column_names:
            cols[c] = rt_sel[c]
        return pa.table(cols).cast(out_schema)

    return left.map_batches(probe, batch_format="pyarrow")


def band_join(left: rd.Dataset, right: rd.Dataset,
              left_val: str, right_val: str, delta: int,
              key: str | None = None,
              num_buckets: int = 32) -> rd.Dataset:
    """Value-band join — the fourth non-equi join family: pair every
    left row with every right row (same ``key``, if given) whose
    INTEGER ``right_val`` is within ``delta`` of the left row's
    ``left_val`` (``|l − r| ≤ delta``, inclusive).

    Scale shape (the range_join granule trick rotated from time onto
    the value axis): with granule width w = ``delta``, a left row maps
    to its single granule ``g = v // w`` while the right side explodes
    into the three granules {g−1, g, g+1} — every qualifying pair's
    right value provably lands in that window, and meets the left row
    exactly once (in the left's own granule), so no dedup pass. The
    sides meet in ONE equi-join on the composite (key, granule) via
    the bucketed hash join, then an exact |l−r| filter. Constant 3×
    explosion regardless of data — no skew knob to tune.

    Values must be integers (the repo's exact-money discipline: pass
    cents). Non-key column names must be disjoint across sides.
    """
    if delta < 1:
        raise ValueError(f"delta must be a positive integer, got {delta}")

    def _ck(keys: pa.Array | None, g: np.ndarray) -> pa.Array:
        gs = pc.cast(pa.array(g, pa.int64()), pa.string())
        if keys is None:
            return gs
        return pc.binary_join_element_wise(
            pc.cast(keys, pa.string()), gs, "|")

    def l_widen(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or left_val not in t.schema.names:
            return t.append_column("__ck", pa.array([], pa.string()))
        g = t[left_val].combine_chunks().to_numpy(
            zero_copy_only=False) // delta
        return t.append_column(
            "__ck", _ck(t[key] if key else None, g))

    def r_widen(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or right_val not in t.schema.names:
            return t.append_column("__ck", pa.array([], pa.string()))
        g0 = t[right_val].combine_chunks().to_numpy(
            zero_copy_only=False) // delta
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), 3)
        g = np.repeat(g0, 3) + np.tile(
            np.array([-1, 0, 1], dtype=np.int64), t.num_rows)
        t3 = t.take(pa.array(idx))
        return t3.append_column(
            "__ck", _ck(t3[key] if key else None, g))

    lw = left.map_batches(l_widen, batch_format="pyarrow")
    rw = right.map_batches(r_widen, batch_format="pyarrow")
    if key:
        rw = rw.drop_columns([key])
    joined = bucket_hash_join(lw, rw, key="__ck",
                              num_buckets=num_buckets)

    def exact(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or left_val not in t.schema.names:
            return t.drop_columns(
                ["__ck"]) if "__ck" in t.schema.names else t
        d = pc.abs(pc.subtract(t[left_val], t[right_val]))
        return t.filter(pc.less_equal(d, delta)).drop_columns(["__ck"])

    return joined.map_batches(exact, batch_format="pyarrow")


def q_value_band_pairs(sf_dir: str, delta_cents: int = 10) -> pa.Table:
    """(click_id, error_id, v_c_click, v_c_error): every (click, error)
    pair by the same user whose values agree within ``delta_cents``
    (|Δ| ≤ 10¢) — the fuzzy-amount reconciliation shape (match a
    payment event to its refund/chargeback within a tolerance).
    Exercises band_join; oracle: DuckDB inequality self-join on exact
    cents."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "value"])

    def mk(side: str, idc: str, vc: str):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "event_type" not in t.schema.names:
                return pa.table({
                    "user_id": pa.array([], pa.int64()),
                    idc: pa.array([], pa.int64()),
                    vc: pa.array([], pa.int64())})
            t = t.filter(pc.equal(t["event_type"], side))
            return pa.table({
                "user_id": t["user_id"],
                idc: t["event_id"],
                vc: pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                            pa.int64())})
        return fn

    clicks = ev.map_batches(mk("click", "click_id", "v_c_click"),
                            batch_format="pyarrow")
    errors = ev.map_batches(mk("error", "error_id", "v_c_error"),
                            batch_format="pyarrow")
    pairs = band_join(clicks, errors, "v_c_click", "v_c_error",
                      delta=delta_cents, key="user_id")

    from raydoc.functions._collect import collect_table
    t = collect_table(pairs)
    out = pa.table({"click_id": t["click_id"],
                    "error_id": t["error_id"],
                    "v_c_click": t["v_c_click"],
                    "v_c_error": t["v_c_error"]})
    return out.sort_by([("click_id", "ascending"),
                        ("error_id", "ascending")])
