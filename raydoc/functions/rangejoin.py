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
