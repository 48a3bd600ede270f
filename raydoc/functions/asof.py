"""As-of (time-travel) join — an operator Ray Data lacks natively.

``asof_join(left, right, key, ts)`` joins every left row to the latest
right row of the same key with ``right.ts <= left.ts`` (direction
"backward"; "forward" gives the earliest ``>=``). Semantics match DuckDB's
``ASOF LEFT JOIN`` (the oracle for the wired query).

Shape: both sides are tagged and padded under one schema, hash-bucketed on
the key (ONE all-to-all exchange, coarse buckets sized from the cluster),
and each bucket block — containing every row of its keys from both sides —
is resolved with one vectorized ``pandas.merge_asof`` over the ts-sorted
block. No per-key micro-groups; the partitioning assumption is the same as
every keyed operator here: one bucket's rows fit in a worker.

Determinism: ``merge_asof`` ties on equal ts are positional, so either
pass ``right_tiebreak`` (ordering columns; last wins — resolved inside the
join block, no extra shuffle) or guarantee at most one right row per
(key, ts). The wired query uses a max-id tiebreak; the SQL oracle's
equivalent is a GROUP BY max.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from raydoc.functions._buckets import reduce_bucket_count
from raydoc.functions.joins import arrow_field_types, tag_union


def asof_join(left: rd.Dataset, right: rd.Dataset, key: str, ts: str,
              direction: str = "backward",
              right_tiebreak: list[str] | None = None,
              tolerance=None,
              num_buckets: int | None = None) -> rd.Dataset:
    """Left as-of join; output = left columns + right's non-(key, ts)
    columns (null where no right row qualifies).

    ``right_tiebreak``: columns that order right rows sharing (key, ts) —
    the HIGHEST-sorting row wins in both directions (the sort order is
    flipped internally for ``forward``, where merge_asof keeps the first
    qualifying row instead of the last), making ties deterministic
    without a separate dedup shuffle. Without it, callers must guarantee
    at most one right row per (key, ts).

    ``direction="nearest"``: the right row with the smallest |Δts| wins;
    an exact distance tie between a backward and a forward candidate
    resolves BACKWARD (the earlier row) — deterministic and
    SQL-replicable (``ORDER BY d ASC, back DESC, tiebreak DESC``),
    unlike pandas' own opaque nearest tie rule, so it is computed here
    as an explicit backward-vs-forward pick, not merge_asof('nearest').

    ``tolerance``: WINDOWED as-of — a right row only qualifies within
    this distance of the left ts (same type as the ts column's
    differences, e.g. ``pd.Timedelta`` for timestamps, int for int
    ts). The attribution window shape ("last view within 1 h") that
    neither plain ASOF JOIN nor merge semantics express; unmatched
    left rows null-pad as usual."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    nbuckets = num_buckets or reduce_bucket_count()
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_only = [c for c in right_schema.names if c not in (key, ts)]
    overlap = set(left_cols) & set(right_only)
    if overlap:
        raise ValueError(f"column collision in asof_join: {overlap}")

    all_fields = arrow_field_types(left_schema, left_cols)
    all_fields += arrow_field_types(right_schema, right_only)
    out_cols = [n for n, _ in all_fields]

    tagged = tag_union(left, right, key, all_fields, nbuckets)

    def _resolve(group: pd.DataFrame) -> pd.DataFrame:
        l = group.loc[group["__side"] == 0, left_cols]
        r = group.loc[group["__side"] == 1, [key, ts] + right_only]
        if l.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        if r.empty:
            out = l.copy()
            for c in right_only:
                out[c] = None
            return out[out_cols]
        l = l.sort_values(ts, kind="stable", ignore_index=True)
        # merge_asof keeps the LAST qualifying row for backward but the
        # FIRST for forward — so the tiebreak columns sort ascending for
        # backward and DESCENDING for forward, making "highest tiebreak
        # wins" hold in both directions (ts itself always ascends, as
        # merge_asof requires)
        tb = right_tiebreak or []
        if direction == "nearest":
            r2 = r.copy()
            r2["__rts"] = r2[ts]
            rb = r2.sort_values([ts] + tb, kind="stable",
                                ignore_index=True,
                                ascending=[True] + [True] * len(tb))
            mb = pd.merge_asof(l, rb, on=ts, by=key,
                               direction="backward",
                               tolerance=tolerance)
            rf = r2.sort_values([ts] + tb, kind="stable",
                                ignore_index=True,
                                ascending=[True] + [False] * len(tb))
            mf = pd.merge_asof(l, rf, on=ts, by=key,
                               direction="forward",
                               tolerance=tolerance)
            d_b = (mb[ts] - mb["__rts"]).abs()
            d_f = (mf["__rts"] - mf[ts]).abs()
            use_f = mf["__rts"].notna() & (mb["__rts"].isna()
                                           | (d_f < d_b))
            out = mb
            for c in right_only:
                out[c] = mb[c].where(~use_f, mf[c])
            return out[out_cols]
        r = r.sort_values([ts] + tb, kind="stable", ignore_index=True,
                          ascending=[True] + [direction != "forward"] * len(tb))
        merged = pd.merge_asof(l, r, on=ts, by=key, direction=direction,
                               tolerance=tolerance)
        return merged[out_cols]

    return tagged.groupby("__bucket").map_groups(_resolve,
                                                 batch_format="pandas")


def _click_view_asof(sf_dir: str, **join_kwargs) -> pa.Table:
    """Shared scaffold of the click→view attribution queries: split the
    event stream into (clicks, views) keyed streams, run ``asof_join``
    with the caller's kwargs, rebuild nullable int64 view ids."""
    import pyarrow.compute as pc

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def _typed(kind: str, keep_id: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], kind))
            return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                             keep_id: t["event_id"]})
        return fn

    clicks = ev.map_batches(_typed("click", "event_id"),
                            batch_format="pyarrow")
    views = ev.map_batches(_typed("view", "view_id"),
                           batch_format="pyarrow")
    joined = asof_join(clicks, views, key="user_id", ts="ts",
                       right_tiebreak=["view_id"], **join_kwargs)
    df = joined.to_pandas()
    t = pa.table({
        "event_id": pa.array(df["event_id"].astype("int64")),
        "user_id": pa.array(df["user_id"].astype("int64")),
        # unmatched clicks carry NaN -> nullable int64
        "view_id": pa.Array.from_pandas(df["view_id"].astype("Int64"),
                                        type=pa.int64()),
    })
    return t.sort_by("event_id")


def q_asof_last_view(sf_dir: str) -> pa.Table:
    """For every 'click' event: the id of the same user's most recent
    'view' at or before the click (null if none); ties on (user_id, ts)
    resolve to max view_id INSIDE the join block (right_tiebreak) — no
    separate dedup shuffle. Oracle: DuckDB ASOF LEFT JOIN."""
    return _click_view_asof(sf_dir)


def q_asof_nearest_view(sf_dir: str) -> pa.Table:
    """For every 'click' event: the same user's view CLOSEST in time
    (either direction; distance tie -> the earlier view; equal-ts tie ->
    max view_id). The attribution variant where a click may precede its
    tracked view by clock skew. Oracle: DuckDB argmin via row_number
    over |dt| with the same explicit tie chain."""
    return _click_view_asof(sf_dir, direction="nearest")


def q_asof_recent_view(sf_dir: str, window_minutes: int = 60) -> pa.Table:
    """For every 'click': the same user's most recent view AT MOST
    ``window_minutes`` before it (else null) — the attribution-window
    as-of ("last touch within 1 h") that a plain ASOF JOIN cannot
    express. Exercises asof_join's ``tolerance``; oracle: argmax over
    the window-filtered inequality join (left join keeps unattributed
    clicks)."""
    return _click_view_asof(
        sf_dir, tolerance=pd.Timedelta(minutes=window_minutes))
