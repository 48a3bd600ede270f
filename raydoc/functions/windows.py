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
    t = pa.Table.from_pylist(out.take_all())
    return t.sort_by([("window_start", "ascending"),
                      ("event_type", "ascending")])


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """(user_id, n_sessions, n_events): a new session starts when the gap
    to the previous event of the same user exceeds ``gap_minutes``. Ordering
    inside a user is (ts, event_id) — deterministic under ts ties."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        new_session = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (np.diff(ts) > gap).astype(np.int64)
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_sessions": [int(new_session.sum())],
            "n_events": [len(g)],
        })

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    t = pa.Table.from_pylist(out.take_all())
    return t.sort_by("user_id")
