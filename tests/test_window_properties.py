"""Randomized DuckDB equivalence of the newer event-analytics operators
on adversarial synthetic events (duplicate timestamps, single-event
users, one dominant user, negative values)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_events(tmp_path, seed: int, n: int = 3000):
    rng = np.random.RandomState(seed)
    users = rng.zipf(1.3, n) % 37            # heavy skew + singletons
    ts = pd.to_datetime(
        rng.randint(0, 5 * 86400, n) * 1_000_000          # many exact ties
        + np.int64(1_700_000_000_000_000), unit="us")
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click", "error", "purchase"])[
                rng.randint(0, 4, n)]),
        "value": pa.array(np.round(rng.standard_normal(n) * 50, 2)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _sql(sf, q):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    return con.execute(q).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False))


@pytest.mark.parametrize("seed", [11, 12])
def test_moving_sum_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import user_moving_sum
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = user_moving_sum(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["user_moving_sum"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [21, 22])
def test_transitions_match_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import event_transitions
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = event_transitions(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["event_transitions"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [31, 32])
def test_latest_event_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import latest_user_event
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = latest_user_event(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["latest_user_event"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [41, 42])
def test_value_outliers_match_duckdb(ray_session, tmp_path, seed):
    """Negative cents exercise the lower-bound ceil arithmetic."""
    from raydoc.functions.windows import value_outliers
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = value_outliers(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["value_outliers"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [51])
def test_percent_rank_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import global_percent_rank
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = global_percent_rank(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["global_percent_rank"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [61])
def test_covariance_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import covariance_by_type
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = covariance_by_type(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["covariance_by_type"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [71, 72])
def test_time_window_sum_matches_duckdb(ray_session, tmp_path, seed):
    """RANGE-frame semantics under heavy timestamp ties: the frame is
    closed on both ends and includes ALL peers of the current row."""
    from raydoc.functions.windows import user_time_window_sum
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = user_time_window_sum(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["user_time_window_sum"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [81])
def test_favorite_type_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import user_favorite_type
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = user_favorite_type(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["user_favorite_type"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [131, 132])
def test_user_event_sequence_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import user_event_sequence
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = user_event_sequence(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["user_event_sequence"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [141, 142])
def test_type_percent_rank_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import type_percent_rank
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = type_percent_rank(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["type_percent_rank"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [151])
def test_value_mad_matches_duckdb(ray_session, tmp_path, seed):
    from raydoc.functions.windows import value_mad_by_type
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = value_mad_by_type(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["value_mad_by_type"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [161, 162])
def test_user_value_ewma_matches_duckdb(ray_session, tmp_path, seed):
    """Decay weights under ties, negatives, and >16-event users."""
    from raydoc.functions.windows import user_value_ewma
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = user_value_ewma(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["user_value_ewma"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [171, 172])
def test_resample_linear_matches_duckdb(ray_session, tmp_path, seed):
    """Linear interpolation under exact ties, grid-on-event instants,
    single-event users and negative values — doubles must hash
    identically (same IEEE expression tree as the SQL twin)."""
    from raydoc.functions.windows import resample_linear
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = resample_linear(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["resample_linear"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [181, 182])
def test_user_longest_streak_matches_duckdb(ray_session, tmp_path, seed):
    """Island labeling under exact ts ties, singleton users, and
    equal-length-streak tiebreaks (lexicographic type)."""
    from raydoc.functions.windows import user_longest_streak
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = user_longest_streak(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["user_longest_streak"])
    assert _canon(got) == _canon(exp)


def test_rfm_regimes_identical(ray_session):
    """user_rfm_segments: the driver-sort and distributed-selection cut
    regimes pick identical rank elements → identical scores."""
    from raydoc.functions.windows import user_rfm_segments

    sf = "/root/testdata/sf0.001"
    small = user_rfm_segments(sf).to_pandas()
    dist = user_rfm_segments(sf, driver_cut_max=0).to_pandas()
    assert small.equals(dist)


@pytest.mark.parametrize("seed", [61, 62])
def test_value_acf_matches_duckdb(ray_session, tmp_path, seed):
    """Lag-1 autocorrelation per type: the day-bucketed distributed scan
    (in-day pairs + cross-day boundary pairs) is bit-identical to the
    single-sequence LAG() twin, under ts ties and 5 days of boundaries."""
    from raydoc.functions.windows import value_acf_by_type
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = value_acf_by_type(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["value_acf_by_type"])
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [63, 64])
def test_session_paths_match_duckdb(ray_session, tmp_path, seed):
    """Top session paths: bucketed session scan + path roll-up + local
    top-k prune ≡ the STRING_AGG window twin (ties in ts and in counts)."""
    from raydoc.functions.windows import top_session_paths
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = top_session_paths(sf, num_buckets=8).to_pandas()
    exp = _sql(sf, e.oracle_sql()["top_session_paths"])
    assert _canon(got) == _canon(exp)


def test_cusum_fires_on_planted_rate_shift(ray_session, tmp_path):
    """A 5× hourly-rate step change must raise a CUSUM alarm at or after
    the shift and never before it; a flat series raises none."""
    import pyarrow.parquet as pq
    from raydoc.functions.windows import event_rate_cusum

    rng = np.random.RandomState(3)
    rows = []
    base = np.int64(1_700_000_000_000_000)
    hour = 3_600_000_000
    for h in range(96):                       # 4 days of hours
        n = 20 if h < 72 else 100             # shift at hour 72
        for i in range(n):
            rows.append((len(rows), base + h * hour
                         + int(rng.randint(0, hour)), 1, "shifted"))
        for i in range(20):                   # control: flat series
            rows.append((len(rows), base + h * hour
                         + int(rng.randint(0, hour)), 2, "flat"))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="us"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = event_rate_cusum(str(tmp_path)).to_pandas()
    shifted = out[out["event_type"] == "shifted"]
    assert len(shifted) > 0
    shift_ts = pd.Timestamp(int(base + 72 * hour), unit="us")
    assert (shifted["window_start"] >= shift_ts).all()
    assert (out["event_type"] == "flat").sum() == 0


@pytest.mark.parametrize("seed", [71, 72])
def test_conversion_latency_matches_duckdb(ray_session, tmp_path, seed):
    """First-view→first-subsequent-purchase per user ≡ the SQL twin on
    adversarial events (ties, purchase-before-view users, singletons)."""
    from raydoc.functions.windows import conversion_latency
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = conversion_latency(sf, num_buckets=8).to_pandas()
    exp = _sql(sf, e.oracle_sql()["conversion_latency"])
    assert _canon(got) == _canon(exp)


def test_cusum_counts_zero_event_hours(ray_session, tmp_path):
    """Hours with NO events are rate 0, not skipped: the distributed
    result must equal a pure-Python reference that zero-fills the
    hourly grid (a gap both shifts mu/sigma and drains S)."""
    import pyarrow.parquet as pq
    from raydoc.functions.windows import event_rate_cusum

    hour = 3_600_000_000
    base = np.int64(1_700_000_000_000_000 // hour * hour)  # hour-aligned
    counts = [20] * 10 + [0] * 5 + [25] * 10
    rows = []
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append((len(rows), base + h * hour + i, "gappy"))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="us"),
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    k_sigma, h_sigma = 0.5, 2.0
    out = event_rate_cusum(str(tmp_path), k_sigma=k_sigma,
                           h_sigma=h_sigma).to_pandas()

    x = np.asarray(counts, dtype=np.float64)
    mu, sd = x.mean(), x.std()
    s, exp_hours = 0.0, []
    for h, xi in enumerate(x):
        s = max(0.0, s + (xi - mu) / sd - k_sigma)
        if s > h_sigma:
            exp_hours.append(h)
    got_hours = sorted(
        int((ts.value // 1000 - base) // hour)
        for ts in out[out["event_type"] == "gappy"]["window_start"])
    assert got_hours == exp_hours
    assert len(exp_hours) > 0


def test_late_event_stats_bucket_invariance(ray_session):
    """The watermark prefix-max decomposition is exact: 16 vs 256
    arrival buckets produce identical windows, and the late/on-time
    accounting is non-vacuous and conserves the row count."""
    import duckdb

    from raydoc.functions.windows import late_event_stats

    sf = "/root/testdata/sf0.001"
    a = late_event_stats(sf, hex_prefix_len=1).to_pandas()
    b = late_event_stats(sf, hex_prefix_len=2).to_pandas()
    assert a.equals(b)
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert int(a["n_ontime"].sum() + a["n_late"].sum()) == n
    assert int(a["n_late"].sum()) > 0 and int(a["n_ontime"].sum()) > 0


def test_trailing_hour_value_adversarial_peers(ray_session, tmp_path):
    """RANGE-frame semantics on a corpus dense with equal-ts peers and
    exact window-boundary hits: every peer must share one frame, a row
    exactly one hour back is IN the frame, one microsecond further is
    out. Pinned to DuckDB's window engine on the same rows; also
    bucket-count invariant."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydoc.functions.windows import trailing_hour_value

    rng = np.random.default_rng(17)
    n, hour = 600, 3_600_000_000
    base = 1_700_000_000_000_000
    uid = rng.integers(0, 7, n)
    # cluster timestamps so many collide exactly and many land exactly
    # one hour apart
    ts = base + rng.integers(0, 5, n) * hour + \
        rng.integers(0, 3, n) * (hour // 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "value": pa.array(rng.integers(1, 10_000, n) / 100.0,
                          pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    mine = trailing_hour_value(str(d)).to_pandas()
    alt = trailing_hour_value(str(d), num_buckets=2).to_pandas()
    assert mine.equals(alt)

    exp = duckdb.sql(f"""
        SELECT event_id, user_id,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS trail_cents
        FROM read_parquet('{d}/events.parquet')
        ORDER BY event_id""").fetchdf()
    assert mine.reset_index(drop=True).equals(exp.reset_index(drop=True))
    # non-vacuous: some frame actually accumulates >1 row
    solo = duckdb.sql(f"""
        SELECT CAST(ROUND(value*100) AS BIGINT)
        FROM read_parquet('{d}/events.parquet') ORDER BY event_id
        """).fetchdf().iloc[:, 0]
    assert (mine["trail_cents"].to_numpy() > solo.to_numpy()).any()


def test_attribution_linear_conserves_credit(ray_session):
    """Credit conservation: summed attributed cents equal the exact
    cents of every purchase that has >= 1 view in its 7-day window
    (DuckDB computes the attributed-purchase set); bucket-count
    invariant; remainder goes to earliest views so no credit is lost
    to integer division."""
    import duckdb

    from raydoc.functions.windows import attribution_linear

    sf = "/root/testdata/sf0.001"
    mine = attribution_linear(sf).to_pandas()
    alt = attribution_linear(sf, num_buckets=2).to_pandas()
    assert mine.equals(alt)

    expected_total = duckdb.sql(f"""
        WITH v AS (SELECT user_id, ts FROM
                   read_parquet('{sf}/events.parquet')
                   WHERE event_type = 'view'),
        p AS (SELECT user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS c
              FROM read_parquet('{sf}/events.parquet')
              WHERE event_type = 'purchase')
        SELECT COALESCE(SUM(c), 0) FROM p WHERE EXISTS (
            SELECT 1 FROM v WHERE v.user_id = p.user_id
             AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 7 DAY)
        """).fetchone()[0]
    assert int(mine["attributed_cents"].sum()) == int(expected_total)
    assert (mine["n_purchases"] >= 1).all()
