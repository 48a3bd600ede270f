"""Randomized equivalence of the join operators against DuckDB on skewed
synthetic data (hot keys, missing keys, null-free int/string keys)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raydoc.functions.joins import broadcast_join, bucket_hash_join


def _mk(seed: int, n_left: int = 2000, n_right: int = 300):
    rng = np.random.RandomState(seed)
    # Zipf-ish hot keys + keys present on only one side
    left = pd.DataFrame({
        "k": rng.zipf(1.5, n_left) % 97,
        "lv": rng.randint(0, 10**6, n_left),
    })
    rk = rng.permutation(130)[:min(n_right, 130)]
    right = pd.DataFrame({"k": rk, "rv": rng.randint(0, 10**6, len(rk))})
    right = right.drop_duplicates(subset="k", ignore_index=True)
    return left, right


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Sort columns+rows; numerics via float so int64 vs NaN-promoted
    float64 columns compare equal (nulls → the same NaN token)."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or v != v:
            return "<null>"
        try:
            return repr(float(v))
        except (TypeError, ValueError):
            return str(v)

    return sorted(tuple(norm(v) for v in r)
                  for r in df.itertuples(index=False))


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_bucket_hash_join_matches_duckdb(ray_session, seed, how):
    left, right = _mk(seed)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = {"inner": "JOIN", "left": "LEFT JOIN",
          "right": "RIGHT JOIN", "full": "FULL JOIN"}[how]
    # USING(k) coalesces the key for RIGHT/FULL the same way pyarrow does
    want = con.sql(f"SELECT k, l.lv, r.rv FROM l {jt} r USING (k)").df()

    got = bucket_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8, how=how).to_pandas()
    assert _canon(got) == _canon(want)


def test_broadcast_join_rejects_right_full(ray_session):
    left, right = _mk(8)
    for how in ("right", "full"):
        with pytest.raises(ValueError, match="bucket_hash_join"):
            broadcast_join(rd.from_arrow(pa.Table.from_pandas(left)),
                           pa.Table.from_pandas(right), key="k", how=how)


@pytest.mark.parametrize("seed", [4, 5])
def test_broadcast_join_matches_duckdb(ray_session, seed):
    left, right = _mk(seed)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("SELECT l.k, l.lv, r.rv FROM l JOIN r USING (k)").df()

    got = broadcast_join(rd.from_arrow(pa.Table.from_pandas(left)),
                         pa.Table.from_pandas(right),
                         key="k").to_pandas()
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_asof_join_matches_duckdb(ray_session, seed):
    """Random (key, ts) streams: asof_join == DuckDB ASOF LEFT JOIN.
    Right side deduped per (key, ts) for deterministic ties."""
    from raydoc.functions.asof import asof_join

    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, 20, 500),
        "t": rng.randint(0, 10**6, 500).astype("int64"),
        "lid": np.arange(500, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 25, 300),
        "t": rng.randint(0, 10**6, 300).astype("int64"),
        "rv": np.arange(300, dtype="int64"),
    })
    right = right.groupby(["k", "t"], as_index=False).agg(rv=("rv", "max"))

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("""
        SELECT l.k, l.t, l.lid, r.rv FROM l
        ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t""").df()

    got = asof_join(rd.from_arrow(pa.Table.from_pandas(left)),
                    rd.from_arrow(pa.Table.from_pandas(right)),
                    key="k", ts="t", num_buckets=8).to_pandas()
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("seed", [21, 22])
def test_range_join_matches_duckdb(ray_session, seed):
    """Random points vs random intervals: range_join == DuckDB's
    inequality join, across granule sizes straddling interval lengths."""
    from raydoc.functions.rangejoin import range_join

    rng = np.random.RandomState(seed)
    points = pd.DataFrame({
        "k": rng.randint(0, 15, 400),
        "ts": rng.randint(0, 10**5, 400).astype("int64"),
        "pid": np.arange(400, dtype="int64"),
    })
    starts = rng.randint(0, 10**5, 120).astype("int64")
    intervals = pd.DataFrame({
        "k": rng.randint(0, 18, 120),
        "start": starts,
        "end": starts + rng.randint(0, 5000, 120),
        "iid": np.arange(120, dtype="int64"),
    })

    con = duckdb.connect()
    con.register("p", points)
    con.register("i", intervals)
    want = con.sql("""
        SELECT p.k, p.ts, p.pid, i.start, i."end", i.iid
        FROM p JOIN i ON p.k = i.k AND p.ts >= i.start
                     AND p.ts <= i."end" """).df()

    for granule in (1000, 7777):
        got = range_join(rd.from_arrow(pa.Table.from_pandas(points)),
                         rd.from_arrow(pa.Table.from_pandas(intervals)),
                         key="k", granule_us=granule,
                         num_buckets=8).to_pandas()
        assert _canon(got) == _canon(want), f"granule={granule}"


@pytest.mark.parametrize("seed", [31, 32])
def test_asof_forward_tiebreak_matches_duckdb(ray_session, seed):
    """direction='forward' with a right_tiebreak must keep MAX-tiebreak
    semantics (regression: merge_asof picks the FIRST qualifying row
    forward, silently inverting ties unless the sort is flipped)."""
    from raydoc.functions.asof import asof_join

    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, 10, 300),
        "t": rng.randint(0, 1000, 300).astype("int64"),
        "lid": np.arange(300, dtype="int64"),
    })
    # many right rows per (k, t) so ties are common
    right = pd.DataFrame({
        "k": rng.randint(0, 12, 400),
        "t": rng.randint(0, 1000, 400).astype("int64"),
        "rv": rng.permutation(400).astype("int64"),
    })

    con = duckdb.connect()
    con.register("l", left)
    # the oracle resolves ties by MAX(rv) per (k, t) before the asof
    con.register("rd_", right.groupby(["k", "t"], as_index=False)
                 .agg(rv=("rv", "max")))
    want = con.sql("""
        SELECT l.k, l.t, l.lid, r.rv FROM l
        ASOF LEFT JOIN rd_ r ON l.k = r.k AND l.t <= r.t""").df()

    got = asof_join(rd.from_arrow(pa.Table.from_pandas(left)),
                    rd.from_arrow(pa.Table.from_pandas(right)),
                    key="k", ts="t", direction="forward",
                    right_tiebreak=["rv"], num_buckets=4).to_pandas()
    assert _canon(got) == _canon(want)


def test_range_join_invalid_intervals(ray_session):
    """end < start: clear ValueError by default, on_invalid='drop' skips
    the bad rows and keeps the valid ones."""
    from raydoc.functions.rangejoin import range_join

    points = pd.DataFrame({"k": [1, 1], "ts": np.array([5, 50], "int64"),
                           "pid": np.array([0, 1], "int64")})
    intervals = pd.DataFrame({
        "k": [1, 1], "start": np.array([0, 100], "int64"),
        "end": np.array([10, 40], "int64"),     # second is inverted
        "iid": np.array([1, 2], "int64")})

    def run(**kw):
        return range_join(
            rd.from_arrow(pa.Table.from_pandas(points)),
            rd.from_arrow(pa.Table.from_pandas(intervals)),
            key="k", granule_us=10, num_buckets=2, **kw).to_pandas()

    with pytest.raises(Exception, match="interval row"):
        run()
    got = run(on_invalid="drop")
    assert list(got["iid"]) == [1] and list(got["pid"]) == [0]


@pytest.mark.parametrize("seed", [41, 42, 43])
@pytest.mark.parametrize("anti", [False, True])
def test_bucket_semi_join_matches_duckdb(ray_session, seed, anti):
    """Semi/anti vs DuckDB EXISTS / NOT EXISTS, with null left keys
    (semi drops them, anti keeps them — SQL three-valued semantics)."""
    from raydoc.functions.joins import bucket_semi_join

    left, right = _mk(seed)
    left["k"] = left["k"].astype("Int64")
    left.loc[left.index % 17 == 0, "k"] = None

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    op = "NOT EXISTS" if anti else "EXISTS"
    want = con.sql(f"SELECT k, lv FROM l WHERE {op} "
                   f"(SELECT 1 FROM r WHERE r.k = l.k)").df()

    got = bucket_semi_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8, anti=anti).to_pandas()
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("seed", [51, 52])
def test_except_distinct_matches_duckdb(ray_session, seed):
    """except_distinct == DuckDB EXCEPT on duplicated, overlapping keys."""
    from raydoc.functions.joins import except_distinct

    rng = np.random.RandomState(seed)
    left = pd.DataFrame({"k": rng.randint(0, 120, 3000),
                         "junk": rng.randint(0, 9, 3000)})
    right = pd.DataFrame({"k": rng.randint(60, 200, 800),
                          "junk2": rng.randint(0, 9, 800)})

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("SELECT k FROM l EXCEPT SELECT k FROM r").df()

    got = except_distinct(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8).to_pandas()
    assert _canon(got) == _canon(want)
    assert got["k"].is_unique


def test_unsupported_how_raises_clearly(ray_session):
    left, right = _mk(9)
    with pytest.raises(ValueError, match="supported"):
        bucket_hash_join(rd.from_arrow(pa.Table.from_pandas(left)),
                         rd.from_arrow(pa.Table.from_pandas(right)),
                         key="k", how="outer")


def test_range_join_negative_timestamps(ray_session):
    """Floor-vs-truncate division regression: pre-epoch timestamps must
    land in the same granule on both sides."""
    from raydoc.functions.rangejoin import range_join

    points = pd.DataFrame({"k": [1], "ts": np.array([-1], dtype="int64"),
                           "pid": np.array([0], dtype="int64")})
    intervals = pd.DataFrame({
        "k": [1], "start": np.array([-1800], dtype="int64"),
        "end": np.array([-1], dtype="int64"),
        "iid": np.array([7], dtype="int64")})
    got = range_join(rd.from_arrow(pa.Table.from_pandas(points)),
                     rd.from_arrow(pa.Table.from_pandas(intervals)),
                     key="k", granule_us=1000, num_buckets=2).to_pandas()
    assert list(got["iid"]) == [7]


def _mk_skewed(seed: int, n_left: int = 3000, n_right: int = 800,
               hot: int = 7):
    """Half the left rows and a quarter of the right rows share ONE hot
    key (many-to-many) — the straggler regime salting exists for."""
    rng = np.random.RandomState(seed)
    lk = (rng.zipf(1.3, n_left) % 50).astype(np.int64)
    lk[: n_left // 2] = hot
    rk = rng.randint(0, 60, n_right).astype(np.int64)
    rk[: n_right // 4] = hot
    left = pd.DataFrame({"k": lk, "lv": rng.randint(0, 10**6, n_left)})
    right = pd.DataFrame({"k": rk, "rv": rng.randint(0, 10**6, n_right)})
    return left, right


@pytest.mark.parametrize("seed", [11, 12])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_hash_join_matches_duckdb(ray_session, seed, how):
    from raydoc.functions.joins import salted_hash_join
    left, right = _mk_skewed(seed)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = {"inner": "JOIN", "left": "LEFT JOIN"}[how]
    want = con.sql(f"SELECT k, l.lv, r.rv FROM l {jt} r USING (k)").df()

    got = salted_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", hot_keys=[7], num_buckets=8, salt=4, how=how).to_pandas()
    assert _canon(got) == _canon(want)


def test_salted_hash_join_with_detected_hot_keys(ray_session):
    from raydoc.functions.joins import detect_hot_keys, salted_hash_join
    left, right = _mk_skewed(13)
    lds = rd.from_arrow(pa.Table.from_pandas(left))
    hot = detect_hot_keys(lds, "k", min_count=500, top_n=4)
    assert 7 in hot
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("SELECT k, l.lv, r.rv FROM l JOIN r USING (k)").df()
    got = salted_hash_join(
        lds, rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", hot_keys=hot, num_buckets=8, salt=4).to_pandas()
    assert _canon(got) == _canon(want)


def test_salted_hash_join_rejects_outer_and_low_salt(ray_session):
    from raydoc.functions.joins import salted_hash_join
    left, right = _mk_skewed(14)
    lds = rd.from_arrow(pa.Table.from_pandas(left))
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    for how in ("right", "full"):
        with pytest.raises(ValueError, match="inner/left only"):
            salted_hash_join(lds, rds, key="k", hot_keys=[7], how=how)
    with pytest.raises(ValueError, match="salt must be"):
        salted_hash_join(lds, rds, key="k", hot_keys=[7], salt=1)


@pytest.mark.parametrize("seed", [71, 72])
def test_bloom_prefiltered_join_matches_plain_inner(ray_session, seed):
    """Bloom prefilter must be result-invariant for inner joins and must
    actually drop unmatched left rows before the exchange."""
    from raydoc.functions.joins import bloom_prefiltered_join

    left, right = _mk(seed, n_left=4000)
    # make most left keys unmatched: right keeps only 10 key values
    right = right.head(10)
    got = bloom_prefiltered_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8).to_pandas()
    want = bucket_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8, how="inner").to_pandas()
    assert _canon(got) == _canon(want)


def test_bloom_prefilter_drops_rows_before_exchange(ray_session):
    import numpy as np
    from raydoc.functions.dedup import _bloom_positions
    # direct check of the membership property: every right key passes,
    # and with 4M bits / 10 keys essentially no FP among 10k probes
    rng = np.random.RandomState(0)
    import pandas as pd
    right_keys = pd.util.hash_array(np.arange(10, dtype=np.int64),
                                    categorize=False)
    n_bits = 1 << 22
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    pos = _bloom_positions(right_keys, n_bits).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    probe = pd.util.hash_array(np.arange(10_000, dtype=np.int64),
                               categorize=False)
    p = _bloom_positions(probe, n_bits)
    hit = ((bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all(axis=1)
    assert hit[:10].all()                      # no false negatives
    assert hit[10:].sum() < 20                 # FP rate tiny


@pytest.mark.parametrize("seed", [81, 82])
@pytest.mark.parametrize("anti", [False, True])
def test_semi_join_bucketed_fallback_matches_duckdb(ray_session, seed,
                                                    anti):
    """Pin the bucketed exchange path (broadcast_max=None) — the path
    that runs at scale — against DuckDB, including null left keys."""
    from raydoc.functions.joins import bucket_semi_join

    left, right = _mk(seed)
    left.loc[::97, "k"] = None          # null keys: semi drops, anti keeps
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    neg = "NOT " if anti else ""
    want = con.sql(f"SELECT k, lv FROM l WHERE {neg}EXISTS "
                   f"(SELECT 1 FROM r WHERE r.k = l.k)").df()
    got = bucket_semi_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8, anti=anti,
        broadcast_max=None).to_pandas()
    assert _canon(got) == _canon(want)


def test_bloom_prefiltered_join_with_null_keys(ray_session):
    """A null in a numeric key batch must not poison the batch's hashes
    (int->float promotion regression): matching rows still join."""
    from raydoc.functions.joins import bloom_prefiltered_join

    left = pd.DataFrame({"k": pd.array([1, 2, None, 3, 1],
                                       dtype="Int64"),
                         "lv": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"k": pd.array([1, 3, None], dtype="Int64"),
                          "rv": [100, 300, 999]})
    got = bloom_prefiltered_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=4).to_pandas()
    want = bucket_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=4, how="inner").to_pandas()
    assert _canon(got) == _canon(want)
    assert sorted(got["lv"]) == [10, 40, 50]   # nulls never match


@pytest.mark.parametrize("regime", ["broadcast", "salted", "bucket"])
def test_auto_join_regimes_agree(ray_session, regime):
    """auto_join must produce the identical inner join whichever strategy
    its thresholds select."""
    from raydoc.functions.joins import auto_join

    left, right = _mk(5)
    kw = {"broadcast": dict(broadcast_max_rows=10**6),
          "salted": dict(broadcast_max_rows=0, detect_skew=True,
                         hot_min_count=10),
          "bucket": dict(broadcast_max_rows=0)}[regime]
    got = auto_join(rd.from_arrow(pa.Table.from_pandas(left)),
                    rd.from_arrow(pa.Table.from_pandas(right)),
                    key="k", **kw).to_pandas()
    want = bucket_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8, how="inner").to_pandas()
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("seed", [61, 62])
@pytest.mark.parametrize("broadcast_max", [100_000, None])
def test_interval_overlap_join_vs_bruteforce(ray_session, seed,
                                             broadcast_max):
    """Random closed intervals on BOTH sides (negative coordinates too —
    floor-division granule parity) against the O(n*m) definition, in
    BOTH regimes: broadcast (small right side ships via ray.put) and
    the granule-explode bucket exchange (broadcast_max=None)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.rangejoin import interval_overlap_join

    rng = np.random.RandomState(seed)
    nl, nr = 150, 120
    ls = rng.randint(-500, 500, nl).astype(np.int64)
    le = ls + rng.randint(0, 80, nl)
    rs = rng.randint(-500, 500, nr).astype(np.int64)
    re = rs + rng.randint(0, 80, nr)
    left = pa.table({"lid": pa.array(np.arange(nl, dtype=np.int64)),
                     "ls": pa.array(ls), "le": pa.array(le)})
    right = pa.table({"rid": pa.array(np.arange(nr, dtype=np.int64)),
                      "rs": pa.array(rs), "re": pa.array(re)})
    out = interval_overlap_join(
        rd.from_arrow(left), rd.from_arrow(right),
        "ls", "le", "rs", "re", granule_us=64,
        num_buckets=8, broadcast_max=broadcast_max).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    exp = sorted((int(i), int(j))
                 for i in range(nl) for j in range(nr)
                 if ls[i] <= re[j] and rs[j] <= le[i])
    assert got == exp


@pytest.mark.parametrize("seed", [71])
def test_interval_overlap_join_keyed_vs_bruteforce(ray_session, seed):
    """The per-key branch (composite key build + right-side key drop)
    against the O(n*m) definition with key equality."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.rangejoin import interval_overlap_join

    rng = np.random.RandomState(seed)
    nl, nr = 140, 110
    lk = rng.randint(0, 5, nl).astype(np.int64)
    rk = rng.randint(0, 5, nr).astype(np.int64)
    ls = rng.randint(-300, 300, nl).astype(np.int64)
    le = ls + rng.randint(0, 60, nl)
    rs = rng.randint(-300, 300, nr).astype(np.int64)
    re = rs + rng.randint(0, 60, nr)
    left = pa.table({"k": pa.array(lk),
                     "lid": pa.array(np.arange(nl, dtype=np.int64)),
                     "ls": pa.array(ls), "le": pa.array(le)})
    right = pa.table({"k": pa.array(rk),
                      "rid": pa.array(np.arange(nr, dtype=np.int64)),
                      "rs": pa.array(rs), "re": pa.array(re)})
    out = interval_overlap_join(
        rd.from_arrow(left), rd.from_arrow(right),
        "ls", "le", "rs", "re", key="k", granule_us=32,
        num_buckets=8).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    exp = sorted((int(i), int(j))
                 for i in range(nl) for j in range(nr)
                 if lk[i] == rk[j] and ls[i] <= re[j] and rs[j] <= le[i])
    assert got == exp


@pytest.mark.parametrize("seed", [61, 62])
@pytest.mark.parametrize("mode", ["intersect", "except"])
def test_multiset_ops_match_duckdb(ray_session, tmp_path, seed, mode):
    """INTERSECT ALL / EXCEPT ALL bag semantics on skewed multisets with
    nulls (which never match, per SQL) and keys unique to either side."""
    import duckdb
    import numpy as np
    import ray.data as rd
    from raydoc.functions.joins import except_all, intersect_all

    rng = np.random.RandomState(seed)
    lk = rng.zipf(1.4, 400) % 23
    rk = rng.zipf(1.4, 300) % 29
    lt = pa.table({"k": pa.array(
        [None if i % 37 == 0 else int(v) for i, v in enumerate(lk)],
        pa.int64())})
    rt = pa.table({"k": pa.array(
        [None if i % 41 == 0 else int(v) for i, v in enumerate(rk)],
        pa.int64())})
    fn = intersect_all if mode == "intersect" else except_all
    got = sorted(fn(rd.from_arrow(lt), rd.from_arrow(rt), key="k",
                    num_buckets=4).to_pandas()["k"].tolist())
    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)
    op = "INTERSECT ALL" if mode == "intersect" else "EXCEPT ALL"
    exp = sorted(con.execute(
        f"SELECT k FROM lt WHERE k IS NOT NULL {op} "
        f"SELECT k FROM rt WHERE k IS NOT NULL").fetchdf()["k"].tolist())
    assert got == exp


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_snapshot_diff_matches_duckdb(ray_session, seed):
    """snapshot_diff ≡ FULL OUTER JOIN + IS DISTINCT FROM filter, on
    snapshots with adds, removals, value changes, null↔value flips and
    untouched rows (which must NOT appear in the output)."""
    from raydoc.functions.joins import snapshot_diff
    rng = np.random.RandomState(seed)
    n = 500
    base = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "v": rng.randint(0, 50, n).astype(np.float64),
        "s": rng.choice(["a", "b", "c"], n),
    })
    base.loc[rng.rand(n) < 0.1, "v"] = np.nan      # nulls in base
    new = base.copy()
    new.loc[rng.rand(n) < 0.2, "v"] = rng.randint(50, 99)   # changes
    new.loc[rng.rand(n) < 0.1, "v"] = np.nan       # null flips
    new = new[rng.rand(n) > 0.1]                   # removals
    adds = pd.DataFrame({"k": np.arange(n, n + 40, dtype=np.int64),
                         "v": rng.rand(40) * 10, "s": ["z"] * 40})
    new = pd.concat([new, adds], ignore_index=True)

    out = snapshot_diff(rd.from_arrow(pa.Table.from_pandas(base)),
                        rd.from_arrow(pa.Table.from_pandas(new)),
                        key="k", compare_cols=["v", "s"],
                        num_buckets=8)
    got = out.to_pandas()

    con = duckdb.connect()
    con.register("b", base)
    con.register("n", new)
    want = con.sql("""
        SELECT COALESCE(b.k, n.k) AS k,
               CASE WHEN b.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    ELSE 'changed' END AS change,
               b.v AS old_v, b.s AS old_s, n.v AS new_v, n.s AS new_s
        FROM b FULL OUTER JOIN n ON b.k = n.k
        WHERE b.k IS NULL OR n.k IS NULL
           OR b.v IS DISTINCT FROM n.v
           OR b.s IS DISTINCT FROM n.s""").df()
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize("delta", [1, 7])
def test_band_join_matches_duckdb(ray_session, seed, delta):
    from raydoc.functions.rangejoin import band_join

    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, 5, 400),
        "lid": np.arange(400, dtype=np.int64),
        "lv": rng.randint(-50, 50, 400).astype(np.int64),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 5, 300),
        "rid": np.arange(300, dtype=np.int64),
        "rv": rng.randint(-50, 50, 300).astype(np.int64),
    })
    got = band_join(rd.from_pandas(left), rd.from_pandas(right),
                    "lv", "rv", delta=delta, key="k",
                    num_buckets=8).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute(
        f"""SELECT l.k, lid, lv, rid, rv FROM l JOIN r
            ON l.k = r.k AND abs(lv - rv) <= {delta}""").fetchdf()
    assert _canon(got) == _canon(exp)


def test_band_join_no_key_and_rejects_bad_delta(ray_session):
    from raydoc.functions.rangejoin import band_join

    left = pd.DataFrame({"lid": [0, 1, 2],
                         "lv": np.array([0, 10, -10], np.int64)})
    right = pd.DataFrame({"rid": [0, 1],
                          "rv": np.array([1, -12], np.int64)})
    got = band_join(rd.from_pandas(left), rd.from_pandas(right),
                    "lv", "rv", delta=2, num_buckets=4).to_pandas()
    pairs = sorted(zip(got["lid"], got["rid"]))
    assert pairs == [(0, 0), (2, 1)]
    with pytest.raises(ValueError):
        band_join(rd.from_pandas(left), rd.from_pandas(right),
                  "lv", "rv", delta=0)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_asof_nearest_matches_duckdb_argmin(ray_session, seed):
    """direction='nearest': smallest |Δt| wins, distance ties resolve
    backward, (key, ts) ties to the max tiebreak — vs an explicit
    DuckDB row_number argmin with the same tie chain. Small ts range
    so both directions, exact ties, and equal-ts rows all occur."""
    from raydoc.functions.asof import asof_join

    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rng.randint(0, 5, 300),
        "t": rng.randint(0, 40, 300).astype("int64"),
        "lid": np.arange(300, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 6, 200),
        "t": rng.randint(0, 40, 200).astype("int64"),
        "rv": np.arange(200, dtype="int64"),
    })
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("""
        WITH j AS (
          SELECT l.lid, r.rv, abs(l.t - r.t) AS d,
                 CASE WHEN r.t <= l.t THEN 1 ELSE 0 END AS back
          FROM l JOIN r ON l.k = r.k),
        rk AS (SELECT lid, rv, row_number() OVER (PARTITION BY lid
                   ORDER BY d ASC, back DESC, rv DESC) AS rn FROM j)
        SELECT l.k, l.t, l.lid, rk.rv
        FROM l LEFT JOIN rk ON rk.lid = l.lid AND rk.rn = 1""").df()

    got = asof_join(rd.from_arrow(pa.Table.from_pandas(left)),
                    rd.from_arrow(pa.Table.from_pandas(right)),
                    key="k", ts="t", direction="nearest",
                    right_tiebreak=["rv"], num_buckets=8).to_pandas()
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_apply_changes_matches_duckdb(ray_session, seed):
    """apply_changes == SQL MERGE semantics: per-key max-version change
    wins, 'D' deletes, 'U'/'I' replace-or-insert, untouched base rows
    pass through. Random feeds include updates to missing keys
    (insert), deletes of missing keys (no-op), and multi-version keys."""
    from raydoc.functions.joins import apply_changes

    rng = np.random.RandomState(seed)
    base = pd.DataFrame({
        "k": np.arange(200, dtype=np.int64),
        "val": rng.randint(0, 1000, 200).astype(np.int64),
    })
    n_ch = 150
    ch = pd.DataFrame({
        "k": rng.randint(0, 260, n_ch).astype(np.int64),
        "val": rng.randint(1000, 2000, n_ch).astype(np.int64),
        "version": np.arange(1, n_ch + 1, dtype=np.int64),  # unique
        "op": rng.choice(["U", "I", "D"], n_ch),
    })
    got = apply_changes(
        rd.from_arrow(pa.Table.from_pandas(base)),
        rd.from_arrow(pa.Table.from_pandas(ch)), key="k",
        version_col="version", op_col="op", num_buckets=8).to_pandas()
    con = duckdb.connect()
    con.register("b", base)
    con.register("c", ch)
    want = con.sql("""
        WITH top AS (SELECT k, val, op FROM (
            SELECT *, row_number() OVER (PARTITION BY k
                ORDER BY version DESC) AS rn FROM c) WHERE rn = 1)
        SELECT k, val FROM b WHERE k NOT IN (SELECT k FROM top)
        UNION ALL SELECT k, val FROM top WHERE op <> 'D'""").df()
    assert _canon(got) == _canon(want)


def test_apply_changes_accepts_from_pandas(ray_session):
    """arrow_field_types handles rd.from_pandas schemas (whose .types
    are already Arrow DataTypes), so keyed operators work on pandas-
    sourced datasets too."""
    from raydoc.functions.joins import apply_changes

    base = pd.DataFrame({"k": np.array([1, 2], np.int64),
                         "val": np.array([10, 20], np.int64)})
    ch = pd.DataFrame({"k": np.array([2, 3], np.int64),
                       "val": np.array([99, 30], np.int64),
                       "version": np.array([1, 1], np.int64),
                       "op": ["D", "I"]})
    got = apply_changes(rd.from_pandas(base), rd.from_pandas(ch),
                        key="k", version_col="version", op_col="op",
                        num_buckets=4).to_pandas()
    assert sorted(zip(got["k"], got["val"])) == [(1, 10), (3, 30)]


def test_star_flatten_bucket_invariance(ray_session):
    """The two-exchange star denormalization is bucket-count exact:
    8 vs 32 buckets produce identical per-nation-pair checksums, and
    every lineitem lands in exactly one wide row."""
    import duckdb

    from raydoc.functions.relational import q_star_flatten

    sf = "/root/testdata/sf0.001"
    a = q_star_flatten(sf, num_buckets=8).to_pandas()
    b = q_star_flatten(sf, num_buckets=32).to_pandas()
    assert a.equals(b)
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert int(a["n_rows"].sum()) == n
