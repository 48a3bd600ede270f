"""Hash-bucketed co-located storage join: equivalence to a plain join,
manifest mismatch refusal, and left-join null padding."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydoc.pipelines.bucketed import (bucketed_join_dataset,
                                       write_bucketed_parquet)


def _two_tables(seed, n_l=5000, n_r=800):
    rng = np.random.RandomState(seed)
    left = pa.table({
        "k": pa.array(rng.randint(0, 1000, n_l), pa.int64()),
        "lv": pa.array(rng.randint(0, 10**6, n_l), pa.int64())})
    right = pa.table({
        "k": pa.array(rng.randint(0, 1200, n_r), pa.int64()),
        "rv": pa.array(rng.randint(0, 10**6, n_r), pa.int64())})
    return left, right


@pytest.mark.parametrize("seed", [31, 32])
def test_bucketed_join_equals_plain_join(ray_session, tmp_path, seed):
    import duckdb
    left, right = _two_tables(seed)
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed_parquet(rd.from_arrow(left), dl, "k", num_buckets=8)
    write_bucketed_parquet(rd.from_arrow(right), dr, "k", num_buckets=8)
    got = bucketed_join_dataset(dl, dr, "k").to_pandas()
    got = got[["k", "lv", "rv"]]
    con = duckdb.connect()
    con.register("left_t", left)
    con.register("right_t", right)
    exp = con.execute(
        "SELECT l.k, lv, rv FROM left_t l JOIN right_t r USING (k)"
    ).df()
    key = lambda df: sorted(map(tuple, df.values.tolist()))   # noqa: E731
    assert key(got) == key(exp)


def test_bucketed_join_refuses_mismatched_layout(ray_session, tmp_path):
    left, right = _two_tables(33)
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed_parquet(rd.from_arrow(left), dl, "k", num_buckets=8)
    write_bucketed_parquet(rd.from_arrow(right), dr, "k", num_buckets=16)
    with pytest.raises(ValueError, match="disagree"):
        bucketed_join_dataset(dl, dr, "k")


def test_bucketed_rewrite_is_atomic_swap(ray_session, tmp_path):
    """A second write replaces the layout wholesale (no stale buckets)."""
    import glob
    left, _ = _two_tables(34)
    d = str(tmp_path / "t")
    write_bucketed_parquet(rd.from_arrow(left), d, "k", num_buckets=8)
    write_bucketed_parquet(rd.from_arrow(left.slice(0, 100)), d, "k",
                           num_buckets=4)
    buckets = sorted(glob.glob(d + "/bucket=*"))
    assert len(buckets) <= 4
    assert rd.read_parquet(d).count() == 100


def test_bucketed_point_lookup_prunes_and_is_exact(ray_session, tmp_path):
    left, _ = _two_tables(35)
    d = str(tmp_path / "t")
    write_bucketed_parquet(rd.from_arrow(left), d, "k", num_buckets=16)
    from raydoc.pipelines.bucketed import bucketed_point_lookup
    got = bucketed_point_lookup(d, "k", [7, 500, 999]).to_pandas()
    exp = left.to_pandas()
    exp = exp[exp["k"].isin([7, 500, 999])]
    key = lambda df: sorted(map(tuple,                       # noqa: E731
                                df[["k", "lv"]].values.tolist()))
    assert key(got) == key(exp)
    with pytest.raises(ValueError, match="bucketed on"):
        bucketed_point_lookup(d, "lv", [1])

def test_bucketed_left_join_null_pads_empty_right_buckets(
        ray_session, tmp_path):
    """how='left' must keep EVERY left row: right keys hash into a
    subset of buckets, so most buckets have no right-side dir at all
    (the silent-row-drop regression case)."""
    import duckdb
    left = pa.table({
        "k": pa.array(list(range(64)), pa.int64()),
        "lv": pa.array(list(range(100, 164)), pa.int64())})
    right = pa.table({"k": pa.array([3], pa.int64()),
                      "rv": pa.array([42], pa.int64())})
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed_parquet(rd.from_arrow(left), dl, "k", num_buckets=8)
    write_bucketed_parquet(rd.from_arrow(right), dr, "k", num_buckets=8)
    got = bucketed_join_dataset(dl, dr, "k", how="left").to_pandas()
    assert len(got) == 64
    con = duckdb.connect()
    con.register("left_t", left)
    con.register("right_t", right)
    exp = con.execute(
        "SELECT l.k, lv, rv FROM left_t l LEFT JOIN right_t r USING (k)"
    ).df()
    import pandas as pd

    def key(df):
        return sorted(
            (int(k), int(lv), None if pd.isna(rv) else int(rv))
            for k, lv, rv in df[["k", "lv", "rv"]].values.tolist())

    assert key(got) == key(exp)


def test_bucketed_join_rejects_unknown_how(ray_session, tmp_path):
    left, right = _two_tables(36, n_l=50, n_r=20)
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed_parquet(rd.from_arrow(left), dl, "k", num_buckets=4)
    write_bucketed_parquet(rd.from_arrow(right), dr, "k", num_buckets=4)
    with pytest.raises(ValueError, match="how"):
        bucketed_join_dataset(dl, dr, "k", how="outer")


def test_bucketed_point_lookup_empty_keeps_schema(ray_session, tmp_path):
    left, _ = _two_tables(37, n_l=50)
    d = str(tmp_path / "t")
    write_bucketed_parquet(rd.from_arrow(left), d, "k", num_buckets=8)
    from raydoc.pipelines.bucketed import bucketed_point_lookup
    got = bucketed_point_lookup(d, "k", [10**9])
    assert got.num_rows == 0
    assert set(got.schema.names) == {"k", "lv"}
