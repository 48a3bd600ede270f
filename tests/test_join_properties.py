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
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_bucket_hash_join_matches_duckdb(ray_session, seed, how):
    left, right = _mk(seed)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    want = con.sql(f"SELECT l.k, l.lv, r.rv FROM l {jt} r USING (k)").df()

    got = bucket_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        key="k", num_buckets=8, how=how).to_pandas()
    assert _canon(got) == _canon(want)


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
