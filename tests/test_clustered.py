"""Clustered parquet sink + zone-map pruned reads."""

import os

import duckdb
import pyarrow as pa

import ray.data as rd

from raydoc.pipelines.clustered import (read_clustered_range,
                                        write_clustered_parquet)

SF = "/root/testdata/sf0.001"


def test_clustered_write_roundtrip_and_zones(ray_session, tmp_path):
    out = str(tmp_path / "clustered")
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "value"])
    manifest = write_clustered_parquet(ds, out, "value", num_buckets=8)

    # no staging residue, zonemap present
    assert not os.path.exists(out + ".clustered-staging")
    assert os.path.exists(os.path.join(out, "_zonemap.json"))

    # zones are disjoint, ordered, and each file's rows honor its zone
    zones = manifest["zones"]
    assert zones == sorted(zones, key=lambda z: z["bucket"])
    for a, b in zip(zones, zones[1:]):
        assert a["max"] <= b["min"]
    import pyarrow.parquet as pq
    total = 0
    for z in zones:
        t = pq.read_table(os.path.join(out, z["file"]))
        v = t.column("value").to_pylist()
        assert v == sorted(v)
        assert v[0] == z["min"] and v[-1] == z["max"]
        total += len(v)

    # every input row survives
    n_in = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert total == n_in


def test_zonemap_prunes_files_and_loses_no_rows(ray_session, tmp_path):
    out = str(tmp_path / "clustered")
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "value"])
    write_clustered_parquet(ds, out, "value", num_buckets=8)

    lo, hi = 50.0, 120.0
    pruned_ds, n_pruned = read_clustered_range(out, lo, hi)
    assert n_pruned > 0                     # the range really skips files
    got = pruned_ds.to_pandas()
    got = got[(got["value"] >= lo) & (got["value"] <= hi)]
    exp = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF}/events.parquet') "
        f"WHERE value >= {lo} AND value <= {hi} ORDER BY event_id"
    ).fetchdf()
    assert sorted(got["event_id"]) == list(exp["event_id"])


def test_zonemap_empty_selection(ray_session, tmp_path):
    out = str(tmp_path / "clustered")
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "value"])
    write_clustered_parquet(ds, out, "value", num_buckets=4)
    empty, n_pruned = read_clustered_range(out, 1e12, 2e12)
    assert empty.count() == 0
    assert n_pruned == 4            # a fully-disjoint range prunes ALL files
    assert set(empty.schema().names) == {"event_id", "value"}


def test_zorder_box_pruning(ray_session, tmp_path):
    """Z-order prunes files on BOTH dimensions of a box query, and the
    pruned read loses no rows vs a full scan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raydoc.pipelines.zorder import (read_zordered_box,
                                         write_zordered_parquet)

    rng = np.random.RandomState(5)
    n = 20000
    t = pa.table({
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.array(rng.uniform(0, 100, n)),
        "b": pa.array(rng.uniform(0, 100, n)),
    })
    src = tmp_path / "src.parquet"
    pq.write_table(t, src)
    out = str(tmp_path / "ztab")
    manifest = write_zordered_parquet(rd.read_parquet(str(src)), out,
                                      "a", "b", num_buckets=16)
    assert len(manifest["zones"]) > 4

    ds, pruned = read_zordered_box(out, 10, 30, 60, 80)
    assert pruned > 0                     # 2-D pruning actually fires
    got = ds.to_pandas()
    got = got[(got["a"].between(10, 30)) & (got["b"].between(60, 80))]
    df = t.to_pandas()
    exp = df[(df["a"].between(10, 30)) & (df["b"].between(60, 80))]
    assert sorted(got["rid"]) == sorted(exp["rid"])

    # degenerate empty box still returns a typed empty dataset
    empty, _ = read_zordered_box(out, 1000, 2000, None, None)
    assert empty.count() == 0


def test_zorder_empty_input_and_bits_guard(ray_session, tmp_path):
    """Empty datasets round-trip (typed empty reads) and bits > 16 is
    rejected instead of silently aliasing the Morton code."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from raydoc.pipelines.zorder import (read_zordered_box,
                                         write_zordered_parquet)

    t = pa.table({"a": pa.array([], pa.float64()),
                  "b": pa.array([], pa.float64())})
    src = tmp_path / "empty.parquet"
    pq.write_table(t, src)
    out = str(tmp_path / "zempty")
    m = write_zordered_parquet(rd.read_parquet(str(src)), out, "a", "b")
    assert m["zones"] == []
    ds, pruned = read_zordered_box(out, 0, 1, 0, 1)
    assert ds.count() == 0 and pruned == 0

    with pytest.raises(ValueError, match="bits"):
        write_zordered_parquet(rd.read_parquet(str(src)), out, "a", "b",
                               bits=20)
