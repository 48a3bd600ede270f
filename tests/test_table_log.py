"""Versioned table log: append/overwrite/time-travel semantics,
optimistic-concurrency commit races, overwrite remove-set rebasing,
vacuum of unreferenced + torn files, and crash-garbage immunity."""

import json
import os
import threading

import pyarrow as pa
import pytest


def _t(lo, hi):
    return pa.table({"x": pa.array(range(lo, hi), pa.int64())})


def _rows(ds):
    return sorted(r["x"] for r in ds.take_all())


def test_append_and_time_travel(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    assert tl.append(rd.from_arrow(_t(0, 10)), d, shard_rows=4) == 0
    assert tl.append(rd.from_arrow(_t(10, 15)), d, shard_rows=4) == 1

    assert _rows(tl.read_table(d)) == list(range(15))
    assert _rows(tl.read_table(d, version=0)) == list(range(10))
    snap = tl.snapshot(d, 0)
    assert sum(a["n_rows"] for a in snap["files"].values()) == 10

    with pytest.raises(ValueError, match="not in log"):
        tl.snapshot(d, 7)


def test_overwrite_preserves_history(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_t(0, 10)), d, shard_rows=4)
    v = tl.overwrite(rd.from_arrow(_t(100, 103)), d, shard_rows=4)
    assert v == 1
    assert _rows(tl.read_table(d)) == [100, 101, 102]
    # the old snapshot still reads in full (files are immutable)
    assert _rows(tl.read_table(d, version=0)) == list(range(10))


def test_concurrent_commits_all_land(tmp_path):
    """16 threads race _try_commit; every commit gets a distinct
    consecutive version and none is lost or overwritten."""
    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    got = []
    lock = threading.Lock()

    def worker(i):
        v = tl._try_commit(
            d, [{"add": f"f{i}.parquet", "n_rows": 1, "n_bytes": 1}],
            "append")
        with lock:
            got.append((i, v))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    versions = sorted(v for _, v in got)
    assert versions == list(range(16))
    live = tl.snapshot(d)["files"]
    assert set(live) == {f"f{i}.parquet" for i in range(16)}


def test_overwrite_rebases_remove_set_on_race(ray_session, tmp_path):
    """An append that sneaks in while an overwrite prepares must still
    be removed by the overwrite's rebased remove set (the callable
    actions path)."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_t(0, 5)), d)

    adds = tl._write_shards(rd.from_arrow(_t(100, 105)), d)
    new_names = {a["add"] for a in adds}

    calls = {"n": 0}

    def actions(head):
        # simulate a concurrent append landing after the first look
        if calls["n"] == 0:
            calls["n"] += 1
            sneak = tl._write_shards(rd.from_arrow(_t(50, 55)), d)
            tl._try_commit(d, sneak, "append")
        live = tl.snapshot(d, tl.latest_version(d))["files"]
        return adds + [{"remove": n} for n in sorted(live)
                       if n not in new_names]

    tl._try_commit(d, actions, "overwrite")
    assert _rows(tl.read_table(d)) == list(range(100, 105))


def test_vacuum_drops_garbage_keeps_window(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_t(0, 5)), d)
    tl.overwrite(rd.from_arrow(_t(10, 15)), d)
    # torn writer leftovers + an orphan shard never committed
    open(os.path.join(d, "part-orphan.parquet"), "wb").write(b"junk")
    open(os.path.join(d, "part-x.parquet.tmp-999"), "wb").write(b"junk")

    deleted = tl.vacuum(d, keep_versions=2)
    assert "part-orphan.parquet" in deleted
    assert "part-x.parquet.tmp-999" in deleted
    # both versions still within the keep window -> still readable
    assert _rows(tl.read_table(d, version=0)) == list(range(5))
    assert _rows(tl.read_table(d, version=1)) == list(range(10, 15))

    tl.append(rd.from_arrow(_t(20, 22)), d)
    deleted = tl.vacuum(d, keep_versions=1)
    # version-0 files are now outside the window and unreferenced
    assert any(n.startswith("part-") for n in deleted)
    assert _rows(tl.read_table(d)) == list(range(10, 15)) + [20, 21]


def test_commit_files_are_json_with_actions(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_t(0, 3)), d)
    with open(os.path.join(d, "_log", "00000000.json")) as fh:
        c = json.load(fh)
    assert c["version"] == 0 and c["operation"] == "append"
    assert all("add" in a for a in c["actions"])
    assert sum(a["n_rows"] for a in c["actions"]) == 3


def test_orders_time_travel_matches_duckdb(ray_session):
    import duckdb

    from raydoc.state.table_log import orders_time_travel

    sf = "/root/testdata/sf0.001"
    mine = orders_time_travel(sf).to_pandas()
    exp = duckdb.sql(f"""
        SELECT 0 AS version, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM read_parquet('{sf}/orders.parquet')
        WHERE o_orderdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT 1, COUNT(*),
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{sf}/orders.parquet')
        ORDER BY version""").fetchdf()
    import pandas as pd
    pd.testing.assert_frame_equal(mine.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)


def test_zone_map_pruned_read(ray_session, tmp_path):
    """stats_cols records per-shard min/max in the commit; a ranged
    read keeps only overlapping shards (here the input is ordered so
    the 3 shards carry disjoint ranges), and a fully-disjoint range
    prunes everything."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_t(0, 12)), d, shard_rows=4,
              stats_cols=["x"])
    snap = tl.snapshot(d)
    got = {tuple(a["stats"]["x"]) for a in snap["files"].values()}
    assert got == {(0, 3), (4, 7), (8, 11)}

    # only the [8, 11] shard overlaps
    assert _rows(tl.read_table(d, where=("x", 9, 10))) == [8, 9, 10, 11]
    # hint semantics: surviving shards stream whole
    assert _rows(tl.read_table(d, where=("x", 3, 4))) == list(range(8))

    with pytest.raises(ValueError, match="fully pruned"):
        tl.read_table(d, where=("x", 100, 200))

    # shards without stats for the column are conservatively kept
    tl.append(rd.from_arrow(_t(100, 101)), d)  # no stats_cols
    assert 100 in _rows(tl.read_table(d, where=("x", 0, 0)))


def test_delete_where_prunes_and_time_travels(ray_session, tmp_path):
    """delete_where removes exactly the matching rows at head, leaves
    zone-map-pruned shards untouched (no rewrite for shards that cannot
    contain a target), keeps prior versions intact, and vacuum reclaims
    the rewritten originals."""
    import os

    import pyarrow as pa

    import ray.data as rd

    from raydoc.state import table_log as tl

    table = str(tmp_path / "t")
    # two appends → two shards with disjoint x zone maps
    tl.append(rd.from_arrow(pa.table({
        "x": pa.array(range(0, 100), pa.int64())})), table,
        stats_cols=["x"])
    tl.append(rd.from_arrow(pa.table({
        "x": pa.array(range(1000, 1100), pa.int64())})), table,
        stats_cols=["x"])
    before = tl.snapshot(table, 1)["files"]
    low_shard = [n for n, m in before.items()
                 if m["stats"]["x"][1] < 1000]
    assert len(low_shard) == 1

    v = tl.delete_where(table, "x", [1005, 1060, 2_000_000])
    assert v == 2
    acts = tl.commit_info(table, v)["actions"]
    removed = {a["remove"] for a in acts if "remove" in a}
    assert low_shard[0] not in removed          # pruned, never rewritten
    from raydoc.functions._collect import collect_table
    head_x = sorted(collect_table(tl.read_table(table))
                    .column("x").to_pylist())
    assert 1005 not in head_x and 1060 not in head_x
    assert len(head_x) == 198
    # time travel: version 1 still has the deleted rows
    old_x = collect_table(tl.read_table(table, version=1)) \
        .column("x").to_pylist()
    assert 1005 in old_x
    # no-op delete: every target outside every zone map
    assert tl.delete_where(table, "x", [5_000_000]) == -1
    # vacuum with retention 1 reclaims the rewritten original
    deleted = tl.vacuum(table, keep_versions=1)
    for n in removed:
        assert n in deleted


def test_optimize_binpacks_preserving_content(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data as rd

    from raydoc.functions._collect import collect_table
    from raydoc.state import table_log as tl

    table = str(tmp_path / "t")
    for off in range(0, 500, 100):        # 5 appends → >= 5 shards
        tl.append(rd.from_arrow(pa.table({
            "x": pa.array(range(off, off + 100), pa.int64())})), table,
            shard_rows=40, stats_cols=["x"])
    n_before = len(tl.snapshot(table)["files"])
    assert n_before >= 5
    v = tl.optimize(table, target_rows=250)
    assert v == 5
    snap = tl.snapshot(table)
    assert len(snap["files"]) < n_before
    xs = sorted(collect_table(tl.read_table(table))
                .column("x").to_pylist())
    assert xs == list(range(500))
    assert tl.optimize(table, target_rows=10 ** 6) in (6, -1)


def test_matview_incremental_equals_recompute(ray_session, tmp_path):
    """Refresh folds only new shards; after appends, deletes and
    optimize, the view always equals a full recompute of the head."""
    import pyarrow as pa

    import ray.data as rd

    from raydoc.functions._collect import collect_table
    from raydoc.state import table_log as tl
    from raydoc.state.matview import read_matview, refresh_matview

    table, view = str(tmp_path / "t"), str(tmp_path / "v")

    def tbl(lo, hi):
        return rd.from_arrow(pa.table({
            "k": pa.array([i % 3 for i in range(lo, hi)], pa.int64()),
            "x": pa.array(range(lo, hi), pa.int64()),
            "v": pa.array([i * 10 for i in range(lo, hi)], pa.int64())}))

    def expected():
        df = collect_table(tl.read_table(table)).to_pandas()
        g = df.groupby("k").agg(n_rows=("k", "size"), sum_v=("v", "sum"))
        return sorted(map(tuple, g.reset_index().itertuples(index=False)))

    def view_rows():
        df = collect_table(read_matview(view)).to_pandas()
        return sorted(map(tuple,
                          df[["k", "n_rows", "sum_v"]]
                          .itertuples(index=False)))

    tl.append(tbl(0, 100), table, shard_rows=30, stats_cols=["x"])
    r = refresh_matview(table, view, ["k"], ["v"])
    assert r["mode"] == "incremental" and view_rows() == expected()

    r = refresh_matview(table, view, ["k"], ["v"])
    assert r["mode"] == "noop"

    tl.append(tbl(100, 150), table, shard_rows=30, stats_cols=["x"])
    r = refresh_matview(table, view, ["k"], ["v"])
    assert r["mode"] == "incremental" and r["new_files"] >= 1
    assert view_rows() == expected()

    tl.delete_where(table, "x", [5, 17, 120])
    r = refresh_matview(table, view, ["k"], ["v"])
    assert r["mode"] == "rebuild" and view_rows() == expected()

    tl.optimize(table, target_rows=1000)
    r = refresh_matview(table, view, ["k"], ["v"])
    assert r["mode"] == "rebuild" and view_rows() == expected()


def _kv(keys, vals):
    return pa.table({"k": pa.array(keys, pa.int64()),
                     "v": pa.array(vals, pa.int64())})


def test_merge_into_update_and_insert(ray_session, tmp_path):
    """Matched keys replace, unmatched insert; untouchable shards
    (zone maps exclude every change key) keep their file names."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_kv([1, 2, 3, 10, 11, 12], [1] * 6)), d,
              shard_rows=3, stats_cols=["k"])
    before = set(tl.snapshot(d)["files"])
    # touches only the low shard; 99 is a pure insert
    v = tl.merge_into(rd.from_arrow(_kv([2, 99], [20, 990])), d,
                      key="k", shard_rows=3)
    assert v == 1
    got = {r["k"]: r["v"] for r in tl.read_table(d).take_all()}
    assert got == {1: 1, 2: 20, 3: 1, 10: 1, 11: 1, 12: 1, 99: 990}
    # the high shard (k in 10..12) survived untouched
    after = set(tl.snapshot(d)["files"])
    assert before & after, "zone-map-pruned shard should persist"
    # prior snapshot unaffected
    assert {r["k"] for r in tl.read_table(d, version=0).take_all()} \
        == {1, 2, 3, 10, 11, 12}


def test_table_changes_appends_and_delete(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_kv([1, 2, 3, 4], [10, 20, 30, 40])), d,
              shard_rows=2, stats_cols=["k"])
    tl.delete_where(d, "k", [2, 3])

    ins = tl.table_changes(d, 0).take_all()
    assert sorted((r["k"], r["change"], r["n"]) for r in ins) == [
        (1, "insert", 1), (2, "insert", 1),
        (3, "insert", 1), (4, "insert", 1)]
    dels = tl.table_changes(d, 1).take_all()
    assert sorted((r["k"], r["change"], r["n"]) for r in dels) == [
        (2, "delete", 1), (3, "delete", 1)]


def test_table_changes_optimize_is_noop(ray_session, tmp_path):
    """Compaction moves every row between shards but changes nothing
    — the CDF must fold to zero rows."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_kv(list(range(8)), list(range(8)))), d,
              shard_rows=2)
    v = tl.optimize(d, target_rows=100)
    assert v == 1
    assert tl.table_changes(d, v).count() == 0


def test_table_changes_multiplicity(ray_session, tmp_path):
    """Duplicate rows carry their multiplicity through the CDF."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(_kv([5, 5, 5], [1, 1, 1])), d)
    rows = tl.table_changes(d, 0).take_all()
    assert [(r["k"], r["change"], r["n"]) for r in rows] == [
        (5, "insert", 3)]


def test_read_table_unify_schema_evolution(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64())})), d)
    tl.append(rd.from_arrow(pa.table({
        "k": pa.array([3], pa.int64()),
        "extra": pa.array(["x"], pa.string())})), d)

    got = sorted(tl.read_table(d, unify=True).take_all(),
                 key=lambda r: r["k"])
    assert [r["k"] for r in got] == [1, 2, 3]
    assert [r["extra"] for r in got] == [None, None, "x"]
    # column pruning through the unified read, including a shard with
    # NONE of the requested columns
    only = tl.read_table(d, unify=True, columns=["extra"]).take_all()
    assert sorted(x["extra"] or "" for x in only) == ["", "", "x"]


def test_point_lookup_prunes_and_is_exact(ray_session, tmp_path):
    """Three appends with disjoint key ranges -> three shards; a probe
    for one key scans a strict subset of shards (usually exactly one)
    and returns exactly the matching rows."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    for base in (0, 1000, 2000):
        tl.append(rd.from_arrow(pa.table({
            "k": pa.array(range(base, base + 1000), pa.int64()),
            "v": pa.array([f"r{i}" for i in range(base, base + 1000)],
                          pa.string())})), d, bloom_cols=["k"])
    ds, st = tl.point_lookup(d, "k", 1500)
    rows = ds.take_all()
    assert st["shards_total"] == 3
    assert st["shards_scanned"] < 3
    assert [(r["k"], r["v"]) for r in rows] == [(1500, "r1500")]
    # absent key: exact empty result regardless of filter verdicts
    ds2, _ = tl.point_lookup(d, "k", 999_999)
    assert ds2.take_all() == []


def test_point_lookup_without_sidecar_is_conservative(ray_session,
                                                      tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64())})), d)   # no bloom_cols
    ds, st = tl.point_lookup(d, "k", 2)
    assert st == {"shards_total": 1, "shards_scanned": 1}
    assert [r["k"] for r in ds.take_all()] == [2]


def test_vacuum_collects_orphaned_bloom_sidecars(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64())})), d, bloom_cols=["k"])
    old_sides = [f for f in os.listdir(d) if ".bloom-" in f]
    assert old_sides
    tl.overwrite(rd.from_arrow(pa.table({
        "k": pa.array([9], pa.int64())})), d)
    tl.vacuum(d, keep_versions=1)
    left = [f for f in os.listdir(d) if ".bloom-" in f]
    assert not set(left) & set(old_sides)


def test_point_lookup_on_empty_snapshot(ray_session, tmp_path):
    """A valid EMPTY snapshot (delete-all) returns an empty result, not
    an IndexError from dereferencing a nonexistent shard's schema."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64())})), d, bloom_cols=["k"])
    # force an empty snapshot via overwrite with an empty dataset
    tl.overwrite(rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64())})), d)
    ds, st = tl.point_lookup(d, "k", 1)
    assert ds.take_all() == []
    assert st == {"shards_total": 0, "shards_scanned": 0}


def test_vacuum_collects_crashed_bloom_tmp_of_live_shard(ray_session,
                                                         tmp_path):
    """A crashed bloom-sidecar tmp file whose base shard is still LIVE
    must be collected (it is never the live sidecar after os.replace)."""
    import ray.data as rd

    from raydoc.state import table_log as tl

    d = str(tmp_path / "t")
    tl.append(rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64())})), d, bloom_cols=["k"])
    side = next(f for f in os.listdir(d) if ".bloom-" in f)
    crashed = os.path.join(d, side + ".tmp-9999")
    with open(crashed, "wb") as fh:
        fh.write(b"torn")
    deleted = tl.vacuum(d, keep_versions=2)
    assert side + ".tmp-9999" in deleted
    assert not os.path.exists(crashed)
    # the real sidecar survives (its shard is referenced)
    assert os.path.exists(os.path.join(d, side))
