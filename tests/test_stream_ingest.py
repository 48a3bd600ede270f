"""Continuous ingestion (pipelines/stream_ingest.py + table_log
append_once): exactly-once shard landing into the ACID table."""

import json
import os

import pyarrow as pa

import ray.data as rd

from raydoc.pipelines.stream_ingest import ingest_new_shards, watch
from raydoc.sources import transcripts as tgen
from raydoc.state import table_log


def _shard(path, seed, n_convs=3):
    tgen.write_transcripts_parquet(str(path), n_convs=n_convs, seed=seed,
                                   min_turns=2, max_turns=4)


def test_ingest_lands_new_shards_once(ray_session, tmp_path):
    inp, table = tmp_path / "in", str(tmp_path / "table")
    inp.mkdir()
    _shard(inp / "a.parquet", seed=1)
    _shard(inp / "b.parquet", seed=2)

    r1 = ingest_new_shards(str(inp), table, group_size=1)
    assert r1["files_new"] == 2 and r1["files_ingested"] == 2
    assert r1["rows_ingested"] > 0
    rows_after_two = table_log.read_table(table).count()
    assert rows_after_two == r1["rows_ingested"]

    # nothing new → no commit, table unchanged
    r2 = ingest_new_shards(str(inp), table, group_size=1)
    assert r2["files_new"] == 0 and r2["versions"] == []
    assert table_log.latest_version(table) == max(r1["versions"])

    # a third shard arrives → ONLY it is ingested
    _shard(inp / "c.parquet", seed=3)
    r3 = ingest_new_shards(str(inp), table, group_size=1)
    assert r3["files_new"] == 1 and r3["files_ingested"] == 1
    assert table_log.read_table(table).count() == \
        rows_after_two + r3["rows_ingested"]
    assert table_log.ingested_sources(table) == {"a.parquet", "b.parquet",
                                                 "c.parquet"}


def test_ingest_matches_direct_extraction(ray_session, tmp_path):
    """The landed table equals a direct aligned extraction of the same
    shards (per-row equality on the turn key + extracted text)."""
    from raydoc.pipelines.extract_pipeline import build_extraction_aligned

    inp, table = tmp_path / "in", str(tmp_path / "table")
    inp.mkdir()
    _shard(inp / "a.parquet", seed=11)
    _shard(inp / "b.parquet", seed=12)
    ingest_new_shards(str(inp), table, group_size=2)

    def key(t):
        df = t.to_pandas()[["conv_id", "turn_idx", "extracted_text"]]
        return sorted(map(tuple, df.itertuples(index=False)))

    from raydoc.functions._collect import collect_table
    got = key(collect_table(table_log.read_table(table)))
    want = key(collect_table(build_extraction_aligned(
        [str(inp / "a.parquet"), str(inp / "b.parquet")])))
    assert got == want


def test_already_committed_group_is_skipped(ray_session, tmp_path):
    """A shard named by ANY prior ingest commit is never re-extracted —
    including one committed by a racing ingestor between discovery and
    commit (simulated by pre-writing the commit)."""
    inp, table = tmp_path / "in", str(tmp_path / "table")
    inp.mkdir()
    _shard(inp / "a.parquet", seed=21)
    os.makedirs(os.path.join(table, "_log"), exist_ok=True)
    with open(os.path.join(table, "_log", "00000000.json"), "w") as fh:
        json.dump({"version": 0, "operation": "ingest:a.parquet",
                   "actions": []}, fh)
    r = ingest_new_shards(str(inp), table, group_size=1)
    assert r["files_new"] == 0 and r["files_ingested"] == 0


def test_append_once_race_aborts_duplicate(ray_session, tmp_path):
    """append_once re-checks the ledger per commit attempt: if the tag
    landed while our shards were being written, we abort (None) and the
    table keeps exactly one copy."""
    table = str(tmp_path / "table")
    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    v0 = table_log.append_once(ds, table, ["s1"])
    assert v0 == 0
    assert table_log.append_once(ds, table, ["s1"]) is None
    assert table_log.append_once(ds, table, ["s1", "s2"]) is None
    assert table_log.read_table(table).count() == 3
    assert table_log.ingested_sources(table) == {"s1"}


def test_watch_bounded_rounds(ray_session, tmp_path):
    inp, table = tmp_path / "in", str(tmp_path / "table")
    inp.mkdir()
    _shard(inp / "a.parquet", seed=31)
    reports = watch(str(inp), table, interval_s=0.01, max_rounds=2,
                    group_size=4)
    assert len(reports) == 2
    assert reports[0]["files_ingested"] == 1
    assert reports[1]["files_ingested"] == 0


def test_ingest_refreshes_matviews(ray_session, tmp_path):
    """The ingestion loop keeps a materialized rollup current: after
    each round the view equals a full recompute of the landed table."""
    from raydoc.functions._collect import collect_table
    from raydoc.state.matview import read_matview

    inp, table = tmp_path / "in", str(tmp_path / "table")
    view = str(tmp_path / "view")
    inp.mkdir()
    _shard(inp / "a.parquet", seed=41)
    mv = [(view, ["language"], ["quality_score"])]

    r1 = ingest_new_shards(str(inp), table, group_size=4, matviews=mv)
    assert r1["matviews"][0]["mode"] == "incremental"

    def recompute():
        df = collect_table(table_log.read_table(table)).to_pandas()
        g = df.groupby("language").agg(n_rows=("language", "size"),
                                       s=("quality_score", "sum"))
        return {(k, int(v.n_rows), float(round(v.s, 6)))
                for k, v in g.iterrows()}

    def view_rows():
        df = collect_table(read_matview(view)).to_pandas()
        return {(r.language, int(r.n_rows),
                 float(round(r.sum_quality_score, 6)))
                for r in df.itertuples(index=False)}

    assert view_rows() == recompute()
    _shard(inp / "b.parquet", seed=42)
    r2 = ingest_new_shards(str(inp), table, group_size=4, matviews=mv)
    assert r2["matviews"][0]["mode"] == "incremental"
    assert view_rows() == recompute()


def test_append_once_concurrent_race_single_winner(ray_session, tmp_path):
    """TRUE concurrency: two threads race append_once with the same
    source tag against one table — exactly one commits, the loser
    aborts, and the table holds exactly one copy."""
    from concurrent.futures import ThreadPoolExecutor

    table = str(tmp_path / "table")
    ds = rd.from_arrow(pa.table({"x": pa.array(range(50), pa.int64())}))
    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [ex.submit(table_log.append_once, ds, table, ["race-tag"])
                for _ in range(2)]
        results = [f.result() for f in futs]
    assert results.count(None) == 1 and 0 in results
    assert table_log.read_table(table).count() == 50
    assert table_log.ingested_sources(table) == {"race-tag"}
