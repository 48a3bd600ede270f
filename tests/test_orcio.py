"""ORC sink + source: round-trip fidelity, manifest discipline,
idempotent reruns, stale-shard removal, column pruning, and the
extraction pipeline running off an ORC corpus."""

import json
import os

import pyarrow as pa
import pyarrow.orc as po
import pytest

from raydoc.sources import transcripts as tgen

FIXTURE_SEED = 123


def _events_table(n=500, seed=7):
    import numpy as np
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_type": pa.array(
            [["click", "view", "purchase"][i % 3] for i in range(n)]),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
    })


def test_orc_roundtrip_exact(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.functions.orcio import export_orc, read_orc

    t = _events_table()
    out = str(tmp_path / "orc")
    manifest = export_orc(rd.from_arrow(t), out, shard_rows=120)

    assert sum(manifest.column("n_rows").to_pylist()) == t.num_rows
    files = sorted(f for f in os.listdir(out) if f.endswith(".orc"))
    assert files == sorted(manifest.column("shard").to_pylist())
    with open(os.path.join(out, "_orc_manifest.json")) as fh:
        assert {m["shard"] for m in json.load(fh)} == set(files)

    back = read_orc(out).take_all()
    assert sorted((r["event_type"], r["value"], r["ts"]) for r in back) == \
        sorted(zip(t.column("event_type").to_pylist(),
                   t.column("value").to_pylist(),
                   t.column("ts").to_pylist()))


def test_orc_rerun_idempotent_and_stale_removed(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.functions.orcio import export_orc

    out = str(tmp_path / "orc")
    t1 = _events_table(seed=1)
    m1 = export_orc(rd.from_arrow(t1), out, shard_rows=100)
    # same data rerun: same shard names, same directory contents
    m2 = export_orc(rd.from_arrow(t1), out, shard_rows=100)
    assert sorted(m1.column("shard").to_pylist()) == \
        sorted(m2.column("shard").to_pylist())
    # different data: old shards must be gone
    t2 = _events_table(seed=2)
    m3 = export_orc(rd.from_arrow(t2), out, shard_rows=100)
    on_disk = {f for f in os.listdir(out) if f.endswith(".orc")}
    assert on_disk == set(m3.column("shard").to_pylist())
    assert not on_disk & set(m1.column("shard").to_pylist())


def test_orc_column_pruned_read(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.functions.orcio import export_orc, read_orc

    out = str(tmp_path / "orc")
    export_orc(rd.from_arrow(_events_table()), out, shard_rows=200)
    ds = read_orc(out, columns=["event_type"])
    t = pa.Table.from_pylist(ds.take_all())
    assert t.column_names == ["event_type"]


def test_orc_empty_dir_raises(tmp_path):
    from raydoc.functions.orcio import read_orc

    with pytest.raises(ValueError, match="no .orc files"):
        read_orc(str(tmp_path))


def test_orc_transcript_source(ray_session, tmp_path):
    """Source-format dispatch: the extraction pipeline over an ORC
    corpus matches the conv set of the generating table."""
    table = tgen.generate_transcripts(n_convs=4, seed=FIXTURE_SEED,
                                      min_turns=2, max_turns=4)
    half = (table.num_rows // 2 // 2) * 2
    po.write_table(table.slice(0, half), str(tmp_path / "a.orc"))
    po.write_table(table.slice(half), str(tmp_path / "b.orc"))

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(str(tmp_path)).take_all()
    assert len(rows) == table.num_rows
    assert {r["conv_id"] for r in rows} == \
        set(table.column("conv_id").to_pylist())


def test_orc_roundtrip_stats_matches_direct(ray_session):
    """The driver query equals the same aggregate computed straight off
    the parquet (what the DuckDB oracle asserts at the gate)."""
    import duckdb

    from raydoc.functions.orcio import orc_roundtrip_stats

    sf = "/root/testdata/sf0.001"
    mine = orc_roundtrip_stats(sf).to_pandas()
    exp = duckdb.sql(f"""
        SELECT event_type, COUNT(value) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY event_type ORDER BY event_type""").fetchdf()
    assert mine.reset_index(drop=True).equals(exp.reset_index(drop=True))
