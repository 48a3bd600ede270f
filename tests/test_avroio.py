"""Avro OCF sink + source: binary-spec structure, round-trip fidelity
across every supported type (nulls, negative zigzag longs, unicode,
bytes, bool, timestamp-micros), skip-decoder column pruning, manifest
discipline, idempotent reruns, stale-shard removal, and the extraction
pipeline running off an .avro corpus."""

import json
import os

import pyarrow as pa
import pytest

from raydoc.sources import transcripts as tgen

FIXTURE_SEED = 123


def _typed_table():
    return pa.table({
        "id": pa.array([0, 1, -1, 2**62, -(2**63), None, 7], pa.int64()),
        "small": pa.array([5, -5, None, 0, 1, 2, 3], pa.int32()),
        "val": pa.array([0.0, -0.0, 1.5, float("inf"), None,
                         -2.25e300, 3.14], pa.float64()),
        "name": pa.array(["plain", "", "café ☃ ﬀ", "tab\tnl\n",
                          None, 'q"uote', "x" * 300], pa.string()),
        "blob": pa.array([b"\x00\xff", b"", None, b"abc",
                          b"\x80", b"1", b"2"], pa.binary()),
        "flag": pa.array([True, False, None, True, False, True, None],
                         pa.bool_()),
        "ts": pa.array([0, 1, None, 10**15, -(10**15), 42, 43],
                       pa.timestamp("us")),
    })


def _events_table(n=500, seed=7):
    import numpy as np
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_type": pa.array(
            [["click", "view", "purchase"][i % 3] for i in range(n)]),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
    })


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip_all_types(ray_session, tmp_path, codec):
    import ray.data as rd

    from raydoc.functions.avroio import export_avro, read_avro

    t = _typed_table()
    out = str(tmp_path / f"avro_{codec}")
    manifest = export_avro(rd.from_arrow(t), out, shard_rows=3,
                           codec=codec)
    assert sum(manifest.column("n_rows").to_pylist()) == t.num_rows

    back = pa.Table.from_pylist(
        sorted(read_avro(out).take_all(),
               key=lambda r: (r["small"] is None, r["small"] or 0,
                              r["id"] is None, r["id"] or 0)),
        schema=t.schema)
    orig = pa.Table.from_pylist(
        sorted(t.to_pylist(),
               key=lambda r: (r["small"] is None, r["small"] or 0,
                              r["id"] is None, r["id"] or 0)),
        schema=t.schema)
    assert back.equals(orig)


def test_avro_container_structure(ray_session, tmp_path):
    """The written bytes are a spec-shaped OCF: magic, metadata map with
    a parseable record schema + codec, 16-byte sync repeated after the
    single data block, correct row count varint."""
    import ray.data as rd

    from raydoc.functions.avroio import (MAGIC, _dec_long, export_avro)

    t = _events_table(n=50)
    out = str(tmp_path / "avro")
    export_avro(rd.from_arrow(t), out, shard_rows=1000)
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 1
    blob = open(os.path.join(out, files[0]), "rb").read()

    assert blob[:4] == MAGIC
    pos = 4
    n, pos = _dec_long(blob, pos)
    meta = {}
    for _ in range(n):
        klen, pos = _dec_long(blob, pos)
        key = blob[pos:pos + klen].decode(); pos += klen
        vlen, pos = _dec_long(blob, pos)
        meta[key] = blob[pos:pos + vlen]; pos += vlen
    z, pos = _dec_long(blob, pos)
    assert z == 0
    schema = json.loads(meta["avro.schema"])
    assert schema["type"] == "record"
    assert [f["name"] for f in schema["fields"]] == \
        ["event_type", "value", "ts"]
    assert meta["avro.codec"] == b"deflate"
    sync = blob[pos:pos + 16]; pos += 16

    count, pos = _dec_long(blob, pos)
    assert count == 50
    size, pos = _dec_long(blob, pos)
    assert blob[pos + size:pos + size + 16] == sync
    assert pos + size + 16 == len(blob)


def test_avro_column_pruned_read(ray_session, tmp_path):
    """Skip decoders: reading a column subset returns exactly those
    columns with values identical to the full read."""
    import ray.data as rd

    from raydoc.functions.avroio import export_avro, read_avro

    t = _typed_table()
    out = str(tmp_path / "avro")
    export_avro(rd.from_arrow(t), out, shard_rows=4)
    sub = pa.Table.from_pylist(
        sorted(read_avro(out, columns=["name", "flag"]).take_all(),
               key=lambda r: (r["name"] is None, r["name"] or "")))
    assert sub.column_names == ["name", "flag"]
    assert sorted(sub.column("name").to_pylist(),
                  key=lambda v: (v is None, v or "")) == \
        sorted(t.column("name").to_pylist(),
               key=lambda v: (v is None, v or ""))

    with pytest.raises(Exception, match="not in Avro schema"):
        read_avro(out, columns=["nope"]).take_all()


def test_avro_rerun_idempotent_and_stale_removed(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.functions.avroio import export_avro

    out = str(tmp_path / "avro")
    t1 = _events_table(seed=1)
    m1 = export_avro(rd.from_arrow(t1), out, shard_rows=100)
    m2 = export_avro(rd.from_arrow(t1), out, shard_rows=100)
    assert sorted(m1.column("shard").to_pylist()) == \
        sorted(m2.column("shard").to_pylist())
    t2 = _events_table(seed=2)
    m3 = export_avro(rd.from_arrow(t2), out, shard_rows=100)
    on_disk = {f for f in os.listdir(out) if f.endswith(".avro")}
    assert on_disk == set(m3.column("shard").to_pylist())
    assert not on_disk & set(m1.column("shard").to_pylist())
    with open(os.path.join(out, "_avro_manifest.json")) as fh:
        assert {m["shard"] for m in json.load(fh)} == on_disk


def test_avro_empty_dir_raises(tmp_path):
    from raydoc.functions.avroio import read_avro

    with pytest.raises(ValueError, match="no .avro files"):
        read_avro(str(tmp_path))


def test_avro_transcript_source(ray_session, tmp_path):
    """Source-format dispatch: the extraction pipeline over an .avro
    corpus matches the conv set of the generating table."""
    import ray.data as rd

    from raydoc.functions.avroio import export_avro
    from raydoc.pipelines.extract_pipeline import extract_dataset

    table = tgen.generate_transcripts(n_convs=4, seed=FIXTURE_SEED,
                                      min_turns=2, max_turns=4)
    export_avro(rd.from_arrow(table), str(tmp_path),
                shard_rows=max(2, table.num_rows // 2))

    rows = extract_dataset(str(tmp_path)).take_all()
    assert len(rows) == table.num_rows
    assert {r["conv_id"] for r in rows} == \
        set(table.column("conv_id").to_pylist())


def test_avro_roundtrip_stats_matches_direct(ray_session):
    """The driver query equals the same aggregate computed straight off
    the parquet (what the DuckDB oracle asserts at the gate)."""
    import duckdb

    from raydoc.functions.avroio import avro_roundtrip_stats

    sf = "/root/testdata/sf0.001"
    mine = avro_roundtrip_stats(sf).to_pandas()
    exp = duckdb.sql(f"""
        SELECT event_type, COUNT(value) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY event_type ORDER BY event_type""").fetchdf()
    assert mine.reset_index(drop=True).equals(exp.reset_index(drop=True))
