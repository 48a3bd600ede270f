"""WARC sink + source: round-trip fidelity (gz and plain), unicode
payloads, manifest discipline, idempotent reruns + stale-shard removal,
fail-soft parsing of a corrupt tail, non-response record filtering, and
the extraction pipeline running off a WARC corpus."""

import gzip
import json
import os

import pyarrow as pa
import pytest

from raydoc.sources.warc import (_record_bytes, export_warc, read_warc,
                                 warc_roundtrip_stats)


def _docs_table(n=60, seed=3):
    import hashlib
    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        rows.append({
            "url": f"http://host{i % 5}.example/page/{i}",
            "text": f"Doc {i} — naïve café текст 日本語 {h}\n" * (1 + i % 3),
        })
    return pa.Table.from_pylist(rows)


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip_exact(ray_session, tmp_path, gz):
    import ray.data as rd

    t = _docs_table()
    out = str(tmp_path / "warc")
    manifest = export_warc(rd.from_arrow(t), out, shard_records=25, gz=gz)

    assert sum(manifest.column("n_records").to_pylist()) == t.num_rows
    ext = ".warc.gz" if gz else ".warc"
    files = sorted(f for f in os.listdir(out) if f.endswith(ext))
    assert files == sorted(manifest.column("shard").to_pylist())
    with open(os.path.join(out, "_warc_manifest.json")) as fh:
        assert {m["shard"] for m in json.load(fh)} == set(files)

    back = read_warc(out).take_all()
    assert sorted((r["url"], r["text"]) for r in back) == \
        sorted(zip(t.column("url").to_pylist(),
                   t.column("text").to_pylist()))
    assert all(r["http_status"] == 200 and r["record_type"] == "response"
               and r["content_type"].startswith("text/html")
               for r in back)


def test_warc_rerun_idempotent_and_stale_removed(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "warc")
    t1 = _docs_table(seed=1)
    m1 = export_warc(rd.from_arrow(t1), out, shard_records=30)
    m2 = export_warc(rd.from_arrow(t1), out, shard_records=30)
    assert sorted(m1.column("shard").to_pylist()) == \
        sorted(m2.column("shard").to_pylist())
    t2 = _docs_table(seed=2)
    m3 = export_warc(rd.from_arrow(t2), out, shard_records=30)
    on_disk = {f for f in os.listdir(out) if f.endswith(".warc.gz")}
    assert on_disk == set(m3.column("shard").to_pylist())
    assert not on_disk & set(m1.column("shard").to_pylist())


def test_warc_corrupt_tail_fail_soft(ray_session, tmp_path):
    """A shard whose tail is garbage yields every record before the
    corruption instead of failing the task."""
    recs = [_record_bytes(f"http://x/{i}", f"body {i}".encode())
            for i in range(4)]
    path = tmp_path / "bad.warc"
    path.write_bytes(b"".join(recs[:3]) + b"GARBAGE NOT A RECORD" + recs[3])
    rows = read_warc(str(path)).take_all()
    assert [r["url"] for r in rows] == [f"http://x/{i}" for i in range(3)]


def test_warc_skips_non_response_records(ray_session, tmp_path):
    """warcinfo/request records (present in real crawls) are framed and
    skipped; only requested record types surface."""
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n")
    resp = _record_bytes("http://x/a", "hello".encode())
    path = tmp_path / "mix.warc.gz"
    path.write_bytes(gzip.compress(info, mtime=0) +
                     gzip.compress(resp, mtime=0))
    rows = read_warc(str(path)).take_all()
    assert len(rows) == 1 and rows[0]["url"] == "http://x/a"
    assert rows[0]["text"] == "hello"


def test_warc_transcript_source(ray_session, tmp_path):
    """Source-format dispatch: a WARC corpus streams through the
    extraction pipeline, one single-turn conversation per record."""
    import ray.data as rd

    t = _docs_table(n=8)
    export_warc(rd.from_arrow(t), str(tmp_path), shard_records=4)

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(str(tmp_path)).take_all()
    assert len(rows) == t.num_rows
    assert {r["conv_id"] for r in rows} == \
        set(t.column("url").to_pylist())


def test_warc_roundtrip_stats_matches_direct(ray_session):
    """The driver query equals the same aggregate computed straight off
    the parquet (what the DuckDB oracle asserts at the gate)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    mine = warc_roundtrip_stats(sf).to_pandas()
    exp = duckdb.sql(f"""
        WITH h AS (SELECT source, length(text) AS nc,
                   CAST(('0x' || substr(md5(
                       'http://' || source || '/doc/' ||
                       CAST(doc_id AS VARCHAR) || '|' || text),
                       1, 16)) AS UBIGINT) AS h
                   FROM read_parquet('{sf}/documents.parquet'))
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(nc) AS BIGINT) AS sum_chars,
               lower(lpad(hex(CAST(
                   SUM(CAST(h AS HUGEINT))
                   % CAST(18446744073709551616 AS HUGEINT)
                   AS UBIGINT)), 16, '0')) AS checksum
        FROM h GROUP BY source ORDER BY source""").fetchdf()
    assert mine.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_jsonl_gz_sink_and_transcript_dispatch(ray_session, tmp_path):
    """gz JSONL shards round-trip through Ray's native reader and the
    extraction pipeline dispatches a .jsonl.gz corpus; gz and plain
    runs of the same data agree on shard identity."""
    import gzip
    import os

    import ray.data as rd

    from raydoc.functions.export import export_jsonl
    from raydoc.sources import transcripts as tgen

    table = tgen.generate_transcripts(n_convs=4, seed=11,
                                      min_turns=2, max_turns=3)
    out = str(tmp_path / "gz")
    m_gz = export_jsonl(rd.from_arrow(table), out, shard_rows=10, gz=True)
    m_plain = export_jsonl(rd.from_arrow(table), str(tmp_path / "plain"),
                           shard_rows=10, gz=False)
    assert [s.removesuffix(".gz") for s in
            sorted(m_gz.column("shard").to_pylist())] == \
        sorted(m_plain.column("shard").to_pylist())
    for name in os.listdir(out):
        if name.endswith(".jsonl.gz"):
            with gzip.open(os.path.join(out, name)) as fh:
                fh.read()  # valid gzip

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(out).take_all()
    assert len(rows) == table.num_rows
    assert {r["conv_id"] for r in rows} == \
        set(table.column("conv_id").to_pylist())
