"""Ray Data end-to-end pipeline tests: extraction equality through the
actor-pool + groupby path, checkpoint/resume, and ingest dedup."""

import json
import os

import pyarrow.parquet as pq
import pytest

from raydoc.config import PipelineConfig
from raydoc.kernels.document import process_conversation
from raydoc.sources import transcripts as tgen

FIXTURE_SEED = 123
N_CONVS = 24


@pytest.fixture(scope="module")
def transcripts_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transcripts") / "transcripts.parquet")
    tgen.write_transcripts_parquet(path, n_convs=N_CONVS, seed=FIXTURE_SEED,
                                   min_turns=1, max_turns=8,
                                   skew_conv_turns=24)
    return path


def test_ray_pipeline_matches_local_kernel(ray_session, transcripts_path,
                                           golden_documents):
    from raydoc.pipelines.extract_pipeline import extract_dataset

    ds = extract_dataset(transcripts_path)
    rows = ds.take_all()
    by_conv = {}
    for row in rows:
        by_conv.setdefault(row["conv_id"], []).append(row)

    assert len(by_conv) == N_CONVS
    golden = {c["conv_id"]: c for c in golden_documents}
    for conv_id, conv_rows in by_conv.items():
        conv_rows.sort(key=lambda r: r["turn_idx"])
        exp = golden[conv_id]
        assert [r["turn_idx"] for r in conv_rows] == exp["turn_idx"]
        for row, seg in zip(conv_rows, exp["turn_segments"]):
            assert row["extracted_text"] == seg
        assert conv_rows[0]["language"] == exp["language"]
        assert conv_rows[0]["gate_passed"] == exp["gate_passed"]
        assert round(conv_rows[0]["quality_score"], 4) == exp["quality_score"]


def test_run_job_checkpoint_resume(ray_session, transcripts_path, tmp_path):
    from raydoc.pipelines.extract_pipeline import run_job

    out = str(tmp_path / "out")
    cfg = PipelineConfig(num_output_partitions=4)
    rep1 = run_job(transcripts_path, out, cfg)
    assert rep1["partitions_written"] == [0, 1, 2, 3]
    assert rep1["rows_written"] > 0

    # every partition has a validating manifest with metrics
    for part in range(4):
        mpath = os.path.join(out, f"part={part}", "_manifest.json")
        m = json.load(open(mpath))
        assert m["metrics"]["rows"] >= 0
        assert "turns_per_sec_job" in m["metrics"]

    # rerun: everything skipped, nothing rewritten
    rep2 = run_job(transcripts_path, out, cfg)
    assert rep2["partitions_skipped"] == [0, 1, 2, 3]
    assert rep2["partitions_written"] == []

    # invalidate one manifest → only that partition recomputes
    os.remove(os.path.join(out, "part=2", "_manifest.json"))
    rep3 = run_job(transcripts_path, out, cfg)
    assert rep3["partitions_written"] == [2]
    assert rep3["partitions_skipped"] == [0, 1, 3]

    # written output is the full corpus, partitioned
    table = pq.read_table(out, columns=["conv_id", "turn_idx"])
    assert table.num_rows == rep1["rows_written"]


def test_ingest_dedup(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd
    from raydoc.pipelines.extract_pipeline import dedup_turns

    t = pa.table({
        "conv_id": ["a", "a", "a", "b"],
        "turn_idx": [0, 0, 1, 0],
        "text": ["x", "x-dup", "y", "z"],
    })
    ds = dedup_turns(rd.from_arrow(t))
    rows = sorted(ds.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [
        ("a", 0), ("a", 1), ("b", 0)]


def test_aligned_pipeline_equals_general(ray_session, transcripts_path):
    """The shuffle-elision fused path must produce byte-identical rows to
    the actor-pool + groupby path (single conv-aligned input file)."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import extract_dataset

    general = extract_dataset(transcripts_path).take_all()
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True)
    aligned = extract_dataset(transcripts_path, cfg).take_all()

    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    general.sort(key=key)
    aligned.sort(key=key)
    assert len(general) == len(aligned)
    for g, a in zip(general, aligned):
        assert g["extracted_text"] == a["extracted_text"]
        assert g["language"] == a["language"]
        assert g["gate_passed"] == a["gate_passed"]
        assert g["spans"] == a["spans"]


def test_run_job_aligned_checkpoint_resume(ray_session, tmp_path):
    """File-granular resume: second run skips everything; a deleted
    manifest triggers re-extraction of exactly that file."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    for i in range(4):
        tgen.write_transcripts_parquet(
            str(in_dir / f"shard-{i}.parquet"), n_convs=6,
            seed=FIXTURE_SEED + i, min_turns=1, max_turns=4)
    out_dir = str(tmp_path / "out")
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)

    r1 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r1["files_written"] == 4 and r1["rows_written"] > 0

    r2 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r2["files_skipped"] == 4 and r2["rows_written"] == 0

    os.remove(os.path.join(out_dir, "_manifests", "shard-2.json"))
    r3 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r3["files_written"] == 1 and r3["files_skipped"] == 3

    # output rows across files equal first-run rows
    total = sum(pq.read_table(os.path.join(out_dir, f)).num_rows
                for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert total == r1["rows_written"]


def test_run_job_aligned_isolates_corrupt_file(ray_session, tmp_path):
    """A corrupt input file yields a failure row + no manifest; healthy
    files complete; the rerun retries only the corrupt one."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    for i in range(3):
        tgen.write_transcripts_parquet(
            str(in_dir / f"shard-{i}.parquet"), n_convs=4,
            seed=FIXTURE_SEED + i, min_turns=1, max_turns=3)
    (in_dir / "shard-bad.parquet").write_bytes(b"this is not parquet")
    out_dir = str(tmp_path / "out")
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)

    r1 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r1["rows_written"] > 0
    assert r1.get("files_failed") == 1
    assert "shard-bad" in r1["failures"][0]["file"]

    r2 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r2["files_skipped"] == 3          # healthy files not redone
    assert r2.get("files_failed") == 1       # bad file retried, fails again


def test_skewed_conversation_general_path(ray_session, tmp_path):
    """One conversation 100× longer than the rest (hot key): the general
    shuffle path must still produce exactly one output row per turn with
    correct in-group ordering."""
    path = str(tmp_path / "skew.parquet")
    tgen.write_transcripts_parquet(path, n_convs=10, seed=FIXTURE_SEED,
                                   min_turns=2, max_turns=4,
                                   skew_conv_turns=400)
    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(path).take_all()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    sizes = sorted(len(v) for v in by_conv.values())
    assert sizes[-1] == 400 and sizes[0] <= 4
    for idxs in by_conv.values():
        assert sorted(idxs) == list(range(len(idxs)))   # every turn, once


def test_manifest_invalidation_on_config_change(ray_session, tmp_path):
    """A config change must invalidate file manifests (different cfg hash ⇒
    full re-run), while an identical config resumes."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    tgen.write_transcripts_parquet(str(in_dir / "a.parquet"), n_convs=4,
                                   seed=FIXTURE_SEED)
    out = str(tmp_path / "out")
    cfg1 = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                   extract_concurrency=2)
    r1 = run_job(str(in_dir), out, cfg=cfg1, resume=True)
    assert r1["files_written"] == 1

    r2 = run_job(str(in_dir), out, cfg=cfg1, resume=True)
    assert r2["files_skipped"] == 1

    cfg2 = replace(cfg1, quality_threshold=0.7)   # semantic config change
    r3 = run_job(str(in_dir), out, cfg=cfg2, resume=True)
    assert r3["files_written"] == 1               # stale manifest → re-run


def test_aligned_assumption_boundary(ray_session, tmp_path):
    """Documents the aligned-mode precondition: when a conversation SPANS
    input files, the general path still groups it correctly (one output row
    per turn, doc-level fields computed over all turns), while aligned mode
    — whose contract requires conv-aligned files — treats each fragment as
    its own conversation. This is why assume_conv_aligned is an explicit
    opt-in config, not an inference."""
    import pyarrow as pa

    full = tgen.generate_transcripts(n_convs=3, seed=FIXTURE_SEED,
                                     min_turns=6, max_turns=6)
    in_dir = tmp_path / "split"
    in_dir.mkdir()
    # split mid-conversation: rows 0..8 / 9..end (conv of 6 turns spans both)
    pq.write_table(full.slice(0, 9), in_dir / "a.parquet")
    pq.write_table(full.slice(9), in_dir / "b.parquet")

    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import extract_dataset

    general = extract_dataset(str(in_dir)).take_all()
    by_conv = {}
    for r in general:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert all(len(v) == 6 for v in by_conv.values())
    for rows in by_conv.values():
        langs = {r["language"] for r in rows}
        assert len(langs) == 1          # doc-level field spans the whole conv

    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)
    aligned = extract_dataset(str(in_dir), cfg).take_all()
    assert len(aligned) == len(general)           # turn count conserved...
    mismatch = any(a["extracted_text"] != g["extracted_text"]
                   for a, g in zip(
                       sorted(aligned, key=lambda r: (r["conv_id"], r["turn_idx"])),
                       sorted(general, key=lambda r: (r["conv_id"], r["turn_idx"]))))
    assert mismatch                                # ...but cross-turn stages differ


def test_empty_partition_gets_manifest(ray_session, tmp_path):
    """A partition no conversation hashes into must still complete (empty
    manifest) so resume converges instead of re-running it every time."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    path = str(tmp_path / "tiny.parquet")
    tgen.write_transcripts_parquet(path, n_convs=2, seed=FIXTURE_SEED)
    out = str(tmp_path / "out")
    cfg = replace(DEFAULT_CONFIG, num_output_partitions=16,
                  extract_concurrency=2)

    r1 = run_job(path, out, cfg=cfg, resume=True)
    assert r1["rows_written"] > 0
    r2 = run_job(path, out, cfg=cfg, resume=True)
    assert r2["partitions_written"] == []      # everything resumed, incl. empties


def test_jsonl_source(ray_session, tmp_path):
    """The same pipeline over a JSONL transcripts corpus (source-format
    dispatch in read_transcripts)."""
    import json as _json

    table = tgen.generate_transcripts(n_convs=3, seed=FIXTURE_SEED,
                                      min_turns=2, max_turns=4)
    path = tmp_path / "transcripts.jsonl"
    with open(path, "w") as fh:
        for row in table.select(["conv_id", "turn_idx", "role", "text",
                                 "tool"]).to_pylist():
            fh.write(_json.dumps(row) + "\n")

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(str(path)).take_all()
    assert len(rows) == table.num_rows
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for idxs in by_conv.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_aligned_nested_layout_no_basename_collision(ray_session, tmp_path):
    """Spark/Hive-style nested inputs (a/part-0.parquet + b/part-0.parquet)
    must map to distinct outputs + manifests, and resume must see them all
    complete (the round-1 collision silently dropped one file's rows and
    re-ran the pair forever)."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    in_dir = tmp_path / "nested"
    for sub in ("a", "b"):
        (in_dir / sub).mkdir(parents=True)
        tgen.write_transcripts_parquet(
            str(in_dir / sub / "part-0.parquet"), n_convs=4,
            seed=FIXTURE_SEED + (0 if sub == "a" else 7),
            min_turns=1, max_turns=4)
    out_dir = str(tmp_path / "out")
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)

    r1 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r1["files_written"] == 2
    outs = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert len(outs) == 2, outs

    in_rows = sum(pq.read_table(str(in_dir / s / "part-0.parquet")).num_rows
                  for s in ("a", "b"))
    out_rows = sum(pq.read_table(os.path.join(out_dir, f)).num_rows
                   for f in outs)
    assert out_rows == in_rows

    r2 = run_job(str(in_dir), out_dir, cfg=cfg, resume=True)
    assert r2["files_skipped"] == 2 and r2["files_written"] == 0


def test_job_history_sink_caps_at_ten(ray_session, tmp_path):
    """O6 usage-history sink: every completed job appends its report to
    _history.json in the output dir, capped at the last 10 entries."""
    import json as _json
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    tgen.write_transcripts_parquet(str(in_dir / "s.parquet"), n_convs=3,
                                   seed=FIXTURE_SEED, min_turns=1,
                                   max_turns=3)
    out = str(tmp_path / "out")
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)
    for i in range(12):
        run_job(str(in_dir), out, cfg=cfg, resume=False)
    with open(os.path.join(out, "_history.json")) as fh:
        history = _json.load(fh)
    assert len(history) == 10
    assert all(h["rows_written"] > 0 for h in history)


def test_csv_source(ray_session, tmp_path):
    """Source-format dispatch: the same pipeline over a CSV corpus."""
    import csv as _csv

    table = tgen.generate_transcripts(n_convs=3, seed=FIXTURE_SEED,
                                      min_turns=2, max_turns=4)
    path = tmp_path / "transcripts.csv"
    rows_in = table.select(["conv_id", "turn_idx", "text"]).to_pylist()
    with open(path, "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=["conv_id", "turn_idx", "text"])
        w.writeheader()
        for row in rows_in:
            # keep the CSV payload newline-free (csv quoting handles commas)
            row = dict(row, text=row["text"].replace("\n", " "))
            w.writerow(row)

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(str(path)).take_all()
    assert len(rows) == table.num_rows
    assert {r["conv_id"] for r in rows} == {r["conv_id"] for r in rows_in}


def test_checkpoint_waves_equal_single_barrier(ray_session, transcripts_path,
                                               tmp_path):
    """waves=3 must produce row-identical output to waves=1 with every
    partition manifest stamped, and a wave-killed job (simulated by
    deleting one wave's manifests) resumes only those partitions."""
    from raydoc.pipelines.extract_pipeline import run_job

    out1 = str(tmp_path / "w1")
    out3 = str(tmp_path / "w3")
    cfg1 = PipelineConfig(num_output_partitions=6)
    cfg3 = PipelineConfig(num_output_partitions=6, checkpoint_waves=3)

    r1 = run_job(transcripts_path, out1, cfg1)
    r3 = run_job(transcripts_path, out3, cfg3)
    assert r3["checkpoint_waves"] == 3
    assert r1["rows_written"] == r3["rows_written"] > 0

    import pyarrow.dataset as pads
    t1 = pads.dataset(out1, partitioning="hive").to_table(
        columns=["conv_id", "turn_idx", "extracted_text"]).to_pandas() \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    t3 = pads.dataset(out3, partitioning="hive").to_table(
        columns=["conv_id", "turn_idx", "extracted_text"]).to_pandas() \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert t1.equals(t3)

    # simulate a crash that lost the last wave: drop 2 manifests → resume
    # rewrites exactly those partitions
    for part in (1, 4):
        os.remove(os.path.join(out3, f"part={part}", "_manifest.json"))
    r = run_job(transcripts_path, out3, cfg3, resume=True)
    assert sorted(r["partitions_written"]) == [1, 4]
    assert sorted(r["partitions_skipped"]) == [0, 2, 3, 5]


def test_feather_source(ray_session, tmp_path):
    """Source-format dispatch: Arrow IPC / Feather corpus (one read task
    per file)."""
    import pyarrow.feather as pf

    table = tgen.generate_transcripts(n_convs=4, seed=FIXTURE_SEED,
                                      min_turns=2, max_turns=4)
    half = (table.num_rows // 2 // 2) * 2
    pf.write_feather(table.slice(0, half), str(tmp_path / "a.feather"))
    pf.write_feather(table.slice(half), str(tmp_path / "b.arrow"))

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(str(tmp_path)).take_all()
    assert len(rows) == table.num_rows
    assert {r["conv_id"] for r in rows} == \
        set(table.column("conv_id").to_pylist())


def test_multi_megabyte_turn(ray_session, tmp_path):
    """SURVEY §7 pitfall 4: a multi-MB HTML turn must flow through the
    pipeline (large_string columns, block splitting) without OOM or
    truncation, and still strip to its text content."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    big_html = ("<html><body>" +
                "".join(f"<p>paragraph {i} with meaningful text content "
                        f"that survives the strip</p>" for i in range(45000))
                + "</body></html>")          # ~3.5 MB
    assert len(big_html) > 3_000_000
    t = pa.table({
        "conv_id": pa.array(["huge", "huge", "tiny"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": pa.array([big_html, "a normal turn", "another"],
                         pa.large_string()),
    })
    path = str(tmp_path / "huge.parquet")
    pq.write_table(t, path)

    from raydoc.pipelines.extract_pipeline import extract_dataset

    rows = extract_dataset(path).take_all()
    assert len(rows) == 3
    huge = next(r for r in rows if r["conv_id"] == "huge"
                and r["turn_idx"] == 0)
    assert huge["was_html"] and not huge["parse_failed"]
    assert "paragraph 44999" in huge["extracted_text"]
    assert "<p>" not in huge["extracted_text"]


def test_read_parquet_evolved(ray_session, tmp_path):
    """Shards written under three schema versions read as ONE dataset
    with the target schema: missing columns null-fill, ints widen,
    abandoned extra columns drop, incompatible casts raise by name."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from raydoc.sources.evolved import read_parquet_evolved, widen_to_schema

    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int32()),
                             "text": ["a", "b"]}),
                   tmp_path / "v1.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([3], pa.int64()),
                             "text": ["c"],
                             "lang": ["en"]}),
                   tmp_path / "v2.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([4], pa.int64()),
                             "text": ["d"], "lang": ["de"],
                             "legacy_flag": [True]}),
                   tmp_path / "v3.parquet")
    target = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string())])
    out = read_parquet_evolved(str(tmp_path), target).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert list(out.columns) == ["doc_id", "text", "lang"]
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    assert out["lang"].isna().tolist() == [True, True, False, False]

    bad = pa.table({"doc_id": ["not-an-int"], "text": ["x"]})
    with pytest.raises(TypeError, match="doc_id"):
        widen_to_schema(bad, target)


def test_text_dir_source(ray_session, tmp_path):
    """Source-format dispatch: a folder of markdown/HTML/text documents
    (the reference's native input — one file per document) flows through
    the same pipeline, each file a single-turn conversation keyed by
    filename stem, byte-equal to process_conversation on the contents."""
    from raydoc.kernels.document import process_conversation
    from raydoc.pipelines.extract_pipeline import extract_dataset

    docs = {
        "alpha": "# Heading\n\nSome **bold** body text.",
        "beta": "<html><body><p>An HTML doc with "
                "<b>markup</b>.</p></body></html>",
        "gamma": "plain text line one\nline two",
    }
    for stem, body in docs.items():
        ext = ".html" if stem == "beta" else (".md" if stem == "alpha"
                                              else ".txt")
        (tmp_path / f"{stem}{ext}").write_text(body, encoding="utf-8")

    rows = extract_dataset(str(tmp_path)).take_all()
    assert {r["conv_id"] for r in rows} == set(docs)
    for r in rows:
        assert r["turn_idx"] == 0
        want = process_conversation(r["conv_id"], [0],
                                    [docs[r["conv_id"]]])
        assert r["extracted_text"] == want["turn_markdown"][0]


def test_bucketed_exchange_equals_sort_path(ray_session,
                                            transcripts_path):
    """The disk-backed bucketed hash exchange (cfg.exchange="bucketed")
    must produce byte-identical rows to the sort-shuffle general path —
    same conversations co-located, same document-stage output."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import extract_dataset

    general = extract_dataset(transcripts_path).take_all()
    cfg = replace(DEFAULT_CONFIG, exchange="bucketed")
    bucketed = extract_dataset(transcripts_path, cfg).take_all()

    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    general.sort(key=key)
    bucketed.sort(key=key)
    assert len(general) == len(bucketed)
    for g, b in zip(general, bucketed):
        assert g["extracted_text"] == b["extracted_text"]
        assert g["language"] == b["language"]
        assert g["gate_passed"] == b["gate_passed"]
        assert g["spans"] == b["spans"]
        assert g["part"] == b["part"]


def test_bucketed_exchange_run_job(ray_session, transcripts_path,
                                   tmp_path):
    """run_job with the bucketed exchange writes the same partitioned
    output as the sort path and cleans its spill directory."""
    import glob
    import tempfile

    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job

    out_sort = str(tmp_path / "sort")
    out_bkt = str(tmp_path / "bucketed")
    pre = set(glob.glob(os.path.join(tempfile.gettempdir(),
                                     "raydoc_exchange_*")))
    r1 = run_job(transcripts_path, out_sort, resume=False)
    cfg = replace(DEFAULT_CONFIG, exchange="bucketed")
    r2 = run_job(transcripts_path, out_bkt, cfg=cfg, resume=False)
    assert r1["rows_written"] == r2["rows_written"] > 0

    t1 = pq.read_table(out_sort).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    t2 = pq.read_table(out_bkt).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert t1.column("extracted_text").to_pylist() \
        == t2.column("extracted_text").to_pylist()
    assert t1.column("part").to_pylist() == t2.column("part").to_pylist()
    # the wave runner removed the spill tree ITS job created (dirs from
    # other tests' lazy extract_dataset calls are out of scope)
    new_dirs = set(glob.glob(os.path.join(
        tempfile.gettempdir(), "raydoc_exchange_*"))) - pre
    assert new_dirs == set()


def test_bucketed_exchange_stage1_checkpoint(ray_session,
                                             transcripts_path,
                                             tmp_path):
    """The exchange itself is a checkpoint: a second build with the SAME
    resume token skips stage 1 (fragment files untouched byte-for-byte),
    a junk spill tree without a valid marker is wiped (never appended
    over), and a DIFFERENT token rebuilds."""
    import glob

    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import (
        build_extraction_bucketed, read_transcripts)

    cfg = replace(DEFAULT_CONFIG, exchange="bucketed")
    spill = str(tmp_path / "spill")

    # junk from a "crashed" prior stage 1 (no marker) must be wiped
    os.makedirs(os.path.join(spill, "b00000"), exist_ok=True)
    junk = os.path.join(spill, "b00000", "junk.arrow")
    with open(junk, "wb") as fh:
        fh.write(b"partial")

    out1, _ = build_extraction_bucketed(
        read_transcripts(transcripts_path), cfg, spill,
        resume_token="tok1")
    rows1 = sorted((r["conv_id"], r["turn_idx"], r["extracted_text"])
                   for r in out1.take_all())
    assert not os.path.exists(junk)

    def frag_state():
        return {p: os.path.getmtime(p) for p in
                glob.glob(os.path.join(spill, "b*", "*.arrow"))}

    st1 = frag_state()
    assert st1

    # same token → stage 1 skipped, fragments byte-identical
    out2, _ = build_extraction_bucketed(
        read_transcripts(transcripts_path), cfg, spill,
        resume_token="tok1")
    rows2 = sorted((r["conv_id"], r["turn_idx"], r["extracted_text"])
                   for r in out2.take_all())
    assert frag_state() == st1
    assert rows1 == rows2

    # different token → wiped and rebuilt (same output either way)
    out3, _ = build_extraction_bucketed(
        read_transcripts(transcripts_path), cfg, spill,
        resume_token="tok2")
    rows3 = sorted((r["conv_id"], r["turn_idx"], r["extracted_text"])
                   for r in out3.take_all())
    assert set(frag_state()) != set(st1) or frag_state() != st1
    assert rows1 == rows3


def test_spilling_actor_retry_is_idempotent(ray_session, tmp_path):
    """A Ray task/actor retry re-runs a stage-1 batch after some of its
    fragments already landed. Fragment names are content hashes, so the
    second attempt OVERWRITES the first — same file set, no duplicated
    rows — instead of appending a uuid-tagged second copy."""
    import glob

    import pyarrow as pa

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import _SpillingExtractorActor

    spill = str(tmp_path / "spill")
    nb = 8
    for k in range(nb):
        os.makedirs(os.path.join(spill, f"b{k:05d}"), exist_ok=True)
    batch = pa.table({
        "conv_id": [f"c{i}" for i in range(12) for _ in range(2)],
        "turn_idx": pa.array([t for _ in range(12) for t in (0, 1)],
                             pa.int32()),
        "text": [f"turn text {i}-{t}" for i in range(12)
                 for t in (0, 1)],
    })
    actor = _SpillingExtractorActor(cfg=DEFAULT_CONFIG, spill=spill,
                                    nb=nb)
    r1 = actor(batch)
    frags1 = sorted(glob.glob(os.path.join(spill, "b*", "*.arrow")))
    sizes1 = [os.path.getsize(f) for f in frags1]
    assert frags1

    r2 = actor(batch)                   # the "retry"
    frags2 = sorted(glob.glob(os.path.join(spill, "b*", "*.arrow")))
    assert frags2 == frags1             # same file set, nothing appended
    assert [os.path.getsize(f) for f in frags2] == sizes1
    assert r1.column("rows").to_pylist() == r2.column("rows").to_pylist()

    # total spilled rows equal the batch's rows exactly once
    import pyarrow.ipc as ipc
    total = sum(ipc.open_file(f).read_all().num_rows for f in frags1)
    assert total == batch.num_rows
