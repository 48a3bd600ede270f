"""End-to-end composed training-corpus pipeline: extraction → quality
filter → exact dedup on extracted text → content-hash split → partitioned
write. Asserts the corpus invariants a downstream trainer relies on."""

import pyarrow.dataset as pads
import pytest

from raydoc.sources import transcripts as tgen


@pytest.fixture()
def corpus(ray_session, tmp_path):
    path = str(tmp_path / "transcripts.parquet")
    tgen.write_transcripts_parquet(path, n_convs=20, seed=77,
                                   min_turns=3, max_turns=8)
    out = str(tmp_path / "corpus")
    from raydoc.pipelines.training_corpus import build_training_corpus
    stats = build_training_corpus(path, out)
    return out, stats


def test_corpus_invariants(corpus):
    out, stats = corpus
    t = pads.dataset(out, partitioning="hive").to_table()
    assert t.num_rows == stats["rows"] > 0
    assert stats["train_rows"] + stats["test_rows"] == stats["rows"]
    assert stats["train_rows"] > stats["test_rows"] > 0   # ~75/25 split

    hashes = t.column("text_hash").to_pylist()
    assert len(hashes) == len(set(hashes))                # exact-dedup held

    splits = dict(zip(hashes, t.column("split").to_pylist()))
    for h, s in splits.items():
        assert s == ("train" if h[0] < "c" else "test")   # split is pure fn

    texts = t.column("extracted_text").to_pylist()
    assert all(x and x.strip() for x in texts)            # quality filter held


def test_read_extracted_validates_manifests(ray_session, tmp_path):
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job
    from raydoc.pipelines.training_corpus import read_extracted

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    tgen.write_transcripts_parquet(str(in_dir / "a.parquet"), n_convs=4,
                                   seed=5)
    out = str(tmp_path / "out")
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)
    run_job(str(in_dir), out, cfg=cfg)

    ds = read_extracted(out)
    assert ds.count() > 0

    import os
    os.remove(os.path.join(out, "_manifests", "a.json"))
    with pytest.raises(ValueError, match="lack manifests"):
        read_extracted(out)


def test_corpus_global_dedup_across_builds(ray_session, tmp_path):
    """Two corpus builds sharing a global_dedup_dir: the second build over
    the SAME transcripts yields zero rows (everything already seen)."""
    from raydoc.pipelines.training_corpus import build_training_corpus
    from raydoc.sources import transcripts as tgen

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    tgen.write_transcripts_parquet(str(in_dir / "s.parquet"), n_convs=5,
                                   seed=321, min_turns=2, max_turns=4)
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)
    idx = str(tmp_path / "global_index")

    s1 = build_training_corpus(str(in_dir), str(tmp_path / "c1"), cfg=cfg,
                               global_dedup_dir=idx)
    assert s1["rows"] > 0

    s2 = build_training_corpus(str(in_dir), str(tmp_path / "c2"), cfg=cfg,
                               global_dedup_dir=idx)
    assert s2["rows"] == 0


def test_corpus_rerun_never_destroys_existing_output(ray_session, tmp_path):
    """A fully-deduped rerun into the SAME out_dir must refuse to replace
    the existing corpus with an empty one (staging-swap discipline); the
    previous output stays readable."""
    import glob
    import os

    from raydoc.pipelines.training_corpus import build_training_corpus
    from raydoc.sources import transcripts as tgen

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    tgen.write_transcripts_parquet(str(in_dir / "s.parquet"), n_convs=5,
                                   seed=321, min_turns=2, max_turns=4)
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)
    idx = str(tmp_path / "global_index")
    out = str(tmp_path / "corpus")

    s1 = build_training_corpus(str(in_dir), out, cfg=cfg,
                               global_dedup_dir=idx)
    assert s1["rows"] > 0
    files_before = sorted(glob.glob(f"{out}/**/*.parquet", recursive=True))
    assert files_before

    with pytest.raises(RuntimeError, match="refusing to replace"):
        build_training_corpus(str(in_dir), out, cfg=cfg,
                              global_dedup_dir=idx)
    # previous corpus intact, staging cleaned up
    assert sorted(glob.glob(f"{out}/**/*.parquet",
                            recursive=True)) == files_before
    assert not os.path.isdir(out + ".staging")


def test_corpus_global_neardup_across_builds(ray_session, tmp_path):
    """Two corpus builds sharing a global_neardup_dir: the second build
    over the SAME transcripts yields zero rows via the LSH index alone
    (no exact index in play)."""
    from dataclasses import replace

    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.training_corpus import build_training_corpus
    from raydoc.sources import transcripts as tgen

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    tgen.write_transcripts_parquet(str(in_dir / "s.parquet"), n_convs=5,
                                   seed=654, min_turns=2, max_turns=4)
    cfg = replace(DEFAULT_CONFIG, assume_conv_aligned=True,
                  extract_concurrency=2)
    idx = str(tmp_path / "lsh_index")

    s1 = build_training_corpus(str(in_dir), str(tmp_path / "c1"), cfg=cfg,
                               global_neardup_dir=idx)
    assert s1["rows"] > 0
    s2 = build_training_corpus(str(in_dir), str(tmp_path / "c2"), cfg=cfg,
                               global_neardup_dir=idx)
    assert s2["rows"] == 0
