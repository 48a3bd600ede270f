"""Skew guard for the document stage (SURVEY.md §7.4.5): a conversation
over ``cfg.max_turns_per_conv`` must COMPLETE through both pipeline
topologies, with every turn present, chunk-local processing, and every
row of the oversize conversation visibly flagged — the co-location
contract enforced, not assumed."""

import pyarrow as pa
import pytest

from raydoc.config import PipelineConfig
from raydoc.stages.document_stage import OVERSIZE_ACTION


@pytest.fixture(scope="module")
def skew_transcripts_path(tmp_path_factory):
    from raydoc.sources import transcripts as tgen
    path = str(tmp_path_factory.mktemp("skew") / "transcripts.parquet")
    # conv 0 is a 60-turn giant; the rest are normal 1-6 turn convs
    tgen.write_transcripts_parquet(path, n_convs=8, seed=99,
                                   min_turns=1, max_turns=6,
                                   skew_conv_turns=60)
    return path


@pytest.mark.parametrize("aligned", [False, True])
def test_oversize_conversation_completes_flagged(ray_session,
                                                 skew_transcripts_path,
                                                 aligned):
    from raydoc.pipelines.extract_pipeline import (build_extraction,
                                                   build_extraction_aligned,
                                                   extract_dataset)

    cfg = PipelineConfig(max_turns_per_conv=16,
                         assume_conv_aligned=aligned)
    if aligned:
        import os
        ds = build_extraction_aligned(
            os.path.dirname(skew_transcripts_path), cfg=cfg)
    else:
        ds = extract_dataset(skew_transcripts_path, cfg=cfg)
    rows = ds.take_all()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)

    giant = max(by_conv, key=lambda c: len(by_conv[c]))
    g = sorted(by_conv[giant], key=lambda r: r["turn_idx"])
    assert len(g) == 60                       # every turn survived
    assert [r["turn_idx"] for r in g] == sorted(r["turn_idx"] for r in g)
    assert all(r["suggested_action"] == OVERSIZE_ACTION for r in g)
    assert all(r["fallback_applied"] for r in g)
    # normal conversations are untouched by the guard
    for cid, rs in by_conv.items():
        if cid == giant:
            continue
        assert all(r["suggested_action"] != OVERSIZE_ACTION for r in rs)


def test_guard_off_and_in_cap_identical(ray_session, skew_transcripts_path):
    """Below the cap the guard changes nothing: cap=None and a huge cap
    produce identical rows."""
    from raydoc.pipelines.extract_pipeline import extract_dataset

    def rows(cfg):
        out = extract_dataset(skew_transcripts_path, cfg=cfg).take_all()
        return sorted(((r["conv_id"], r["turn_idx"], r["extracted_text"],
                        r["suggested_action"]) for r in out))

    a = rows(PipelineConfig(max_turns_per_conv=None))
    b = rows(PipelineConfig(max_turns_per_conv=100_000))
    assert a == b
    assert all(act != OVERSIZE_ACTION for _, _, _, act in a)


def test_chunk_boundaries_cover_all_turns(ray_session):
    """Direct unit check of the guarded helper: 25 shuffled turns, cap 8
    → 4 chunks in turn_idx order covering every turn exactly once."""
    from raydoc.stages.document_stage import _process_conversation_guarded

    idxs = list(range(25))
    import random
    random.Random(5).shuffle(idxs)
    prebuilt = [[] for _ in idxs]
    stats = [(False, 0.0, False) for _ in idxs]
    cfg = PipelineConfig(max_turns_per_conv=8)
    results = _process_conversation_guarded("c0", idxs, prebuilt, stats,
                                            cfg)
    assert len(results) == 4
    seen = [t for r in results for t in r["turn_idx"]]
    assert sorted(seen) == list(range(25))
    # chunks are turn_idx-ordered: each chunk's max < next chunk's min
    for a, b in zip(results, results[1:]):
        assert max(a["turn_idx"]) < min(b["turn_idx"])
    assert all(r["suggested_action"] == OVERSIZE_ACTION for r in results)
