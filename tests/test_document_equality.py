"""Per-turn and whole-document equality vs the reference pipeline goldens.

This is the north-star invariant (BASELINE.json): per-turn extracted text
must equal the reference implementation's output under stable turn
ordering. Goldens were produced by running the reference's pure modules
(layout_analyzer → noise_filter → caption_extractor → footnote linker →
confidence tracker → semantic_annotator → schema_enforcer → validation)
on the identical fixture corpus; see tools/make_goldens.py.
"""

from raydoc.kernels.document import extract_turn_text, process_conversation
from raydoc.sources import transcripts as tgen

FIXTURE_SEED = 123
N_CONVS = 24


def _fixture_convs():
    table = tgen.generate_transcripts(n_convs=N_CONVS, seed=FIXTURE_SEED,
                                      min_turns=1, max_turns=8,
                                      skew_conv_turns=24)
    by_conv = {}
    for conv_id, idx, text in zip(table.column("conv_id").to_pylist(),
                                  table.column("turn_idx").to_pylist(),
                                  table.column("text").to_pylist()):
        by_conv.setdefault(conv_id, []).append((idx, text))
    return {k: sorted(v) for k, v in by_conv.items()}


def test_normalized_turn_text_matches_reference_cleaner(golden_documents):
    convs = _fixture_convs()
    for case in golden_documents:
        turns = convs[case["conv_id"]]
        for (_, text), expected in zip(turns, case["normalized_texts"]):
            normalized, _, _ = extract_turn_text(text)
            assert normalized == expected


def test_per_turn_markdown_equality(golden_documents):
    convs = _fixture_convs()
    checked = 0
    for case in golden_documents:
        turns = convs[case["conv_id"]]
        result = process_conversation(
            case["conv_id"],
            [i for i, _ in turns],
            [t for _, t in turns],
        )
        assert result["turn_idx"] == case["turn_idx"]
        for mine, expected in zip(result["turn_markdown"], case["turn_segments"]):
            assert mine == expected
            checked += 1
        assert result["n_elements"] == case["n_elements"]
    assert checked > 50  # corpus is non-trivial


def test_document_markdown_equality(golden_documents):
    convs = _fixture_convs()
    for case in golden_documents:
        turns = convs[case["conv_id"]]
        result = process_conversation(
            case["conv_id"],
            [i for i, _ in turns],
            [t for _, t in turns],
        )
        assert result["doc_markdown"] == case["doc_markdown"]
        assert result["language"] == case["language"]
        assert result["confidence_score"] == case["confidence_score"]
        assert result["quality_score"] == case["quality_score"]
        assert result["gate_passed"] == case["gate_passed"]
        assert result["suggested_action"] == case["suggested_action"]


def test_shuffled_input_restores_turn_order(golden_documents):
    """The O4 ordering contract: rows may arrive in any order."""
    convs = _fixture_convs()
    case = max(golden_documents, key=lambda c: len(c["turn_idx"]))
    turns = convs[case["conv_id"]]
    shuffled = list(reversed(turns))
    result = process_conversation(
        case["conv_id"],
        [i for i, _ in shuffled],
        [t for _, t in shuffled],
    )
    assert result["turn_idx"] == case["turn_idx"]
    assert result["doc_markdown"] == case["doc_markdown"]
