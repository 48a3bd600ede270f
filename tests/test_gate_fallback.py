"""Quality-gate fallback hop (SURVEY §7.4.7 ≙ app.py:284-288) and the
extractor registry (SURVEY §2.11). Pure-kernel tests — no Ray needed."""

from dataclasses import replace

import pytest

from raydoc.config import DEFAULT_CONFIG
from raydoc.kernels import registry
from raydoc.kernels.document import extract_turn_text, process_conversation

# triggers the hallucination detector → gate fails, action=fallback_to_local_ocr
_HALLUC = "I can see that the table lists quarterly revenue."
_CLEAN_TURNS = [
    "# Quarterly report\n\nRevenue grew twelve percent year over year.",
    "Costs stayed flat across every region we operate in.",
    "The outlook for next quarter remains unchanged and stable.",
]


def _conv(texts, cfg):
    return process_conversation("conv-fb", list(range(len(texts))), texts,
                                cfg=cfg)


def test_gate_fails_without_fallback():
    cfg = replace(DEFAULT_CONFIG, enable_gate_fallback=False)
    r = _conv(_CLEAN_TURNS + [_HALLUC], cfg)
    assert not r["gate_passed"]
    assert r["suggested_action"] == "fallback_to_local_ocr"
    assert r["fallback_applied"] is False
    assert r["extraction_engine"] == "enhanced"


def test_fallback_hop_flips_gate_and_is_bounded():
    """A registered variant that fixes the offending content flips
    gate_passed on the SECOND hop; the variant runs exactly once."""
    calls = []

    def fixing_variant(turns, cfg):
        calls.append(1)
        fixed = []
        for elements in turns:
            out = []
            for e in elements:
                e = dict(e)
                if "content" in e:
                    e["content"] = e["content"].replace(
                        "I can see that", "Notably,")
                out.append(e)
            fixed.append(out)
        return fixed

    registry.register_document_variant("test_fixer", fixing_variant)
    try:
        cfg = replace(DEFAULT_CONFIG, enable_gate_fallback=True,
                      fallback_variant="test_fixer")
        r = _conv(_CLEAN_TURNS + [_HALLUC], cfg)
        assert r["fallback_applied"] is True
        assert r["gate_passed"] is True
        assert r["suggested_action"] == "accept"
        assert r["extraction_engine"] == "test_fixer"
        assert len(calls) == 1          # exactly one hop, no retry storm
    finally:
        registry.DOCUMENT_VARIANTS.pop("test_fixer", None)


def test_fallback_keeps_primary_when_no_better():
    """A variant that does not help leaves the primary result in place
    (fallback_applied records the attempt) and still runs only once."""
    calls = []

    def identity_variant(turns, cfg):
        calls.append(1)
        return [[dict(e) for e in t] for t in turns]

    registry.register_document_variant("test_noop", identity_variant)
    try:
        cfg = replace(DEFAULT_CONFIG, enable_gate_fallback=True,
                      fallback_variant="test_noop")
        r = _conv(_CLEAN_TURNS + [_HALLUC], cfg)
        assert r["fallback_applied"] is True
        assert not r["gate_passed"]
        assert r["extraction_engine"] == "enhanced"
        assert len(calls) == 1
    finally:
        registry.DOCUMENT_VARIANTS.pop("test_noop", None)


def test_builtin_legacy_variant_runs():
    """The built-in 'legacy' variant re-extracts through the font-size-only
    classifier and produces a complete, well-formed result."""
    cfg = replace(DEFAULT_CONFIG, enable_gate_fallback=True)
    r = _conv(_CLEAN_TURNS + [_HALLUC], cfg)
    assert r["fallback_applied"] is True
    # legacy can't remove the hallucination phrase — gate stays failed but
    # the result is intact and bounded to one hop
    assert len(r["turn_markdown"]) == 4
    assert r["extraction_engine"] in ("enhanced", "legacy")


def test_gate_passing_doc_never_falls_back():
    cfg = replace(DEFAULT_CONFIG, enable_gate_fallback=True)
    r = _conv(_CLEAN_TURNS, cfg)
    assert r["gate_passed"] is True
    assert r["fallback_applied"] is False


def test_unknown_variant_raises():
    with pytest.raises(KeyError):
        registry.get_document_variant("nope")


# --- text-extractor registry (SURVEY §2.11) ---------------------------------

def test_custom_text_extractor_routes():
    seen = []

    def shouting(text):
        seen.append(text)
        return text.upper()

    orig = registry.TEXT_EXTRACTORS["markdown"]
    registry.register_text_extractor("markdown", shouting)
    try:
        out, was_html, _ = extract_turn_text("hello world")
        assert out == "HELLO WORLD"
        assert was_html is False
        assert seen == ["hello world"]
    finally:
        registry.register_text_extractor("markdown", orig)


def test_html_routes_to_html_extractor():
    html = "<html><body><p>alpha beta gamma delta</p></body></html>"
    out, was_html, ratio = extract_turn_text(html)
    assert was_html is True
    assert "alpha beta gamma delta" in out
    assert "<p>" not in out
    assert ratio > 0
