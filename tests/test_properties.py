"""Property-based invariants (hypothesis) over the kernel pipeline.

These assert engine INVARIANTS, not reference outputs (goldens cover
those): tag-don't-remove conservation, span well-formedness, one output
row per input turn, and determinism under repeated evaluation.
"""

from hypothesis import given, settings, strategies as st

from raydoc.config import DEFAULT_CONFIG
from raydoc.kernels.document import process_conversation
from raydoc.kernels.noise import tag_noise

# printable-ish text including newlines, unicode, markdown punctuation
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=400,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_text, min_size=1, max_size=8))
def test_one_output_row_per_turn_and_sorted(texts):
    r = process_conversation("conv", list(range(len(texts))), texts)
    assert r["turn_idx"] == sorted(r["turn_idx"]) == list(range(len(texts)))
    assert len(r["turn_markdown"]) == len(texts)
    assert len(r["turn_spans"]) == len(texts)


@settings(max_examples=40, deadline=None)
@given(st.lists(_text, min_size=1, max_size=6))
def test_spans_lie_within_turn_text(texts):
    r = process_conversation("conv", list(range(len(texts))), texts)
    for md, spans in zip(r["turn_markdown"], r["turn_spans"]):
        for s in spans:
            assert 0 <= s["start"] <= s["end"] <= len(md), (s, len(md))
            assert isinstance(s["role"], str) and s["role"]


@settings(max_examples=40, deadline=None)
@given(st.lists(_text, min_size=1, max_size=6))
def test_determinism(texts):
    a = process_conversation("conv", list(range(len(texts))), texts)
    b = process_conversation("conv", list(range(len(texts))), texts)
    assert a == b


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.fixed_dictionaries({
    "type": st.just("text"),
    "content": _text,
    "y": st.floats(0, 1000, allow_nan=False),
    "confidence": st.floats(0, 1, allow_nan=False),
}), max_size=6), min_size=1, max_size=6))
def test_tag_noise_conserves_elements(turns):
    n_in = sum(len(t) for t in turns)
    out, _detail = tag_noise([list(map(dict, t)) for t in turns],
                             tag_mode=True,
                             threshold=DEFAULT_CONFIG.repeater_threshold)
    assert sum(len(t) for t in out) == n_in   # tag, don't remove


@settings(max_examples=25, deadline=None)
@given(st.lists(_text, min_size=1, max_size=4))
def test_span_slices_carry_role_annotations(texts):
    """Each span slice is the rendered element block: it embeds the role
    annotation it reports (spans are the machine-readable index into the
    extracted text)."""
    r = process_conversation("conv", list(range(len(texts))), texts)
    for md, spans in zip(r["turn_markdown"], r["turn_spans"]):
        for s in spans:
            block = md[s["start"]:s["end"]]
            assert f'role:{s["role"]}' in block or s["role"] in (
                "table", "figure", "text"), (s, block[:80])
