"""Per-conversation document pipeline (the groupby(conv_id) payload).

Re-expresses the reference's per-document enhanced pipeline
(enhanced_pipeline.py:75-204, process_document_enhanced :223-257) over one
conversation whose turns are the "pages":

  stage 1  noise tagging (cross-turn repeaters + predicates)   ≙ EP:98-104
  stage 2  caption link + strip                                 ≙ EP:107-112
  stage 3  footnote linking                                     ≙ EP:114-120
  stage 4  confidence aggregation                               ≙ EP:122-131
  render   per-turn annotation grammar → doc concat →
           loose hyphen merge → language → schema enforcement   ≙ EP:136-174
  validate validation framework + quality gate                  ≙ EP:176-204

No state crosses conversations (verified in the reference: every tracker is
reset per document, enhanced_pipeline.py:125-127) — conversations are
embarrassingly parallel, which is exactly what the Ray groupby gives us.

Per-turn equality surface: ``turn_markdown[i]`` equals the reference's
``SemanticAnnotator.annotate_page`` on the same processed elements, and
``doc_markdown`` equals the full reference render+enforce output.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.kernels import confidence as conf_k
from raydoc.kernels import noise as noise_k
from raydoc.kernels.elementize import assemble_turn_elements, elementize
from raydoc.kernels.enforce import enforce_schema
from raydoc.kernels.htmlstrip import looks_like_html, strip_html
from raydoc.kernels.lang import detect_language
from raydoc.kernels.linking import link_captions, link_footnotes
from raydoc.kernels.render import TurnContext, render_element
from raydoc.kernels.roles import analyze_layout
from raydoc.kernels.textnorm import merge_hyphens_loose, normalize_markdown
from raydoc.kernels.validate import quality_gate, validate_markdown

Element = dict[str, Any]

_ROLE_OF_BLOCK = re.compile(r"<!-- role:(\w+)")


def conv_document_id(conv_id: str) -> str:
    """Deterministic 16-hex id ≙ metadata_extractor.py:58-75 (sha256 of the
    source identity, truncated)."""
    return hashlib.sha256(conv_id.encode()).hexdigest()[:16]


def extract_turn_text(text: str) -> tuple[str, bool, float]:
    """Per-turn payload routing: HTML → DOM text-density strip; then the
    flagship markdown normalization (≙ digital path structure_engine.py:76-79).

    Returns (normalized_text, was_html, strip_ratio)."""
    was_html = looks_like_html(text)
    body = strip_html(text) if was_html else text
    normalized = normalize_markdown(body)
    n = len(text)
    strip_ratio = (n - len(normalized)) / n if n else 0.0
    return normalized, was_html, strip_ratio


def build_turn_elements(normalized_text: str,
                        cfg: PipelineConfig = DEFAULT_CONFIG) -> list[Element]:
    """normalized turn text → processed element list (elementize → layout →
    handoff assembly; ≙ structure_engine.py:329-440 per page)."""
    raw, tables, figures = elementize(normalized_text)
    layout = analyze_layout(raw, confidence_threshold=cfg.low_confidence,
                            use_enhanced=cfg.use_enhanced_classification,
                            column_gap=cfg.column_gap)
    return assemble_turn_elements(raw, tables, figures, layout)


def render_turn_with_spans(elements: list[Element], turn_num: int,
                           page_height: float = 800.0
                           ) -> tuple[str, list[dict[str, Any]]]:
    """Assemble one turn exactly like render.render_turn, additionally
    recording (role, start, end) spans of each rendered element block."""
    ctx = TurnContext(elements, turn_num, page_height)
    out = f"\n<!-- page:{turn_num} -->\n\n"
    spans: list[dict[str, Any]] = []
    ordered = sorted(elements,
                     key=lambda e: (e.get("reading_order", 0), e.get("y", 0)))
    for elem in ordered:
        rendered = render_element(elem, ctx)
        if rendered:
            m = _ROLE_OF_BLOCK.search(rendered)
            spans.append({
                "role": m.group(1) if m else elem.get("type", "text"),
                "start": len(out),
                "end": len(out) + len(rendered),
            })
            out += rendered + "\n"
    return out, spans


def process_conversation(conv_id: str,
                         turn_idxs: list[int],
                         turn_texts: list[str],
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         extraction_date: str = "1970-01-01T00:00:00",
                         prebuilt_elements: list[list[Element]] | None = None,
                         turn_stats: list[tuple[bool, float, bool]] | None = None,
                         ) -> dict[str, Any]:
    """Run the full document pipeline for one conversation.

    ``turn_idxs``/``turn_texts`` may arrive unsorted (shuffle order); stable
    turn ordering is re-established here (the O4 ordering contract,
    SURVEY.md §2.7). ``prebuilt_elements`` lets the extractor stage pass
    already-parsed elements across the shuffle boundary.

    Returns a dict with per-turn lists (aligned, sorted by turn_idx) and
    document-level fields.
    """
    order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
    idxs = [turn_idxs[i] for i in order]

    turns: list[list[Element]] = []
    parse_failed: list[bool] = []
    was_html: list[bool] = []
    strip_ratios: list[float] = []

    if prebuilt_elements is not None:
        turns = [prebuilt_elements[i] for i in order]
        if turn_stats is not None:
            for i in order:
                h, s, f = turn_stats[i]
                was_html.append(h)
                strip_ratios.append(s)
                parse_failed.append(f)
        else:
            was_html = [False] * len(turns)
            strip_ratios = [0.0] * len(turns)
            parse_failed = [False] * len(turns)
    else:
        for i in order:
            text = turn_texts[i]
            try:
                normalized, html_flag, ratio = extract_turn_text(text)
                turns.append(build_turn_elements(normalized, cfg))
                parse_failed.append(False)
                was_html.append(html_flag)
                strip_ratios.append(ratio)
            except Exception:
                # per-turn failure isolation ≙ structure_engine.py:442-445
                turns.append([])
                parse_failed.append(True)
                was_html.append(False)
                strip_ratios.append(0.0)

    # --- cross-turn stages (enhanced_pipeline.py:98-131) ---
    noise_detail: dict[str, list[str]] = {
        "headers": [], "footers": [], "watermarks": [],
        "page_numbers": [], "artifacts": []}
    if cfg.enable_noise_filter:
        turns, noise_detail = noise_k.tag_noise(
            turns, tag_mode=cfg.tag_mode, threshold=cfg.repeater_threshold,
            min_turns=cfg.min_turns_for_repeaters,
            artifact_confidence=cfg.artifact_confidence)
    captions: list[dict[str, Any]] = []
    if cfg.enable_caption_extraction:
        turns, captions = link_captions(turns)
        turns, footnotes = link_footnotes(turns, None, cfg.footnote_bottom)
    else:
        footnotes = []

    records = conf_k.collect_scores(turns)
    stats = conf_k.confidence_stats(records, cfg.low_confidence,
                                    cfg.critical_confidence)

    # --- render (enhanced_pipeline.py:136-174) ---
    turn_markdown: list[str] = []
    turn_spans: list[list[dict[str, Any]]] = []
    doc = ""
    for page_num, elements in enumerate(turns, 1):
        segment, spans = render_turn_with_spans(elements, page_num,
                                                cfg.page_height)
        turn_markdown.append(segment)
        turn_spans.append(spans)
        doc += segment
    doc = merge_hyphens_loose(doc)

    metadata: dict[str, Any] = {
        "source_file": conv_id,
        "document_id": conv_document_id(conv_id),
        "pages": len(turns),
        "extraction_method": "raydoc",
        "extraction_date": extraction_date,
    }
    metadata.update(conf_k.quality_frontmatter_fields(stats))
    lang = detect_language(doc)
    metadata["language"] = lang["language"]
    doc, violations = enforce_schema(doc, metadata)

    # --- validate + gate (enhanced_pipeline.py:176-204) ---
    report = validate_markdown(doc)
    gate = quality_gate(doc, report,
                        min_quality_score=cfg.quality_threshold,
                        max_hallucinations=cfg.max_hallucinations,
                        max_errors=cfg.max_errors,
                        min_content_lines=cfg.min_content_lines)

    return {
        "conv_id": conv_id,
        "turn_idx": idxs,
        "turn_markdown": turn_markdown,
        "turn_spans": turn_spans,
        "n_elements": [len(t) for t in turns],
        "parse_failed": parse_failed,
        "was_html": was_html,
        "strip_ratio": strip_ratios,
        "doc_markdown": doc,
        "language": lang["language"],
        "language_confidence": lang["confidence"],
        "quality_score": report["quality_score"],
        "confidence_score": metadata["confidence_score"],
        "gate_passed": gate["passed"],
        "suggested_action": gate["suggested_action"],
        "n_captions": len(captions),
        "n_footnotes": len(footnotes),
        "noise_counts": {k: len(v) for k, v in noise_detail.items()},
        "validation_errors": report["errors"],
        "hallucination_count": report["hallucination_count"],
    }
