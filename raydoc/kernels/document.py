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
from raydoc.kernels.lang import detect_language
from raydoc.kernels.linking import link_captions, link_footnotes
from raydoc.kernels.render import TurnContext, render_element
from raydoc.kernels.roles import analyze_layout
from raydoc.kernels.textnorm import merge_hyphens_loose
from raydoc.kernels.validate import quality_gate, validate_markdown

Element = dict[str, Any]

_ROLE_OF_BLOCK = re.compile(r"<!-- role:(\w+)")

# gate suggested_actions that trigger the one-hop engine fallback
# (validation_framework.py:362-376 action names)
_FALLBACK_ACTIONS = frozenset({
    "fallback_to_local_ocr", "fallback_to_alternative", "reject_and_retry"})


def conv_document_id(conv_id: str) -> str:
    """Deterministic 16-hex id ≙ metadata_extractor.py:58-75 (sha256 of the
    source identity, truncated)."""
    return hashlib.sha256(conv_id.encode()).hexdigest()[:16]


def extract_turn_text(text: str) -> tuple[str, bool, float]:
    """Per-turn payload routing through the extractor REGISTRY
    (kernels/registry.py; ≙ the reference's engine router app.py:254-299):
    detected payload kind → registered extractor. The built-ins are
    HTML → DOM text-density strip + markdown normalization, and
    markdown → normalization (≙ digital path structure_engine.py:76-79);
    a cloud/model extractor slots in via ``register_text_extractor``.

    Returns (normalized_text, was_html, strip_ratio)."""
    from raydoc.kernels import registry
    kind = registry.detect_payload_kind(text)
    normalized = registry.get_text_extractor(kind)(text)
    n = len(text)
    strip_ratio = (n - len(normalized)) / n if n else 0.0
    return normalized, kind == "html", strip_ratio


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

    # snapshot pristine element dicts for the bounded fallback hop BEFORE
    # the cross-turn stages mutate them (noise tags, caption removal)
    pristine: list[list[Element]] | None = None
    if cfg.enable_gate_fallback:
        pristine = [[{**e} for e in t] for t in turns]

    def _run_stages(run_turns: list[list[Element]]) -> dict[str, Any]:
        # --- cross-turn stages (enhanced_pipeline.py:98-131) ---
        noise_detail: dict[str, list[str]] = {
            "headers": [], "footers": [], "watermarks": [],
            "page_numbers": [], "artifacts": []}
        if cfg.enable_noise_filter:
            run_turns, noise_detail = noise_k.tag_noise(
                run_turns, tag_mode=cfg.tag_mode,
                threshold=cfg.repeater_threshold,
                min_turns=cfg.min_turns_for_repeaters,
                artifact_confidence=cfg.artifact_confidence)
        captions: list[dict[str, Any]] = []
        if cfg.enable_caption_extraction:
            run_turns, captions = link_captions(run_turns)
            run_turns, footnotes = link_footnotes(run_turns, None,
                                                  cfg.footnote_bottom)
        else:
            footnotes = []

        records = conf_k.collect_scores(run_turns)
        stats = conf_k.confidence_stats(records, cfg.low_confidence,
                                        cfg.critical_confidence)

        # --- render (enhanced_pipeline.py:136-174) ---
        turn_markdown: list[str] = []
        turn_spans: list[list[dict[str, Any]]] = []
        doc = ""
        for page_num, elements in enumerate(run_turns, 1):
            segment, spans = render_turn_with_spans(elements, page_num,
                                                    cfg.page_height)
            turn_markdown.append(segment)
            turn_spans.append(spans)
            doc += segment
        doc = merge_hyphens_loose(doc)

        metadata: dict[str, Any] = {
            "source_file": conv_id,
            "document_id": conv_document_id(conv_id),
            "pages": len(run_turns),
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
            "turns": run_turns, "turn_markdown": turn_markdown,
            "turn_spans": turn_spans, "doc": doc, "lang": lang,
            "metadata": metadata, "report": report, "gate": gate,
            "captions": captions, "footnotes": footnotes,
            "noise_detail": noise_detail,
        }

    r = _run_stages(turns)
    engine = "enhanced" if cfg.use_enhanced_classification else "legacy"
    fallback_applied = False
    # --- bounded quality-gate fallback (SURVEY §7.4.7; ≙ app.py:284-288):
    # a gate-failed document whose suggested_action asks for an alternate
    # engine is re-extracted EXACTLY ONCE through the configured document
    # variant (kernels/registry.py); the better result wins.
    if (cfg.enable_gate_fallback and not r["gate"]["passed"]
            and r["gate"]["suggested_action"] in _FALLBACK_ACTIONS):
        from raydoc.kernels.registry import get_document_variant
        rebuilt = get_document_variant(cfg.fallback_variant)(pristine, cfg)
        alt = _run_stages(rebuilt)
        fallback_applied = True
        if (alt["gate"]["passed"] or
                alt["report"]["quality_score"] > r["report"]["quality_score"]):
            r = alt
            engine = cfg.fallback_variant

    return {
        "conv_id": conv_id,
        "turn_idx": idxs,
        "turn_markdown": r["turn_markdown"],
        "turn_spans": r["turn_spans"],
        "n_elements": [len(t) for t in r["turns"]],
        "parse_failed": parse_failed,
        "was_html": was_html,
        "strip_ratio": strip_ratios,
        "doc_markdown": r["doc"],
        "language": r["lang"]["language"],
        "language_confidence": r["lang"]["confidence"],
        "quality_score": r["report"]["quality_score"],
        "confidence_score": r["metadata"]["confidence_score"],
        "gate_passed": r["gate"]["passed"],
        "suggested_action": r["gate"]["suggested_action"],
        "fallback_applied": fallback_applied,
        "extraction_engine": engine,
        "n_captions": len(r["captions"]),
        "n_footnotes": len(r["footnotes"]),
        "noise_counts": {k: len(v) for k, v in r["noise_detail"].items()},
        "validation_errors": r["report"]["errors"],
        "hallucination_count": r["report"]["hallucination_count"],
    }
