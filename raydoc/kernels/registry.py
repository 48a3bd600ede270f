"""Config-driven extractor registry (SURVEY.md §2.11 user-extension
surface).

Reference analog: the string-keyed engine router (``"OpenRouter" in
ocr_engine``, app.py:254-299) plus the OPENROUTER_MODELS registry
(structure_engine.py:595-626), rebuilt as two small registries:

- **Text extractors**, keyed by detected payload kind (``html`` /
  ``markdown``). ``extract_turn_text`` routes through this table, so a
  cloud/model extractor slots in via ``register_text_extractor`` without
  editing any kernel code. A registered callable takes the raw turn text
  and returns normalized text.

- **Document variants**, keyed by name — the alternate kernel paths the
  quality-gate fallback hop (SURVEY §7.4.7; ≙ engine fallback
  app.py:284-288) can re-extract with. The built-in ``legacy`` variant
  rebuilds every turn's elements through the font-size-only legacy
  classifier (layout_analyzer.py:326-393 semantics). A variant callable
  takes (pristine per-turn element lists, cfg) and returns rebuilt
  per-turn element lists.

Registries are process-global module state; Ray actors build them at
import time in each worker, and custom registrations made in actor
``__init__`` (or via a module import) apply worker-locally — the same
model as the kernel pattern banks.
"""

from __future__ import annotations

from typing import Any, Callable

Element = dict[str, Any]


# --- text extractors (payload kind → normalized text) -----------------------

def detect_payload_kind(text: str) -> str:
    from raydoc.kernels.htmlstrip import looks_like_html
    return "html" if looks_like_html(text) else "markdown"


def _extract_html(text: str) -> str:
    from raydoc.kernels.htmlstrip import strip_html
    from raydoc.kernels.textnorm import normalize_markdown
    return normalize_markdown(strip_html(text))


def _extract_markdown(text: str) -> str:
    from raydoc.kernels.textnorm import normalize_markdown
    return normalize_markdown(text)


TEXT_EXTRACTORS: dict[str, Callable[[str], str]] = {
    "html": _extract_html,
    "markdown": _extract_markdown,
}


def register_text_extractor(kind: str, fn: Callable[[str], str]) -> None:
    TEXT_EXTRACTORS[kind] = fn


def get_text_extractor(kind: str) -> Callable[[str], str]:
    return TEXT_EXTRACTORS.get(kind, _extract_markdown)


# --- document variants (the fallback hop's alternate kernel paths) ----------

def rebuild_turns_legacy(turns: list[list[Element]], cfg) -> list[list[Element]]:
    """Re-extract each turn's elements through the LEGACY layout path:
    text elements go back through analyze_layout(use_enhanced=False) and
    reassembly; table/figure elements pass through untouched."""
    from raydoc.kernels.elementize import assemble_turn_elements
    from raydoc.kernels.roles import analyze_layout

    rebuilt: list[list[Element]] = []
    for elements in turns:
        texts = [e for e in elements if e.get("type") == "text"]
        tables = [dict(e) for e in elements if e.get("type") == "table"]
        figures = [dict(e) for e in elements
                   if e.get("type") not in ("text", "table")]
        raw = [{
            "text": e.get("content", ""),
            "bbox": tuple(e.get("bbox", (0, 0, 0, 0))),
            "confidence": e.get("confidence", 1.0),
            "uncertain": e.get("uncertain", False),
        } for e in texts]
        layout = analyze_layout(raw, confidence_threshold=cfg.low_confidence,
                                use_enhanced=False,
                                column_gap=cfg.column_gap)
        rebuilt.append(assemble_turn_elements(raw, tables, figures, layout))
    return rebuilt


DOCUMENT_VARIANTS: dict[str, Callable[..., list[list[Element]]]] = {
    "legacy": rebuild_turns_legacy,
}


def register_document_variant(name: str,
                              fn: Callable[..., list[list[Element]]]) -> None:
    DOCUMENT_VARIANTS[name] = fn


def get_document_variant(name: str) -> Callable[..., list[list[Element]]]:
    if name not in DOCUMENT_VARIANTS:
        raise KeyError(f"unknown document variant {name!r}; "
                       f"known: {sorted(DOCUMENT_VARIANTS)}")
    return DOCUMENT_VARIANTS[name]
