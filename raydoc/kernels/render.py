"""Markdown renderer emitting the reference's annotation grammar.

Semantics-equal reimplementation of SemanticAnnotator's render path
(semantic_annotator.py:112-371; grammar documented at SURVEY.md §2.9 /
structure_engine.py:689-765):

  <!-- page:N -->            per turn
  <!-- reading-order:N -->   when present on the element
  <!-- role:ROLE [k:v…] -->  per element (noise_type overrides classification)
  <!-- confidence:0.XX -->   when confidence < 0.7
  [uncertain: …] / [low-confidence: …] wrappers at <0.7 / <0.5
  heading level from attributes; equations as $..$/$$..$$ blocks;
  tables/figures with caption:"…" attributes and **bold**/*italic* captions.
"""

from __future__ import annotations

from typing import Any

from raydoc.kernels.roles import TurnContext, classify_render_role

Element = dict[str, Any]


def render_text_element(element: Element, ctx: TurnContext) -> str:
    content = element.get("content", "").strip()
    confidence = element.get("confidence", 1.0)
    if isinstance(confidence, str):
        try:
            confidence = float(confidence)
        except (ValueError, TypeError):
            confidence = 1.0
    reading_order = element.get("reading_order")

    if not content:
        return ""

    noise_type = element.get("noise_type")
    if noise_type:
        role, attributes = noise_type, {}
    else:
        role, attributes = classify_render_role(element, ctx)

    out = ""
    if reading_order is not None:
        out += f"<!-- reading-order:{reading_order} -->\n"
    out += f"<!-- role:{role}"
    if attributes:
        out += " " + " ".join(f"{k}:{v}" for k, v in attributes.items())
    out += " -->\n"
    if confidence < 0.7:
        out += f"<!-- confidence:{confidence:.2f} -->\n"

    if role == "heading":
        level = attributes.get("level", 2)
        body = f"{'#' * level} {content}"
    elif role == "equation":
        if attributes.get("display", "block") == "block":
            body = f"$$\n{content}\n$$"
        else:
            body = f"${content}$"
    elif confidence < 0.5:
        body = f"[low-confidence: {content}]"
    elif confidence < 0.7:
        body = f"[uncertain: {content}]"
    else:
        body = content

    return out + body + "\n"


def render_table_element(element: Element) -> str:
    content = element.get("content", "")
    caption = element.get("caption", "")
    reading_order = element.get("reading_order")

    out = ""
    if reading_order is not None:
        out += f"<!-- reading-order:{reading_order} -->\n"
    out += "<!-- role:table"
    if caption:
        out += f' caption:"{caption.replace(chr(34), chr(92) + chr(34))}"'
    out += " -->\n"
    if caption:
        out += f"\n**{caption}**\n\n"
    out += content + "\n"
    return out


def render_figure_element(element: Element) -> str:
    caption = element.get("caption", "")
    alt_text = element.get("alt", element.get("description", "Figure"))
    reading_order = element.get("reading_order")

    out = ""
    if reading_order is not None:
        out += f"<!-- reading-order:{reading_order} -->\n"
    out += "<!-- role:figure"
    if caption:
        out += f' caption:"{caption.replace(chr(34), chr(92) + chr(34))}"'
    out += " -->\n"
    out += f"![{alt_text}](image)\n"
    if caption:
        out += f"\n*{caption}*\n"
    return out


def render_element(element: Element, ctx: TurnContext) -> str:
    kind = element.get("type", "text")
    if kind == "table":
        return render_table_element(element)
    if kind == "figure":
        return render_figure_element(element)
    return render_text_element(element, ctx)


def render_turn(elements: list[Element], turn_num: int,
                page_height: float = 800.0) -> str:
    """Annotated markdown for one turn (semantic_annotator.py:343-371):
    page marker, stable (reading_order, y) ordering, blank line between
    rendered elements."""
    ctx = TurnContext(elements, turn_num, page_height)
    out = f"\n<!-- page:{turn_num} -->\n\n"
    ordered = sorted(elements,
                     key=lambda e: (e.get("reading_order", 0), e.get("y", 0)))
    for elem in ordered:
        rendered = render_element(elem, ctx)
        if rendered:
            out += rendered + "\n"
    return out


def render_turn_fallback(elements: list[Element], turn_num: int) -> str:
    """Annotation-free render (enhanced_pipeline.py:206-216)."""
    out = f"\n<!-- page:{turn_num} -->\n\n"
    for elem in elements:
        if elem.get("type") in ("text", "table"):
            out += elem.get("content", "") + "\n\n"
    return out


def detect_document_structure(turns: list[list[Element]],
                              ) -> dict[str, Any]:
    """Cross-turn structure flags (semantic_annotator.py:373-431)."""
    structure: dict[str, Any] = {
        "has_toc": False, "heading_hierarchy": [], "section_count": 0,
        "has_footnotes": False, "has_equations": False, "has_tables": False,
        "has_figures": False,
    }
    headings: list[dict[str, Any]] = []
    for turn_num, elements in enumerate(turns, 1):
        ctx = TurnContext(elements, turn_num)
        for elem in elements:
            kind = elem.get("type")
            if kind == "table":
                structure["has_tables"] = True
            elif kind == "figure":
                structure["has_figures"] = True
            elif kind == "text":
                role, attrs = classify_render_role(elem, ctx)
                if role == "heading":
                    headings.append({"text": elem.get("content", "")[:50],
                                     "level": attrs.get("level", 2),
                                     "page": turn_num})
                elif role == "footnote":
                    structure["has_footnotes"] = True
                elif role == "equation":
                    structure["has_equations"] = True
    structure["heading_hierarchy"] = headings
    structure["section_count"] = sum(1 for h in headings if h["level"] <= 2)
    if len([h for h in headings if h["page"] <= 2]) > 5:
        structure["has_toc"] = True
    return structure
