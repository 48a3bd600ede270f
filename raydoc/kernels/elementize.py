"""Turn payload → raw layout elements.

The rebuild's analog of the reference's OCR-line collection
(structure_engine.py:368-381): each non-blank line of a turn's (already
boilerplate-stripped) text becomes a raw element ``{text, bbox, confidence}``
with deterministic synthetic geometry on an 800-pt page, so every
geometry-dependent operator downstream (top/bottom noise zones, footnote
bottom band, caption |Δy| proximity, column clustering, xy-cut) runs exactly
as it does on OCR output.

Geometry contract (deterministic, seedless):
- lines are laid out top-down starting at y=40 with 30-pt pitch; when a turn
  has more lines than fit, the pitch shrinks so the last line sits at y=760
  (bottom 5% of the 800-pt page → the reference's bottom-zone rules can
  fire for long turns, exactly like real page bottoms)
- bbox = (50, y, 50 + 8·len(line) capped at 560, y + 20)
- a ``{{conf=0.xx}}`` line prefix (our synthetic-corpus contract for the
  reference's OCR confidences) sets the element confidence and is stripped
- runs of ``|``-prefixed lines collapse into one table element
  (≙ GMFT table output, structure_engine.py:412-429)
- ``![alt](…)`` image lines become figure elements
  (≙ detect_image_regions output, structure_engine.py:243-249)
"""

from __future__ import annotations

import re
from typing import Any

Element = dict[str, Any]

_CONF_PREFIX = re.compile(r"^\{\{conf=([0-9.]+)\}\}\s?")
_IMAGE_LINE = re.compile(r"^!\[[^\]]*\]\([^)]*\)\s*$")

PAGE_HEIGHT = 800.0
TOP_MARGIN = 40.0
LINE_PITCH = 30.0
LAST_LINE_Y = 760.0
LINE_HEIGHT = 20.0
LEFT_MARGIN = 50.0
CHAR_WIDTH = 8.0
MAX_RIGHT = 560.0


def _line_units(text: str) -> list[tuple[str, float, str]]:
    """Split into layout units: ('text', conf, line) / ('table', 1.0, md) /
    ('figure', 1.0, alt-line). Consecutive table rows form one unit."""
    units: list[tuple[str, float, str]] = []
    table_buf: list[str] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            if table_buf:
                units.append(("table", 1.0, "\n".join(table_buf)))
                table_buf = []
            continue
        if line.startswith("|") and line.endswith("|") and line.count("|") >= 2:
            table_buf.append(line)
            continue
        if table_buf:
            units.append(("table", 1.0, "\n".join(table_buf)))
            table_buf = []
        if _IMAGE_LINE.match(line):
            units.append(("figure", 1.0, line))
            continue
        conf = 1.0
        m = _CONF_PREFIX.match(line)
        if m:
            try:
                conf = float(m.group(1))
            except ValueError:
                conf = 1.0
            line = line[m.end():]
            if not line:
                continue
        units.append(("text", conf, line))
    if table_buf:
        units.append(("table", 1.0, "\n".join(table_buf)))
    return units


def elementize(text: str) -> tuple[list[Element], list[Element], list[Element]]:
    """→ (raw_text_elements, table_elements, figure_elements).

    Raw text elements carry ``text``/``bbox``/``confidence`` for
    ``analyze_layout``; tables and figures are already in processed form
    (they bypass layout analysis, mirroring structure_engine.py:384,412-429).
    """
    units = _line_units(text)
    n = len(units)
    if n == 0:
        return [], [], []
    if n <= 1 or (n - 1) * LINE_PITCH <= LAST_LINE_Y - TOP_MARGIN:
        pitch = LINE_PITCH
    else:
        pitch = (LAST_LINE_Y - TOP_MARGIN) / (n - 1)

    raw: list[Element] = []
    tables: list[Element] = []
    figures: list[Element] = []
    for i, (kind, conf, content) in enumerate(units):
        y = TOP_MARGIN + i * pitch
        if kind == "text":
            x1 = min(LEFT_MARGIN + CHAR_WIDTH * len(content), MAX_RIGHT)
            raw.append({
                "text": content,
                "bbox": (LEFT_MARGIN, y, x1, y + LINE_HEIGHT),
                "confidence": conf,
            })
        elif kind == "table":
            tables.append({"y": y, "type": "table", "content": content})
        else:
            width = int(MAX_RIGHT - LEFT_MARGIN)
            figures.append({
                "bbox": (LEFT_MARGIN, y, MAX_RIGHT, y + 100.0),
                "y": y,
                "type": "figure",
                "content": f"[Figure: {width}x100px]",
                "semantic_role": "figure",
            })
    return raw, tables, figures


def assemble_turn_elements(raw: list[Element], tables: list[Element],
                           figures: list[Element],
                           layout_result: dict[str, Any]) -> list[Element]:
    """Processed per-turn element list in the reference's handoff shape
    (structure_engine.py:395-440): layout'd text elements converted to
    content form, then figures, then tables, then a stable y-sort."""
    page_elements: list[Element] = []
    for elem in layout_result["elements"]:
        page_elements.append({
            "y": elem["bbox"][1],
            "type": "text",
            "content": elem["text"],
            "reading_order": elem.get("reading_order", 0),
            "semantic_role": elem.get("semantic_role", "paragraph"),
            "role_confidence": elem.get("role_confidence", 1.0),
            "confidence": elem.get("confidence", 1.0),
            "uncertain": elem.get("uncertain", False),
            "bbox": elem.get("bbox", (0, 0, 0, 0)),
        })
    page_elements.extend(figures)
    page_elements.extend(tables)
    page_elements.sort(key=lambda e: e["y"])
    return page_elements
