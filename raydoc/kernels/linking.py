"""Caption→target and footnote-ref linking kernels.

Semantics-equal reimplementation of caption_extractor.py (SURVEY.md §2.5
J1/J3):

- Captions: per turn, parse ``Table N …`` / ``Figure N …`` text lines, link
  each to the nearest same-turn table/figure by |Δy| < 100, copy caption
  onto the target, then REMOVE all parsed caption text elements — even
  unlinked ones (caption_extractor.py:106; the tag-don't-remove asymmetry
  noted in SURVEY.md §7.4.6).
- Footnotes: per turn, bottom-zone (y/height ≥ 0.8) lines matching the four
  content patterns get ``semantic_role='footnote'`` + ``footnote_id``
  (caption_extractor.py:182-269). The 4th pattern's id-extraction quirk
  (superscript pattern's group(1) is the *text*) is reproduced.
"""

from __future__ import annotations

import re
from typing import Any

Element = dict[str, Any]

_TABLE_CAPTIONS = [re.compile(p) for p in (
    r"^[Tt][Aa][Bb][Ll][Ee]\s*(\d+)[\s:\.]*(.*)$",
    r"^[Tt][Bb][Ll]\.?\s*(\d+)[\s:\.]*(.*)$",
)]

_FIGURE_CAPTIONS = [re.compile(p) for p in (
    r"^[Ff][Ii][Gg][Uu][Rr][Ee]\s*(\d+)[\s:\.]*(.*)$",
    r"^[Ff][Ii][Gg]\.?\s*(\d+)[\s:\.]*(.*)$",
    r"^[Ii][Mm][Aa][Gg][Ee]\s*(\d+)[\s:\.]*(.*)$",
    r"^[Cc][Hh][Aa][Rr][Tt]\s*(\d+)[\s:\.]*(.*)$",
    r"^[Dd][Ii][Aa][Gg][Rr][Aa][Mm]\s*(\d+)[\s:\.]*(.*)$",
    r"^[Gg][Rr][Aa][Pp][Hh]\s*(\d+)[\s:\.]*(.*)$",
)]

_FOOTNOTE_CONTENT = [
    r"^\[(\d+)\]\s*(.+)$",
    r"^\((\d+)\)\s*(.+)$",
    r"^(\d+)\.\s+(.+)$",
    r"^[¹²³⁴⁵⁶⁷⁸⁹⁰]\s*(.+)$",
]

_FOOTNOTE_ID = re.compile(r"^\[?(\d+)\]?")

PROXIMITY = 100.0


def _y_of(elem: Element) -> float:
    if "y" in elem:
        return elem["y"]
    bbox = elem.get("bbox")
    return bbox[1] if bbox else 0


def parse_caption(line: str) -> dict[str, Any] | None:
    """Parse ``Table/Figure N: text`` → {type, number, text} or None."""
    for pat in _TABLE_CAPTIONS:
        m = pat.match(line)
        if m:
            return {"type": "table", "number": int(m.group(1)),
                    "text": m.group(2).strip() if m.group(2) else ""}
    for pat in _FIGURE_CAPTIONS:
        m = pat.match(line)
        if m:
            return {"type": "figure", "number": int(m.group(1)),
                    "text": m.group(2).strip() if m.group(2) else ""}
    return None


def link_captions(turns: list[list[Element]]
                  ) -> tuple[list[list[Element]], list[dict[str, Any]]]:
    """Link and strip caption elements per turn; returns (turns, extracted)."""
    extracted: list[dict[str, Any]] = []
    out: list[list[Element]] = []
    for turn_num, elements in enumerate(turns, 1):
        out.append(_link_turn(elements, turn_num, extracted))
    return out, extracted


def _link_turn(elements: list[Element], turn_num: int,
               extracted: list[dict[str, Any]]) -> list[Element]:
    tables = [(i, e) for i, e in enumerate(elements) if e.get("type") == "table"]
    figures = [(i, e) for i, e in enumerate(elements) if e.get("type") == "figure"]

    caption_idx: set[int] = set()
    found: list[tuple[Element, dict[str, Any]]] = []
    for i, elem in enumerate(elements):
        if elem.get("type") != "text":
            continue
        info = parse_caption(elem.get("content", "").strip())
        if info:
            found.append((elem, info))
            caption_idx.add(i)

    for elem, info in found:
        pool = tables if info["type"] == "table" else figures
        target = _nearest(elem, pool)
        if target is not None:
            _, target_elem = target
            target_elem["caption"] = info["text"]
            target_elem["caption_number"] = info["number"]
            extracted.append({"page": turn_num, "type": info["type"],
                              "number": info["number"], "text": info["text"]})

    return [e for i, e in enumerate(elements)
            if i not in caption_idx or e.get("type") != "text"]


def _nearest(caption: Element, candidates: list[tuple[int, Element]]
             ) -> tuple[int, Element] | None:
    if not candidates:
        return None
    cy = _y_of(caption)
    best = None
    best_dist = float("inf")
    for idx, target in candidates:
        dist = abs(_y_of(target) - cy)
        if dist < best_dist and dist < PROXIMITY:
            best_dist = dist
            best = (idx, target)
    return best


def link_footnotes(turns: list[list[Element]],
                   page_heights: list[float] | None = None,
                   bottom_threshold: float = 0.8
                   ) -> tuple[list[list[Element]], list[dict[str, Any]]]:
    """Tag bottom-zone footnote-content lines per turn; returns (turns, notes)."""
    notes: list[dict[str, Any]] = []
    out: list[list[Element]] = []
    for turn_num, elements in enumerate(turns, 1):
        height = page_heights[turn_num - 1] if page_heights else 800
        out.append(_link_turn_footnotes(elements, turn_num, height,
                                        bottom_threshold, notes))
    return out, notes


def _link_turn_footnotes(elements: list[Element], turn_num: int,
                         height: float, bottom: float,
                         notes: list[dict[str, Any]]) -> list[Element]:
    hit: set[int] = set()
    for i, elem in enumerate(elements):
        if elem.get("type") != "text":
            continue
        if _y_of(elem) / height < bottom:
            continue
        content = elem.get("content", "").strip()
        for pat in _FOOTNOTE_CONTENT:
            m = re.match(pat, content)
            if m:
                fn_id = m.group(1) if m.lastindex >= 1 else "1"
                fn_text = m.group(2) if m.lastindex >= 2 else content
                hit.add(i)
                notes.append({"page": turn_num, "id": fn_id, "content": fn_text})
                break

    for i in hit:
        elem = elements[i]
        elem["semantic_role"] = "footnote"
        m = _FOOTNOTE_ID.match(elem.get("content", "").strip())
        if m:
            elem["footnote_id"] = m.group(1)
    return elements
