"""Semantic-role classification kernels.

Two independent classifiers exist in the reference and BOTH are kept
(SURVEY.md §2.3):

- ``classify_render_role``  ≙ SemanticAnnotator._classify_text_role
  (semantic_annotator.py:197-283) — the pattern-bank classifier used at
  render time. Needs page context (avg font size, page height).
- ``classify_layout_role_enhanced`` ≙ LayoutAnalyzer.classify_semantic_role_enhanced
  (layout_analyzer.py:153-323) — 5-signal weighted heading score, used at
  extraction time; results are carried on elements but the renderer
  re-classifies independently (reference behavior).
- ``classify_layout_role_legacy`` ≙ layout_analyzer.py:326-393.
- ``detect_columns`` / ``assign_columns`` / ``xy_cut`` / ``split_by_confidence``
  ≙ layout_analyzer.py:24-151, 396-426.
- ``analyze_layout`` ≙ LayoutAnalyzer.analyze_page_layout
  (layout_analyzer.py:428-493) — the per-turn orchestration.

Raw (pre-layout) elements use key ``text`` + ``bbox`` + ``confidence``
(structure_engine.py:377-381); processed elements use ``content``
(structure_engine.py:395-406).
"""

from __future__ import annotations

import re
from typing import Any

Element = dict[str, Any]

# --- pattern banks pinned to semantic_annotator.py:52-102 -------------------

_HEADING_BANK = [re.compile(p) for p in (
    r"^[A-Z][A-Z\s]{2,}$",
    r"^\d+\.\s+[A-Z]",
    r"^\d+\.\d+\s+[A-Z]",
    r"^Chapter\s+\d+",
    r"^Section\s+\d+",
    r"^Part\s+[IVX]+",
    r"^Abstract$",
    r"^Introduction$",
    r"^Conclusion$",
    r"^References$",
    r"^Bibliography$",
    r"^Acknowledgements?$",
    r"^Appendix\s*[A-Z]?$",
)]

_LIST_BANK = [(re.compile(p), t) for p, t in (
    (r"^\s*[\-\*\+]\s+", "unordered"),
    (r"^\s*\d+\.\s+", "ordered"),
    (r"^\s*\d+\)\s+", "ordered"),
    (r"^\s*[a-z]\)\s+", "ordered"),
    (r"^\s*[ivx]+\.\s+", "ordered"),
    (r"^\s*•\s+", "unordered"),
    (r"^\s*○\s+", "unordered"),
    (r"^\s*■\s+", "unordered"),
)]

_CAPTION_BANK = [re.compile(p) for p in (
    r"^[Tt][Aa][Bb][Ll][Ee]\s*\d+",
    r"^[Tt][Bb][Ll]\.?\s*\d+",
    r"^[Ff][Ii][Gg][Uu][Rr][Ee]\s*\d+",
    r"^[Ff][Ii][Gg]\.?\s*\d+",
    r"^[Cc][Hh][Aa][Rr][Tt]\s*\d+",
    r"^[Gg][Rr][Aa][Pp][Hh]\s*\d+",
    r"^[Dd][Ii][Aa][Gg][Rr][Aa][Mm]\s*\d+",
    r"^[Ii][Mm][Aa][Gg][Ee]\s*\d+",
)]

_FOOTNOTE_BANK = [re.compile(p) for p in (
    r"^\[\d+\]\s*",
    r"^\(\d+\)\s*",
    r"^\d+\.\s*(?=[A-Z])",
    r"^[*†‡§]\s*",
)]

_EQUATION_BANK = [re.compile(p) for p in (
    r"^\$\$.*\$\$$",
    r"^\\\[.*\\\]$",
    r"^\\begin\{equation\}",
    r"=\s*[a-zA-Z0-9\+\-\*\/\^\(\)]+\s*$",
)]

# Single-pass combined banks: one C-level match per bank instead of a
# Python loop; named groups preserve exactly which alternative matched first
# (left-to-right alternation == the original first-match-wins loop).
_HEADING_ONE = re.compile(
    "|".join(f"(?P<h{i}>{p.pattern})" for i, p in enumerate(_HEADING_BANK)))
_CHAPTER_IDX = next(i for i, p in enumerate(_HEADING_BANK)
                    if "chapter" in p.pattern.lower())
_LIST_ONE = re.compile(
    "|".join(f"(?P<l{i}>{p.pattern})" for i, (p, _) in enumerate(_LIST_BANK)))
_LIST_TYPES = [t for _, t in _LIST_BANK]
_CAPTION_ONE = re.compile("|".join(f"(?:{p.pattern})" for p in _CAPTION_BANK))
_FOOTNOTE_ONE = re.compile("|".join(f"(?:{p.pattern})" for p in _FOOTNOTE_BANK))
_EQUATION_ONE = re.compile("|".join(f"(?:{p.pattern})" for p in _EQUATION_BANK))

_NUM_DOT_DOT = re.compile(r"^\d+\.\d+")
_NUM_DOT = re.compile(r"^\d+\.")
_ANY_DIGITS = re.compile(r"\d+")
_LEAD_DIGITS = re.compile(r"^(\d+)")
_NUMBERED_ITEM = re.compile(r"^\d+[.):] ")

_CAPTION_KEYWORDS = ("figure", "fig.", "table", "chart", "diagram", "image")
_BULLET_CHARS_ENH = ("•", "-", "*", "◦", "○", "▪", "▫", "–", "—")
_BULLET_CHARS_LEGACY = ("•", "-", "*", "◦", "○", "▪", "▫")


class TurnContext:
    """Page-level context ≙ semantic_annotator.PageContext (lines 12-40)."""

    __slots__ = ("elements", "turn_num", "page_height", "avg_font_size",
                 "avg_text_length")

    def __init__(self, elements: list[Element], turn_num: int,
                 page_height: float = 800.0):
        self.elements = elements
        self.turn_num = turn_num
        self.page_height = page_height
        sizes = [e.get("font_size", 12) for e in elements
                 if e.get("type") == "text" and e.get("font_size")]
        self.avg_font_size = sum(sizes) / len(sizes) if sizes else 12.0
        lengths = [len(e.get("content", "")) for e in elements
                   if e.get("type") == "text"]
        self.avg_text_length = sum(lengths) / len(lengths) if lengths else 50.0


def classify_render_role(element: Element,
                         ctx: TurnContext) -> tuple[str, dict[str, Any]]:
    """Pattern-bank role classification used by the renderer.

    Ordered checks: font-size heading → heading patterns → short-capital
    top-of-page heading → list → caption → footnote patterns → equation →
    bottom-of-page footnote → paragraph (semantic_annotator.py:197-283).
    """
    content = element.get("content", "").strip()
    font_size = element.get("font_size")
    bbox = element.get("bbox")

    if font_size and font_size > ctx.avg_font_size * 1.3:
        ratio = font_size / ctx.avg_font_size
        level = 1 if ratio > 1.8 else 2 if ratio > 1.5 else 3 if ratio > 1.3 else 4
        return "heading", {"level": level}

    m = _HEADING_ONE.match(content)
    if m:
        if int(m.lastgroup[1:]) == _CHAPTER_IDX:
            level = 1
        elif _NUM_DOT_DOT.match(content):
            level = 3
        elif _NUM_DOT.match(content):
            level = 2
        else:
            level = 2
        return "heading", {"level": level}

    if len(content) < 60 and content and content[0].isupper():
        if content[-1] not in ".!?,;:":
            if bbox and ctx.page_height:
                if bbox[1] / ctx.page_height < 0.15:
                    return "heading", {"level": 2}

    m = _LIST_ONE.match(content)
    if m:
        return "list_item", {"type": _LIST_TYPES[int(m.lastgroup[1:])]}

    if _CAPTION_ONE.match(content):
        lower = content.lower()
        target = "table" if "table" in lower or "tbl" in lower else "figure"
        return "caption", {"for": target}

    if _FOOTNOTE_ONE.match(content):
        m = _ANY_DIGITS.search(content[:10])
        return "footnote", {"id": m.group() if m else "1"}

    if _EQUATION_ONE.match(content):
        return "equation", {"display": "block" if len(content) > 20 else "inline"}

    if bbox and ctx.page_height:
        if bbox[1] / ctx.page_height > 0.85 and len(content) < 200:
            if content and content[0].isdigit():
                m = _LEAD_DIGITS.match(content)
                return "footnote", {"id": m.group(1) if m else "1"}

    return "paragraph", {}


# --- layout analyzer family -------------------------------------------------

def split_by_confidence(elements: list[Element], threshold: float = 0.7
                        ) -> tuple[list[Element], list[Element]]:
    """Split into (high, low); low get ``uncertain=True``. String confidences
    are coerced, unparseable → 1.0 (layout_analyzer.py:396-426)."""
    high: list[Element] = []
    low: list[Element] = []
    for elem in elements:
        conf = elem.get("confidence", 1.0)
        if isinstance(conf, str):
            try:
                conf = float(conf)
            except (ValueError, TypeError):
                conf = 1.0
        if conf >= threshold:
            high.append(elem)
        else:
            elem["uncertain"] = True
            low.append(elem)
    return high, low


def detect_columns(elements: list[Element], gap: int = 50) -> list[dict[str, Any]]:
    """1-D gap clustering over distinct left edges (layout_analyzer.py:24-75)."""
    xs = sorted({e["bbox"][0] for e in elements if "bbox" in e})
    if not xs:
        return []
    cols: list[dict[str, Any]] = []
    cur = {"id": 0, "x_min": xs[0], "x_max": xs[0]}
    for x in xs[1:]:
        if x - cur["x_max"] > gap:
            cols.append(cur)
            cur = {"id": len(cols), "x_min": x, "x_max": x}
        else:
            cur["x_max"] = x
    cols.append(cur)
    return cols


def assign_columns(elements: list[Element], cols: list[dict[str, Any]]) -> list[Element]:
    """Center-in-range assignment, else nearest column (layout_analyzer.py:77-110)."""
    for elem in elements:
        if "bbox" not in elem:
            elem["column_id"] = 0
            continue
        cx = (elem["bbox"][0] + elem["bbox"][2]) / 2
        for col in cols:
            if col["x_min"] <= cx <= col["x_max"]:
                elem["column_id"] = col["id"]
                break
        else:
            dists = [abs(cx - (c["x_min"] + c["x_max"]) / 2) for c in cols]
            elem["column_id"] = cols[dists.index(min(dists))]["id"]
    return elements


def xy_cut(elements: list[Element]) -> list[Element]:
    """Columns left→right, rows top→bottom; assigns 1-based reading_order
    (layout_analyzer.py:112-151)."""
    if not elements:
        return []
    by_col: dict[int, list[Element]] = {}
    for elem in elements:
        by_col.setdefault(elem.get("column_id", 0), []).append(elem)
    ordered: list[Element] = []
    rank = 1
    for col_id in sorted(by_col):
        for elem in sorted(by_col[col_id],
                           key=lambda e: e["bbox"][1] if "bbox" in e else 0):
            elem["reading_order"] = rank
            ordered.append(elem)
            rank += 1
    return ordered


def _mean(values: list[float], default: float) -> float:
    return sum(values) / len(values) if values else default


class _PageAgg:
    """Geometry aggregates of one page's elements, computed ONCE per page
    (the classifier is called per element; recomputing these inside it made
    classification O(n²) per turn). Values are exactly the per-call
    quantities of layout_analyzer.py:153-323."""

    __slots__ = ("boxes", "avg_height", "spacing", "page_width", "page_left",
                 "page_height", "nonempty")

    def __init__(self, page_elements: list[Element]):
        self.nonempty = bool(page_elements)
        boxes = [e["bbox"] for e in page_elements
                 if "bbox" in e and len(e["bbox"]) >= 4]
        self.boxes = boxes
        self.avg_height = (_mean([b[3] - b[1] for b in boxes], 12.0)
                           if page_elements else 12.0)
        ys = sorted(b[1] for b in boxes)
        self.spacing = (_mean([ys[i + 1] - ys[i]
                               for i in range(len(ys) - 1)], 20.0)
                        if len(ys) > 1 else 20.0)
        self.page_width = max((b[2] for b in boxes), default=600)
        self.page_left = min((b[0] for b in boxes), default=0)
        self.page_height = max((b[3] for b in boxes), default=1000)


def classify_layout_role_enhanced(elem: Element, page_elements: list[Element],
                                  prev_elem: Element | None = None,
                                  next_elem: Element | None = None,
                                  agg: "_PageAgg | None" = None
                                  ) -> tuple[str, float]:
    """5-signal weighted heading score with early list-item rules
    (layout_analyzer.py:153-323). Weights 0.35/0.25/0.20/0.15/0.05 and all
    thresholds are pinned."""
    text = elem.get("text", "").strip()
    bbox = elem.get("bbox", (0, 0, 0, 0))
    if not text:
        return "paragraph", 0.5

    h = bbox[3] - bbox[1] if len(bbox) >= 4 else 0
    n = len(text)

    if agg is None:
        agg = _PageAgg(page_elements)
    avg_height = agg.avg_height
    spacing = agg.spacing

    # signal 1: font size
    if h > avg_height * 1.4:
        s_font = 1.0
    elif h > avg_height * 1.2:
        s_font = 0.7
    elif h > avg_height * 1.1:
        s_font = 0.4
    else:
        s_font = 0.0

    # signal 2: whitespace
    s_ws = 0.0
    if prev_elem and "bbox" in prev_elem:
        gap = bbox[1] - prev_elem["bbox"][3]
        if gap > spacing * 2:
            s_ws += 0.5
        elif gap > spacing * 1.5:
            s_ws += 0.3
    if next_elem and "bbox" in next_elem:
        if next_elem["bbox"][1] - bbox[3] > spacing * 1.5:
            s_ws += 0.3
    s_ws = min(s_ws, 1.0)

    # signal 3: capitalization
    words = text.split()
    if text.isupper() and n > 3:
        s_cap = 0.9
    elif len(words) > 1:
        caps = sum(1 for w in words if w and w[0].isupper())
        s_cap = 0.6 if caps / len(words) > 0.7 else 0.0
    elif words and words[0][0].isupper():
        s_cap = 0.2
    else:
        s_cap = 0.0

    # signal 4: length
    s_len = 0.8 if n < 50 else 0.5 if n < 100 else 0.2 if n < 200 else 0.0

    # early list-item rules (before heading scoring)
    if text.startswith(_BULLET_CHARS_ENH):
        return "list_item", 0.95
    if _NUMBERED_ITEM.match(text) and n < 80:
        return "list_item", 0.9
    if n > 2 and text[0].isalpha() and text[1:3] in (". ", ") ", ": ") and n < 80:
        return "list_item", 0.85

    # signal 5: indentation
    s_ind = 0.0
    if agg.nonempty:
        page_width = agg.page_width
        page_left = agg.page_left
        center = (bbox[0] + bbox[2]) / 2
        page_center = (page_left + page_width) / 2
        if abs(center - page_center) < page_width * 0.1:
            s_ind = 0.7
        elif bbox[0] <= page_left + 10:
            s_ind = 0.3

    score = s_font * 0.35 + s_ws * 0.25 + s_cap * 0.20 + s_len * 0.15 + s_ind * 0.05

    if text[:7].lower().startswith(_CAPTION_KEYWORDS):
        return "caption", 0.85

    if bbox[1] > agg.page_height * 0.85 and h < avg_height * 0.8:
        return "footnote", 0.8

    if score >= 0.45:
        return "heading", score
    return "paragraph", 1.0 - score


def classify_layout_role_legacy(elem: Element,
                                page_elements: list[Element],
                                agg: "_PageAgg | None" = None) -> str:
    """Font-size-only variant (layout_analyzer.py:326-393)."""
    text = elem.get("text", "").strip()
    bbox = elem.get("bbox", (0, 0, 0, 0))
    if not text:
        return "paragraph"

    h = bbox[3] - bbox[1] if len(bbox) >= 4 else 0
    if agg is None:
        agg = _PageAgg(page_elements)
    avg_height = agg.avg_height

    if len(text) < 100 and h > avg_height * 1.2:
        return "heading"
    if text.startswith(_BULLET_CHARS_LEGACY):
        return "list_item"
    if text and text[0].isdigit() and len(text) > 2 and text[1:3] in (". ", ") ", ": "):
        return "list_item"
    if text[:7].lower().startswith(_CAPTION_KEYWORDS):
        return "caption"
    if bbox[1] > agg.page_height * 0.85 and h < avg_height * 0.8:
        return "footnote"
    return "paragraph"


def analyze_layout(elements: list[Element], confidence_threshold: float = 0.7,
                   use_enhanced: bool = True, column_gap: int = 50
                   ) -> dict[str, Any]:
    """Per-turn layout orchestration: confidence split → columns → xy-cut →
    role classification → low-confidence tail (layout_analyzer.py:428-493)."""
    if not elements:
        return {"elements": [], "columns": [], "column_count": 0,
                "reading_order_applied": False}

    high, low = split_by_confidence(elements, confidence_threshold)
    cols = detect_columns(high, gap=column_gap)
    high = assign_columns(high, cols)
    ordered = xy_cut(high)

    # geometry aggregates are loop-invariant (roles don't change bboxes)
    agg = _PageAgg(ordered)
    if use_enhanced:
        for i, elem in enumerate(ordered):
            prev_e = ordered[i - 1] if i > 0 else None
            next_e = ordered[i + 1] if i < len(ordered) - 1 else None
            role, conf = classify_layout_role_enhanced(elem, ordered, prev_e,
                                                       next_e, agg=agg)
            elem["semantic_role"] = role
            elem["role_confidence"] = conf
    else:
        for elem in ordered:
            elem["semantic_role"] = classify_layout_role_legacy(elem, ordered,
                                                                agg=agg)

    for elem in low:
        elem["reading_order"] = len(ordered) + 1
        elem["semantic_role"] = "paragraph"
        ordered.append(elem)

    return {
        "elements": ordered,
        "columns": cols,
        "column_count": len(cols),
        "reading_order_applied": True,
        "high_confidence_count": len(high),
        "low_confidence_count": len(low),
        "enhanced_classification": use_enhanced,
    }


def body_font_size_mode(blocks: list[Element]) -> float:
    """Most common span font size → body-size estimate for heading
    detection (G6; fast_converter.py:6-15 semantics: round(size, 1),
    Counter mode, default 11 when no spans)."""
    from collections import Counter
    sizes = []
    for b in blocks:
        if "lines" not in b:
            continue
        for ln in b["lines"]:
            for s in ln["spans"]:
                sizes.append(round(s["size"], 1))
    if not sizes:
        return 11
    return Counter(sizes).most_common(1)[0][0]
