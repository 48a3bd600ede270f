"""Noise tagging kernels (Tag-Don't-Remove).

Semantics-equal reimplementation of the reference's adaptive noise filter
(noise_filter.py:16-288; SURVEY.md §2.2 M7-M10, §2.6 G2):

- per-line predicates: page number, watermark, artifact (incl. garble)
- cross-turn repeating header/footer detection with digit masking
- single-turn fallback when a conversation has < 3 turns
- classification precedence: page_number > header/footer > watermark >
  artifact  (noise_filter.py:117-128); single-turn drops the header/footer
  test (noise_filter.py:272-277)

Elements are dicts with the reference's processed-element keys
(structure_engine.py:395-406): type/content/y/bbox/confidence/... .
Mutates elements in place (adds ``noise_type``) exactly like the reference's
tag mode; in remove mode returns filtered lists.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache
from typing import Any

from raydoc.kernels.textnorm import mask_digits

Element = dict[str, Any]

# Pattern banks pinned to noise_filter.py:28-60 (the constants are semantics).
_PAGE_NUM = [re.compile(p, re.IGNORECASE) for p in (
    r"^Page\s*\d+\s*(?:of\s*\d+)?$",
    r"^\d+\s*/\s*\d+$",
    r"^-\s*\d+\s*-$",
    r"^\[\s*\d+\s*\]$",
    r"^\d+$",
    r"^(?:p|pg|page)\.?\s*\d+$",
)]

_WATERMARK = [re.compile(p) for p in (
    r"(?i)^confidential\s*-?\s*(?:internal|external)?$",
    r"(?i)^draft\s*(?:copy)?$",
    r"(?i)^do\s+not\s+(?:copy|distribute)$",
    r"(?i)^for\s+internal\s+use\s+only$",
    r"(?i)^proprietary\s+(?:and\s+)?confidential$",
    r"(?i)^copy(?:right)?\s*©?\s*\d{4}",
    r"(?i)^all\s+rights\s+reserved\.?$",
    r"(?i)^www\.[a-zA-Z0-9]+\.[a-z]{2,}$",
    r"(?i)^sample\s*$",
    r"(?i)^preview\s*$",
    r"(?i)^watermark\s*$",
)]

_ARTIFACT = [re.compile(p) for p in (
    r"^[|_\-=+]{3,}$",
    r"^[\s\.\,\!\?\;\:]+$",
    r"^[^\w\s]{2,}$",
    r"^\s+$",
    r"^[a-zA-Z]{1,2}$",
    r"^[0-9]{1,2}$",
)]

_CONSONANT_RUN = re.compile(r"[bcdfghjklmnpqrstvwxz]{5,}", re.IGNORECASE)
_CHAR_REPEAT = re.compile(r"(.)\1{4,}")

# Single-alternation versions of the banks: one C-level match instead of a
# Python any() loop over 6-11 compiled patterns. Equivalent because every
# member pattern is ^-anchored and the IGNORECASE flag applies bank-wide
# (each watermark pattern carries its own (?i)).
_PAGE_NUM_ONE = re.compile(
    "|".join(f"(?:{p.pattern})" for p in _PAGE_NUM), re.IGNORECASE)
# every watermark pattern carries its own (?i); hoist it to a bank-wide flag
# (inline global flags are illegal mid-alternation in Python ≥3.11)
_WATERMARK_ONE = re.compile(
    "|".join(f"(?:{p.pattern.removeprefix('(?i)')})" for p in _WATERMARK),
    re.IGNORECASE)
_ARTIFACT_ONE = re.compile("|".join(f"(?:{p.pattern})" for p in _ARTIFACT))

# chars that are neither alnum nor whitespace: [^\w\s] plus underscore
# (str.isalnum("_") is False but "_" is \w)
_SPECIAL = re.compile(r"[^\w\s]|_")


# Line-level predicates are pure functions of the string, and boilerplate
# lines repeat heavily across documents (~33% dupes even in the synthetic
# corpus; more in real crawls) — memoize per worker.
@lru_cache(maxsize=65536)
def is_page_number(line: str) -> bool:
    return _PAGE_NUM_ONE.match(line.strip()) is not None


@lru_cache(maxsize=65536)
def is_watermark(line: str) -> bool:
    return _WATERMARK_ONE.match(line.strip()) is not None


@lru_cache(maxsize=65536)
def is_garbled(line: str) -> bool:
    if len(line) < 3:
        return False
    if len(_SPECIAL.findall(line)) / len(line) > 0.5:
        return True
    if _CONSONANT_RUN.search(line):
        return True
    return bool(_CHAR_REPEAT.search(line))


@lru_cache(maxsize=65536)
def _is_artifact_line(line: str) -> bool:
    """Confidence-independent part of the artifact predicate."""
    if _ARTIFACT_ONE.match(line):
        return True
    return is_garbled(line)


def is_artifact(line: str, confidence: float = 1.0,
                artifact_confidence: float = 0.3) -> bool:
    line = line.strip()
    if confidence < artifact_confidence and len(line) < 10:
        return True
    return _is_artifact_line(line)


def _elem_y(elem: Element) -> float:
    if "y" in elem:
        return elem["y"]
    bbox = elem.get("bbox")
    return bbox[1] if bbox else 0


def detect_repeaters(turns: list[list[Element]],
                     threshold: float = 0.5,
                     zone: float = 0.33,
                     max_len: int = 100) -> dict[str, set[str]]:
    """Find digit-masked lines repeating in the top/bottom band across turns.

    Per turn: sort text elements by y; the top-3 inside the top ``zone`` band
    are header candidates, bottom-3 inside the bottom band footer candidates;
    a candidate repeating in >= threshold·n_turns turns is a repeater
    (noise_filter.py:143-190).
    """
    n_turns = len(turns)
    top: Counter[str] = Counter()
    bottom: Counter[str] = Counter()

    for elements in turns:
        texts = [e for e in elements if e.get("type") == "text"]
        if not texts:
            continue
        texts.sort(key=lambda e: e.get("y", e.get("bbox", [0, 0])[1] if e.get("bbox") else 0))
        max_y = texts[-1].get("y", 1000)
        height = max(max_y, 100)
        for e in texts[:3]:
            if e.get("y", 0) < height * zone:
                key = mask_digits(e.get("content", ""))
                if key and len(key) < max_len:
                    top[key] += 1
        for e in texts[-3:]:
            if e.get("y", 0) > height * (1 - zone):
                key = mask_digits(e.get("content", ""))
                if key and len(key) < max_len:
                    bottom[key] += 1

    need = n_turns * threshold
    return {
        "headers": {t for t, c in top.items() if c >= need},
        "footers": {t for t, c in bottom.items() if c >= need},
    }


def tag_noise(turns: list[list[Element]],
              tag_mode: bool = True,
              threshold: float = 0.5,
              min_turns: int = 3,
              artifact_confidence: float = 0.3) -> tuple[list[list[Element]], dict[str, list[str]]]:
    """Tag (or drop) noise elements across a conversation's turns.

    Returns (turns, report_details) where report_details mirrors the
    reference's ``detected_noise`` dict (noise_filter.py:79-85).
    """
    detail: dict[str, list[str]] = {
        "headers": [], "footers": [], "watermarks": [],
        "page_numbers": [], "artifacts": [],
    }

    if len(turns) < min_turns:
        out = [_tag_single(elements, tag_mode, detail, artifact_confidence)
               for elements in turns]
        return out, detail

    repeaters = detect_repeaters(turns, threshold=threshold)
    detail["headers"] = list(repeaters["headers"])
    detail["footers"] = list(repeaters["footers"])

    # mask_digits per line is only needed for repeater membership; skip the
    # regex sub entirely when this conversation has no repeaters (common).
    have_repeaters = bool(repeaters["headers"] or repeaters["footers"])

    out_turns: list[list[Element]] = []
    for elements in turns:
        kept: list[Element] = []
        for elem in elements:
            if elem.get("type") == "text":
                line = elem.get("content", "").strip()
                masked = mask_digits(line) if have_repeaters else ""
                kind = None
                if is_page_number(line):
                    kind = "page_number"
                    detail["page_numbers"].append(line)
                elif masked in repeaters["headers"] or masked in repeaters["footers"]:
                    kind = "header" if masked in repeaters["headers"] else "footer"
                    detail["headers" if kind == "header" else "footers"].append(line)
                elif is_watermark(line):
                    kind = "watermark"
                    detail["watermarks"].append(line)
                elif is_artifact(line, elem.get("confidence", 1.0), artifact_confidence):
                    kind = "artifact"
                    detail["artifacts"].append(line)
                if kind:
                    if tag_mode:
                        elem["noise_type"] = kind
                    else:
                        continue
            kept.append(elem)
        out_turns.append(kept)
    return out_turns, detail


def _tag_single(elements: list[Element], tag_mode: bool,
                detail: dict[str, list[str]],
                artifact_confidence: float) -> list[Element]:
    """Single-turn tagging: no cross-turn repeaters (noise_filter.py:264-288)."""
    kept: list[Element] = []
    for elem in elements:
        if elem.get("type") == "text":
            line = elem.get("content", "").strip()
            kind = None
            if is_page_number(line):
                kind = "page_number"
            elif is_watermark(line):
                kind = "watermark"
            elif is_artifact(line, elem.get("confidence", 1.0), artifact_confidence):
                kind = "artifact"
            if kind:
                if tag_mode:
                    elem["noise_type"] = kind
                else:
                    continue
        kept.append(elem)
    return kept


def noise_report(detail: dict[str, list[str]]) -> dict[str, Any]:
    """Summary counts shaped like noise_filter.py:290-299."""
    return {
        "headers_detected": len(detail["headers"]),
        "footers_detected": len(detail["footers"]),
        "watermarks_removed": len(detail["watermarks"]),
        "page_numbers_removed": len(detail["page_numbers"]),
        "artifacts_removed": len(detail["artifacts"]),
        "details": detail,
    }
