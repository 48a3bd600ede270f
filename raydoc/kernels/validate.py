"""Output validation + quality-gate kernels.

Semantics-equal reimplementation of validation_framework.py (SURVEY.md §2.2
M15, §2.6 G10): schema / content / hallucination / format checks producing
issue rows, penalty scoring 1.0 − 0.15·err − 0.05·warn − 0.01·info, and the
quality gate (thresholds 0.6 / 0 hallucinations / 2 errors / 5 content
lines) with fallback-action suggestion.
"""

from __future__ import annotations

import re
from typing import Any

_HALLUCINATION = [re.compile(p) for p in (
    r"(?i)based on (the|this) (image|document|page)",
    r"(?i)as (shown|seen|visible) in",
    r"(?i)it (appears|seems) that",
    r"(?i)I can (see|observe) that",
    r"(?i)the (image|document) shows",
    r"(?i)looking at (the|this)",
    r"(?i)from what I can (see|tell)",
    r"(?i)this (appears|seems) to be",
)]

_PAGE_MARKER = re.compile(r"<!--\s*page:\s*(\d+)\s*-->")
_ROLE_ANN = re.compile(r"<!--\s*role:\w+")
_HEADING_LINE = re.compile(r"^#{1,6}\s+", re.MULTILINE)
_TABLE_LINE = re.compile(r"^\|", re.MULTILINE)
_HEADING_LEVELS = re.compile(r"^(#{1,6})\s+", re.MULTILINE)
_UNCERTAIN = re.compile(r"\[uncertain:")
_LOW_CONF = re.compile(r"\[low-confidence:")


def _issue(severity: str, category: str, message: str,
           line: int | None = None, context: str | None = None) -> dict[str, Any]:
    return {"severity": severity, "category": category, "message": message,
            "line": line, "context": context}


def _check_schema(text: str, issues: list[dict[str, Any]]) -> None:
    if not text.strip().startswith("---"):
        issues.append(_issue("error", "schema", "Missing YAML frontmatter"))
    else:
        fm_end = text.find("---", 3)
        if fm_end == -1:
            issues.append(_issue("error", "schema",
                                 "Incomplete YAML frontmatter (missing closing ---)"))
        else:
            fm = text[3:fm_end]
            if "document:" not in fm:
                issues.append(_issue("error", "schema",
                                     "Missing document section in frontmatter"))
            if "source_file:" not in fm:
                issues.append(_issue("warning", "schema",
                                     "Missing source_file in frontmatter"))
            if "quality:" not in fm:
                issues.append(_issue("warning", "schema",
                                     "Missing quality section in frontmatter"))

    markers = _PAGE_MARKER.findall(text)
    if not markers:
        issues.append(_issue("warning", "schema", "No page markers found"))
    else:
        pages = [int(p) for p in markers]
        missing = set(range(1, max(pages) + 1)) - set(pages)
        if missing:
            issues.append(_issue("warning", "schema",
                                 f"Missing page markers: {sorted(missing)}"))

    n_roles = len(_ROLE_ANN.findall(text))
    n_headings = len(_HEADING_LINE.findall(text))
    n_tables = len(_TABLE_LINE.findall(text)) // 2
    if n_roles < (n_headings + n_tables) * 0.5:
        issues.append(_issue(
            "warning", "schema",
            f"Low annotation coverage: {n_roles} annotations for "
            f"{n_headings} headings and {n_tables} tables"))


def _check_content(text: str, issues: list[dict[str, Any]]) -> None:
    content_start = 0
    if text.startswith("---"):
        fm_end = text.find("---", 3)
        if fm_end > 0:
            content_start = text.find("\n", fm_end) + 1
    content_lines = text[content_start:].split("\n")
    non_empty = [l for l in content_lines
                 if l.strip() and not l.strip().startswith("<!--")]
    if len(non_empty) < 3:
        issues.append(_issue("error", "content",
                             "Document appears to have very little content"))

    uncertain = len(_UNCERTAIN.findall(text))
    low_conf = len(_LOW_CONF.findall(text))
    if uncertain > len(non_empty) * 0.3:
        issues.append(_issue("warning", "content",
                             f"High uncertainty: {uncertain} uncertain regions"))
    if low_conf > len(non_empty) * 0.1:
        issues.append(_issue("warning", "content",
                             f"Many low-confidence regions: {low_conf}"))

    levels = _HEADING_LEVELS.findall(text)
    if levels:
        first = len(levels[0])
        if first != 1:
            issues.append(_issue("info", "content",
                                 f"Document does not start with H1 (starts with H{first})"))


_HALLUCINATION_ONE = re.compile(
    "|".join(f"(?:{p.pattern.removeprefix('(?i)')})" for p in _HALLUCINATION),
    re.IGNORECASE)

# distinctive literal substrings, one per pattern: a text matching any
# hallucination regex necessarily contains one of these (lowercased) —
# memchr-speed pre-filter before the expensive alternation scan
_HALLUCINATION_LITERALS = ("based on", "as shown", "as seen", "as visible",
                           "it appears", "it seems", "i can see",
                           "i can observe", "shows",
                           "looking at", "from what i can", "this appears",
                           "this seems")
# NOTE: pattern 5 is "the (image|document) shows" — its literal is "shows",
# not "image"/"document" (those appear in EVERY doc's frontmatter, which
# made the pre-filter a no-op and ran the full alternation scan per doc).


def _check_hallucinations(text: str, issues: list[dict[str, Any]]) -> None:
    # Cheap whole-text pre-scan: most documents contain no hallucination
    # phrase at all, so skip the regex scans entirely in that case.
    lo = text.lower()
    if not any(k in lo for k in _HALLUCINATION_LITERALS):
        return
    if not _HALLUCINATION_ONE.search(text):
        return
    for i, line in enumerate(text.split("\n"), 1):
        if _HALLUCINATION_ONE.search(line):
            issues.append(_issue("error", "hallucination",
                                 "Potential hallucination detected",
                                 line=i, context=line[:80]))


def _check_format(text: str, issues: list[dict[str, Any]]) -> None:
    for i, line in enumerate(text.split("\n"), 1):
        if len(line) > 500 and not line.startswith("|"):
            issues.append(_issue("info", "format",
                                 f"Very long line ({len(line)} chars)", line=i))
        if line.strip().startswith("|") and not line.strip().endswith("|"):
            issues.append(_issue("warning", "format", "Incomplete table row",
                                 line=i))


def validate_markdown(text: str, strict: bool = False) -> dict[str, Any]:
    """Full validation report (validation_framework.py:56-283)."""
    issues: list[dict[str, Any]] = []
    _check_schema(text, issues)
    _check_content(text, issues)
    _check_hallucinations(text, issues)
    _check_format(text, issues)

    n_err = sum(1 for i in issues if i["severity"] == "error")
    n_warn = sum(1 for i in issues if i["severity"] == "warning")
    n_info = sum(1 for i in issues if i["severity"] == "info")
    score = max(0.0, min(1.0, 1.0 - n_err * 0.15 - n_warn * 0.05 - n_info * 0.01))
    n_halluc = sum(1 for i in issues if i["category"] == "hallucination")

    return {
        "is_valid": n_err == 0 or not strict,
        "quality_score": round(score, 4),
        "errors": n_err,
        "warnings": n_warn,
        "infos": n_info,
        "hallucination_detected": n_halluc > 0,
        "hallucination_count": n_halluc,
        "issues": issues,
        "summary": {
            "schema_issues": sum(1 for i in issues if i["category"] == "schema"),
            "content_issues": sum(1 for i in issues if i["category"] == "content"),
            "format_issues": sum(1 for i in issues if i["category"] == "format"),
        },
    }


def quality_gate(markdown_text: str, report: dict[str, Any],
                 min_quality_score: float = 0.6, max_hallucinations: int = 0,
                 max_errors: int = 2, min_content_lines: int = 5
                 ) -> dict[str, Any]:
    """Gate check + suggested action (validation_framework.py:290-389)."""
    failures: list[str] = []
    recommendations: list[str] = []

    if report["quality_score"] < min_quality_score:
        failures.append(f"Quality score {report['quality_score']:.2f} < {min_quality_score}")
        recommendations.append("Consider using a different extraction engine")
    if report["hallucination_count"] > max_hallucinations:
        failures.append(f"{report['hallucination_count']} hallucinations detected")
        recommendations.append("Try local OCR instead of cloud LLM")
    if report["errors"] > max_errors:
        failures.append(f"{report['errors']} validation errors")
        recommendations.append("Review and fix schema compliance issues")

    content_lines = len([l for l in markdown_text.split("\n")
                         if l.strip() and not l.startswith("---")
                         and not l.startswith("<!--")])
    if content_lines < min_content_lines:
        failures.append(f"Only {content_lines} content lines (min: {min_content_lines})")
        recommendations.append("Document may need OCR instead of text extraction")

    if not failures:
        action = "accept"
    elif report.get("hallucination_count", 0) > 0:
        action = "fallback_to_local_ocr"
    elif report["quality_score"] < 0.3:
        action = "reject_and_retry"
    elif report["quality_score"] < 0.5:
        action = "fallback_to_alternative"
    else:
        action = "accept_with_warnings"

    score = report["quality_score"]
    level = ("excellent" if score >= 0.9 else "good" if score >= 0.8
             else "acceptable" if score >= 0.6 else "poor" if score >= 0.4
             else "unacceptable")

    return {
        "passed": not failures,
        "failures": failures,
        "recommendations": recommendations,
        "suggested_action": action,
        "quality_level": level,
    }
