"""Port of the reference's RapidOCR output validator
(rapidocr_validator.py:12-319) — the local-OCR-path validation variant:
layout-marker checks with column-count heuristic, role whitelist (narrower
than the OpenRouter variant's), confidence-marker distribution analysis,
word-count completeness (G8) and its penalty model (G10) over the base
MarkdownValidator report.
"""

from __future__ import annotations

import re
from typing import Any

from raydoc.kernels.validator_basic import validate_markdown_basic

_PAGE_MARKER = re.compile(r"<!-- page:(\d+) -->")
_ORDER_MARKER = re.compile(r"<!-- reading-order:(\d+) -->")
_ROLE_MARKER = re.compile(r"<!-- role:(\w+)(?: .*?)? -->")
_CONF_MARKER = re.compile(r"<!-- confidence:(0\.\d+) -->")
_UNCERTAIN = re.compile(r"\[uncertain: (.*?)\]")
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)

VALID_ROLES = {"heading", "paragraph", "list_item", "table", "caption",
               "footnote"}


def validate_layout_analysis(markdown_text: str,
                             expected_columns: int | None = None
                             ) -> dict[str, Any]:
    issues = []
    page_markers = _PAGE_MARKER.findall(markdown_text)
    has_page_markers = len(page_markers) > 0
    page_count = len(page_markers)
    if not has_page_markers:
        issues.append({"type": "missing_page_markers", "severity": "warning",
                       "message": "No page markers found"})
    reading_order_markers = _ORDER_MARKER.findall(markdown_text)
    has_reading_order = len(reading_order_markers) > 0
    if has_reading_order:
        order_numbers = [int(m) for m in reading_order_markers]
        if order_numbers != list(range(1, len(order_numbers) + 1)):
            issues.append({
                "type": "reading_order_inconsistent", "severity": "error",
                "message": f"Reading order not sequential: {order_numbers}"})
    detected_columns = 1
    if has_reading_order and page_count > 0:
        avg_elements_per_page = len(reading_order_markers) / page_count
        if avg_elements_per_page > 20:
            detected_columns = 2
        if avg_elements_per_page > 40:
            detected_columns = 3
    if expected_columns and detected_columns != expected_columns:
        issues.append({
            "type": "column_count_mismatch", "severity": "warning",
            "message": f"Expected {expected_columns} columns, detected "
                       f"{detected_columns}"})
    return {"has_page_markers": has_page_markers, "page_count": page_count,
            "has_reading_order": has_reading_order,
            "detected_columns": detected_columns,
            "reading_order_count": len(reading_order_markers),
            "issues": issues}


def validate_semantic_annotations(markdown_text: str) -> dict[str, Any]:
    issues = []
    roles = _ROLE_MARKER.findall(markdown_text)
    invalid_roles = [r for r in roles if r not in VALID_ROLES]
    if invalid_roles:
        issues.append({
            "type": "invalid_role_types", "severity": "error",
            "message": f"Invalid role types found: {set(invalid_roles)}"})
    role_distribution: dict[str, int] = {}
    for role in roles:
        role_distribution[role] = role_distribution.get(role, 0) + 1
    has_annotations = len(roles) > 0
    if not has_annotations:
        issues.append({
            "type": "missing_semantic_annotations", "severity": "warning",
            "message": "No semantic role annotations found"})
    return {"has_annotations": has_annotations, "role_count": len(roles),
            "role_distribution": role_distribution,
            "invalid_roles": list(set(invalid_roles)), "issues": issues}


def analyze_confidence_distribution(markdown_text: str) -> dict[str, Any]:
    issues = []
    confidence_scores = [float(c) for c in _CONF_MARKER.findall(markdown_text)]
    uncertain_texts = _UNCERTAIN.findall(markdown_text)
    uncertain_count = len(uncertain_texts)
    if confidence_scores:
        avg_low_confidence = sum(confidence_scores) / len(confidence_scores)
        min_confidence = min(confidence_scores)
    else:
        avg_low_confidence = None
        min_confidence = None
    total_lines = len(markdown_text.split("\n"))
    uncertain_percentage = (uncertain_count / total_lines * 100
                            if total_lines > 0 else 0)
    if uncertain_percentage > 20:
        issues.append({
            "type": "high_uncertainty", "severity": "warning",
            "message": f"{uncertain_percentage:.1f}% of text marked as "
                       f"uncertain"})
    if min_confidence and min_confidence < 0.5:
        issues.append({
            "type": "very_low_confidence", "severity": "error",
            "message": f"Minimum confidence score: {min_confidence:.2f}"})
    return {"low_confidence_count": len(confidence_scores),
            "uncertain_count": uncertain_count,
            "uncertain_percentage": uncertain_percentage,
            "avg_low_confidence": avg_low_confidence,
            "min_confidence": min_confidence, "issues": issues}


def estimate_extraction_completeness(markdown_text: str, page_count: int,
                                     expected_words_per_page: tuple[int, int]
                                     = (150, 600)) -> dict[str, Any]:
    issues = []
    text_only = _COMMENT.sub("", markdown_text)
    word_count = len(text_only.split())
    min_expected = page_count * expected_words_per_page[0]
    max_expected = page_count * expected_words_per_page[1]
    if word_count < min_expected:
        completeness_score = word_count / min_expected
        issues.append({
            "type": "possibly_incomplete", "severity": "warning",
            "message": f"Word count ({word_count}) below expected minimum "
                       f"({min_expected})"})
    else:
        completeness_score = 1.0
    return {"word_count": word_count,
            "expected_range": (min_expected, max_expected),
            "completeness_score": completeness_score, "issues": issues}


def validate_rapidocr_output(markdown_text: str, page_count: int,
                             original_method: str = "RapidOCR",
                             expected_columns: int | None = None
                             ) -> dict[str, Any]:
    """Penalty model (rapidocr_validator.py:264-289): −0.15 missing pages,
    −0.10 missing annotations, −0.15 high uncertainty, −0.20·(1−complete),
    −0.10 per layout error."""
    layout_validation = validate_layout_analysis(markdown_text,
                                                 expected_columns)
    semantic_validation = validate_semantic_annotations(markdown_text)
    confidence_analysis = analyze_confidence_distribution(markdown_text)
    completeness = estimate_extraction_completeness(markdown_text, page_count)
    base_validation = validate_markdown_basic(markdown_text, original_method)

    quality_penalties = 0.0
    if not layout_validation["has_page_markers"]:
        quality_penalties += 0.15
    if not semantic_validation["has_annotations"]:
        quality_penalties += 0.10
    if confidence_analysis["uncertain_percentage"] > 20:
        quality_penalties += 0.15
    quality_penalties += (1.0 - completeness["completeness_score"]) * 0.20
    layout_error_count = sum(1 for issue in layout_validation["issues"]
                             if issue["severity"] == "error")
    quality_penalties += layout_error_count * 0.10
    enhanced_quality_score = max(
        0.0, base_validation["quality_score"] - quality_penalties)

    all_issues = (layout_validation["issues"] + semantic_validation["issues"]
                  + confidence_analysis["issues"] + completeness["issues"]
                  + base_validation["issues"])
    return {
        "quality_score": enhanced_quality_score,
        "base_quality_score": base_validation["quality_score"],
        "layout_analysis": layout_validation,
        "semantic_annotations": semantic_validation,
        "confidence_analysis": confidence_analysis,
        "completeness": completeness,
        "syntax_valid": base_validation["syntax_valid"],
        "schema_compliant": base_validation["schema_compliant"],
        "issues": all_issues,
        "warnings": base_validation["warnings"],
        "metrics": {
            **base_validation["metrics"],
            "page_count": layout_validation["page_count"],
            "detected_columns": layout_validation["detected_columns"],
            "role_annotations": semantic_validation["role_count"],
            "uncertain_percentage": confidence_analysis["uncertain_percentage"],
            "completeness_score": completeness["completeness_score"],
        },
    }
