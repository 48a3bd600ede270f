"""Port of the reference's OpenRouter output validator
(openrouter_validator.py:13-286) — the cloud-path validation variant:
typed hallucination bank (second of three, with comment-line skip),
semantic-annotation coverage (role whitelist, SURVEY.md §2.8), reading-order
sequence check, completeness estimate (G8) and the penalty-model quality
score (G10) layered on the base MarkdownValidator report.
"""

from __future__ import annotations

import re
from typing import Any

from raydoc.kernels.validator_basic import validate_markdown_basic

_HALLUCINATION_TYPED = [
    (re.compile(p, re.IGNORECASE), t) for p, t in (
        (r"based on (the|this) (image|document|page)", "commentary_phrase"),
        (r"as (shown|seen|depicted) in (the|this)", "commentary_phrase"),
        (r"it appears (that|to be)", "speculation"),
        (r"this (seems|looks like)", "speculation"),
        (r"I (can see|notice|observe|believe)", "first_person"),
        (r"the (image|document) (shows|contains|displays)", "meta_reference"),
        (r"from what I can (see|tell|determine)", "uncertainty"),
        (r"(probably|possibly|likely|perhaps)", "hedging"),
    )]

_PAGE_MARKER = re.compile(r"<!-- page:(\d+) -->")
_ROLE_MARKER = re.compile(r"<!-- role:(\w+)(?:\s+([^>]+))? -->")
_ORDER_MARKER = re.compile(r"<!-- reading-order:(\d+) -->")
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)

VALID_ROLES = {
    "heading", "paragraph", "table", "list", "figure",
    "caption", "footnote", "equation", "code",
    "header", "footer", "page_number", "artifact", "watermark",
}


def detect_hallucination_phrases(markdown_text: str) -> list[dict[str, Any]]:
    """Typed bank; comment lines (semantic annotations) are skipped
    (openrouter_validator.py:13-54)."""
    markers = []
    for i, line in enumerate(markdown_text.split("\n"), 1):
        if line.strip().startswith("<!--"):
            continue
        for pat, marker_type in _HALLUCINATION_TYPED:
            for match in pat.finditer(line):
                markers.append({
                    "type": "hallucination", "subtype": marker_type,
                    "line": i, "text": line.strip(),
                    "matched_phrase": match.group(0), "severity": "high"})
    return markers


def validate_semantic_annotations(markdown_text: str) -> dict[str, Any]:
    """Annotation-grammar coverage + role whitelist
    (openrouter_validator.py:57-124)."""
    results: dict[str, Any] = {
        "has_page_markers": False, "has_role_annotations": False,
        "page_count": 0, "role_count": 0, "role_types": set(), "issues": [],
    }
    page_markers = _PAGE_MARKER.findall(markdown_text)
    if page_markers:
        results["has_page_markers"] = True
        results["page_count"] = len(page_markers)
        page_numbers = [int(p) for p in page_markers]
        if page_numbers != list(range(1, len(page_numbers) + 1)):
            results["issues"].append({
                "type": "non_sequential_pages",
                "message": f"Page numbers not sequential: {page_numbers}"})
    else:
        results["issues"].append({
            "type": "missing_page_markers",
            "message": "No page boundary markers found"})
    role_matches = _ROLE_MARKER.findall(markdown_text)
    if role_matches:
        results["has_role_annotations"] = True
        results["role_count"] = len(role_matches)
        results["role_types"] = set(role for role, _ in role_matches)
    else:
        results["issues"].append({
            "type": "missing_role_annotations",
            "message": "No semantic role annotations found"})
    invalid_roles = results["role_types"] - VALID_ROLES
    if invalid_roles:
        results["issues"].append({
            "type": "invalid_role_types",
            "message": f"Invalid role types found: {invalid_roles}"})
    return results


def validate_reading_order(markdown_text: str) -> dict[str, Any]:
    """Sequential reading-order markers (openrouter_validator.py:126-157)."""
    results: dict[str, Any] = {"has_reading_order": False, "order_count": 0,
                               "issues": []}
    order_markers = _ORDER_MARKER.findall(markdown_text)
    if order_markers:
        results["has_reading_order"] = True
        results["order_count"] = len(order_markers)
        order_numbers = [int(o) for o in order_markers]
        if order_numbers != list(range(1, len(order_numbers) + 1)):
            results["issues"].append({
                "type": "non_sequential_order",
                "message": f"Reading order not sequential: {order_numbers}"})
    return results


def estimate_completeness(markdown_text: str, page_count: int,
                          expected_word_count: int | None = None
                          ) -> dict[str, Any]:
    """Word-count completeness (G8; openrouter_validator.py:160-213)."""
    clean_text = _COMMENT.sub("", markdown_text)
    word_count = len(clean_text.split())
    line_count = len([ln for ln in clean_text.split("\n") if ln.strip()])
    if expected_word_count and expected_word_count > 0:
        expected_words_min = int(expected_word_count * 0.8)
        expected_words_max = int(expected_word_count * 1.5)
    else:
        expected_words_min = page_count * 150
        expected_words_max = page_count * 600
    completeness_score = 1.0
    issues = []
    if word_count < expected_words_min:
        completeness_score = (word_count / expected_words_min
                              if expected_words_min > 0 else 0)
        issues.append({
            "type": "possibly_incomplete",
            "message": f"Word count ({word_count}) below expected minimum "
                       f"({expected_words_min})",
            "severity": "medium"})
    elif word_count > expected_words_max:
        issues.append({
            "type": "possibly_excessive",
            "message": f"Word count ({word_count}) above expected maximum "
                       f"({expected_words_max})",
            "severity": "low"})
    return {"word_count": word_count, "line_count": line_count,
            "expected_range": (expected_words_min, expected_words_max),
            "completeness_score": completeness_score, "issues": issues}


def validate_openrouter_output(markdown_text: str, page_count: int,
                               original_method: str = "OpenRouter",
                               expected_word_count: int | None = None
                               ) -> dict[str, Any]:
    """Full report with penalty-model score (openrouter_validator.py:216-286,
    G10): −0.1·hallucinations, −0.15 per missing annotation family,
    −0.2·(1−completeness)."""
    hallucinations = detect_hallucination_phrases(markdown_text)
    semantic_validation = validate_semantic_annotations(markdown_text)
    reading_order = validate_reading_order(markdown_text)
    completeness = estimate_completeness(markdown_text, page_count,
                                         expected_word_count)
    base_validation = validate_markdown_basic(markdown_text, original_method)

    quality_penalties = 0.0
    if hallucinations:
        quality_penalties += len(hallucinations) * 0.1
    if not semantic_validation["has_page_markers"]:
        quality_penalties += 0.15
    if not semantic_validation["has_role_annotations"]:
        quality_penalties += 0.15
    quality_penalties += (1.0 - completeness["completeness_score"]) * 0.2
    enhanced_quality_score = max(
        0.0, base_validation["quality_score"] - quality_penalties)

    all_issues = (hallucinations + semantic_validation["issues"]
                  + reading_order["issues"] + completeness["issues"]
                  + base_validation["issues"])
    return {
        "quality_score": enhanced_quality_score,
        "base_quality_score": base_validation["quality_score"],
        "hallucination_count": len(hallucinations),
        "hallucinations": hallucinations,
        "semantic_annotations": semantic_validation,
        "reading_order": reading_order,
        "completeness": completeness,
        "syntax_valid": base_validation["syntax_valid"],
        "schema_compliant": base_validation["schema_compliant"],
        "issues": all_issues,
        "warnings": base_validation["warnings"],
        "metrics": {
            **base_validation["metrics"],
            "page_markers": semantic_validation["page_count"],
            "role_annotations": semantic_validation["role_count"],
            "completeness_score": completeness["completeness_score"],
        },
    }
