"""Port of the reference's standalone MarkdownValidator (validator.py:12-313)
— the third validator variant alongside the validation-framework port in
``validate.py`` and the completeness checks in ``enforce``/``document``.

Semantics preserved exactly, including the reference's quirks:
- ``validate_syntax`` resets ``issues`` but ``warnings`` accumulate across
  calls (so ``get_validation_report`` double-counts schema warnings — it
  runs schema validation once directly and once inside the quality score).
- the malformed-table branch can never fire (``count('|') >= 2`` implies
  ``len(split('|')) >= 3``) — kept as dead logic for parity.
- its hallucination pattern bank differs slightly from
  validation_framework's (SURVEY.md §2.2 M15: three distinct banks).
"""

from __future__ import annotations

import re
from typing import Any

_LINK = re.compile(r"\[([^\]]+)\]\(([^\)]*)\)")
_HALLUCINATION_BANK = [
    r"based on (the|this) (image|document|page)",
    r"as (shown|seen|depicted) in (the|this)",
    r"it appears (that|to be)",
    r"this (seems|looks like)",
    r"I (can see|notice|observe)",
    r"the (image|document) (shows|contains|displays)",
    r"from what I can (see|tell)",
]
_HALLUCINATION = [re.compile(p, re.IGNORECASE) for p in _HALLUCINATION_BANK]
_ROLE_ANN = re.compile(r"<!-- role:\w+ -->")
_HEADING_ML = re.compile(r"^#{1,6}\s", re.MULTILINE)
_LIST_ML = re.compile(r"^[\-\*\+]\s", re.MULTILINE)

METHOD_SCORES = {
    "OpenRouter": 20, "Qwen": 18, "Gemini": 17, "pymupdf4llm": 15,
    "GMFT": 14, "RapidOCR": 12, "Fallback": 8,
}


class MarkdownValidator:
    """Stateful validator ≙ validator.py:12-300."""

    def __init__(self) -> None:
        self.issues: list[dict[str, Any]] = []
        self.warnings: list[dict[str, Any]] = []

    def validate_syntax(self, markdown_text: str) -> bool:
        self.issues = []
        is_valid = True
        for i, line in enumerate(markdown_text.split("\n"), 1):
            if "|" in line and not line.strip().startswith("|"):
                if line.count("|") >= 2:
                    parts = line.split("|")
                    if len(parts) < 3:   # unreachable; reference parity
                        self.issues.append({
                            "type": "malformed_table", "line": i,
                            "message": "Table row has insufficient columns"})
                        is_valid = False
            if line.count("[") != line.count("]"):
                self.warnings.append({
                    "type": "unmatched_brackets", "line": i,
                    "message": "Unmatched square brackets (may be intentional)"})
            for text, url in _LINK.findall(line):
                if not url:
                    self.issues.append({
                        "type": "empty_link", "line": i,
                        "message": f"Empty URL in link: [{text}]()"})
                    is_valid = False
        if markdown_text.count("```") % 2 != 0:
            self.issues.append({
                "type": "unclosed_code_block", "line": None,
                "message": "Unclosed code block (odd number of ``` markers)"})
            is_valid = False
        return is_valid

    def validate_schema_compliance(self, markdown_text: str) -> bool:
        is_compliant = True
        if not markdown_text.strip().startswith("---"):
            self.warnings.append({
                "type": "missing_frontmatter",
                "message": "Document lacks YAML frontmatter (metadata not preserved)"})
            is_compliant = False
        else:
            frontmatter_end = markdown_text.find("---", 3)
            if frontmatter_end == -1:
                self.issues.append({
                    "type": "malformed_frontmatter",
                    "message": "YAML frontmatter not properly closed"})
                is_compliant = False
            else:
                frontmatter = markdown_text[3:frontmatter_end]
                for field in ("document:", "source_file:", "document_id:"):
                    if field not in frontmatter:
                        self.warnings.append({
                            "type": "missing_metadata_field",
                            "message": f"Missing required field: {field}"})
        if not _ROLE_ANN.search(markdown_text):
            self.warnings.append({
                "type": "missing_semantic_annotations",
                "message": "No semantic role annotations found (reduces RAG effectiveness)"})
        return is_compliant

    def detect_hallucination_markers(self, markdown_text: str
                                     ) -> list[dict[str, Any]]:
        markers = []
        for i, line in enumerate(markdown_text.split("\n"), 1):
            for raw, pat in zip(_HALLUCINATION_BANK, _HALLUCINATION):
                if pat.search(line):
                    markers.append({"type": "possible_hallucination",
                                    "line": i, "text": line.strip(),
                                    "pattern": raw})
        return markers

    def calculate_quality_score(self, markdown_text: str,
                                extraction_method: str = "",
                                ocr_confidence: float | None = None) -> float:
        score = 0.0
        if self.validate_syntax(markdown_text):
            score += 30
        else:
            score += max(0, 30 - len(self.issues) * 5)
        if self.validate_schema_compliance(markdown_text):
            score += 20
        else:
            score += max(0, 20 - len([w for w in self.warnings
                                      if w["type"].startswith("missing")]) * 5)
        has_headings = bool(_HEADING_ML.search(markdown_text))
        has_tables = "|" in markdown_text and "---" in markdown_text
        has_lists = bool(_LIST_ML.search(markdown_text))
        has_formatting = "**" in markdown_text or "*" in markdown_text
        if has_headings:
            score += 5
        if has_tables:
            score += 7
        if has_lists:
            score += 4
        if has_formatting:
            score += 4
        for method, method_score in METHOD_SCORES.items():
            if method in extraction_method:
                score += method_score
                break
        else:
            score += 10
        if ocr_confidence is not None:
            score += ocr_confidence * 10
        else:
            score += 5
        return min(1.0, score / 100.0)

    def get_validation_report(self, markdown_text: str,
                              extraction_method: str = "",
                              ocr_confidence: float | None = None
                              ) -> dict[str, Any]:
        syntax_valid = self.validate_syntax(markdown_text)
        schema_compliant = self.validate_schema_compliance(markdown_text)
        hallucinations = self.detect_hallucination_markers(markdown_text)
        quality_score = self.calculate_quality_score(
            markdown_text, extraction_method, ocr_confidence)
        return {
            "quality_score": quality_score,
            "syntax_valid": syntax_valid,
            "schema_compliant": schema_compliant,
            "issues": self.issues,
            "warnings": self.warnings,
            "hallucination_markers": hallucinations,
            "metrics": {
                "word_count": len(markdown_text.split()),
                "line_count": len(markdown_text.split("\n")),
                "avg_confidence": ocr_confidence if ocr_confidence else None,
            },
        }


def validate_markdown_basic(markdown_text: str, extraction_method: str = "",
                            ocr_confidence: float | None = None
                            ) -> dict[str, Any]:
    """One-shot convenience ≙ validator.py:302-313."""
    return MarkdownValidator().get_validation_report(
        markdown_text, extraction_method, ocr_confidence)
