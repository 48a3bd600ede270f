"""Schema enforcement kernel (RAG-markdown schema compliance).

Semantics-equal reimplementation of schema_enforcer.py:12-218 — the seven
ordered passes over the rendered document: frontmatter add/validate, page
markers, role-annotation injection for bare ``#``/``|`` lines, heading-level
normalization (min level → 1), table re-padding, whitespace cleanup
(``\\n{4,}`` → ``\\n\\n\\n`` — deliberately different from the cleaner's
``\\n{3,}`` collapse, SURVEY.md §2.9).

Determinism: the reference stamps ``datetime.now()`` when metadata lacks
``extraction_date`` (schema_enforcer.py:55) — here the caller must pass a
pinned ``extraction_date``/``document_id``; a ``now_iso`` parameter exists
only for drop-in parity and defaults to a fixed epoch string.
"""

from __future__ import annotations

import re
from typing import Any

_PAGE_MARKER = re.compile(r"<!--\s*page:\s*(\d+)\s*-->")
_ROLE_ANNOTATION = re.compile(r"<!--\s*role:(\w+)(?:\s+[^>]+)?\s*-->")
_HEADING = re.compile(r"^(#{1,6})\s+(.+)$", re.MULTILINE)
_FM_END = re.compile(r"\n---\n")
_SEP_CELL = re.compile(r"^:?-+:?$")
_PAGE_HEADING = re.compile(r"^##\s+Page\s+(\d+)\s*$", re.MULTILINE)
_NL4 = re.compile(r"\n{4,}")

REQUIRED_FIELDS = ("source_file", "document_id")

PINNED_NOW = "1970-01-01T00:00:00"


def build_frontmatter(m: dict[str, Any], now_iso: str = PINNED_NOW) -> str:
    """YAML frontmatter block (schema_enforcer.py:49-78)."""
    lines = ["---", "document:"]
    lines.append(f'  source_file: "{m.get("source_file", "unknown")}"')
    lines.append(f'  document_id: "{m.get("document_id", "0" * 16)}"')
    if "pages" in m:
        lines.append(f'  pages: {m["pages"]}')
    lines.append(f'  extraction_method: "{m.get("extraction_method", "unknown")}"')
    lines.append(f'  extraction_date: "{m.get("extraction_date", now_iso)}"')
    lines.append(f'  language: "{m.get("language", "en")}"')

    lines.extend(["", "quality:"])
    score = m.get("confidence_score", m.get("quality_score", 1.0))
    lines.append(f"  confidence_score: {score:.4f}")
    if "confidence_avg" in m:
        lines.append(f'  confidence_avg: {m["confidence_avg"]:.4f}')
    if "confidence_min" in m:
        lines.append(f'  confidence_min: {m["confidence_min"]:.4f}')
    if "uncertain_regions" in m:
        lines.append(f'  uncertain_regions: {m["uncertain_regions"]}')

    if any(k in m for k in ("detected_columns", "has_tables", "has_figures")):
        lines.extend(["", "layout:"])
        if "detected_columns" in m:
            lines.append(f'  detected_columns: {m["detected_columns"]}')
        if "has_tables" in m:
            lines.append(f'  has_tables: {str(m["has_tables"]).lower()}')
        if "has_figures" in m:
            lines.append(f'  has_figures: {str(m["has_figures"]).lower()}')

    if any(k in m for k in ("title", "author", "creation_date")):
        lines.extend(["", "metadata:"])
        if m.get("title"):
            lines.append(f'  title: "{m["title"]}"')
        if m.get("author"):
            lines.append(f'  author: "{m["author"]}"')
        if m.get("creation_date"):
            lines.append(f'  creation_date: "{m["creation_date"]}"')

    lines.extend(["---", ""])
    return "\n".join(lines)


def _fix_frontmatter(text: str, metadata: dict[str, Any],
                     now_iso: str, violations: list[dict[str, str]]) -> str:
    if not text.startswith("---"):
        return text
    end = _FM_END.search(text[3:])
    if not end:
        return text
    fm_end = end.end() + 3
    frontmatter = text[3:fm_end - 4]
    content = text[fm_end:]
    missing = [f for f in REQUIRED_FIELDS if f"{f}:" not in frontmatter]
    if missing:
        violations.append({"type": "missing_fields", "message": f"Missing: {missing}"})
        return build_frontmatter(metadata, now_iso) + content
    return text


def _ensure_page_markers(text: str, violations: list[dict[str, str]]) -> str:
    if _PAGE_MARKER.search(text):
        return text
    text = _PAGE_HEADING.sub(r"<!-- page:\1 -->", text)
    if not _PAGE_MARKER.search(text):
        fm_end = text.find("---", 3)
        if fm_end > 0:
            fm_end = text.find("\n", fm_end) + 1
            text = text[:fm_end] + "\n<!-- page:1 -->\n" + text[fm_end:]
        else:
            text = "<!-- page:1 -->\n\n" + text
        violations.append({"type": "no_page_markers",
                           "message": "Added initial page marker"})
    return text


def _inject_role_annotations(text: str) -> str:
    """Prepend role comments before bare heading / table lines
    (schema_enforcer.py:115-134)."""
    result: list[str] = []
    for line in text.split("\n"):
        stripped = line.strip()
        if not stripped or stripped.startswith("---") or stripped.startswith("<!--"):
            result.append(line)
            continue
        has_ann = bool(result) and result[-1].strip().startswith("<!-- role:")
        if not has_ann:
            if stripped.startswith("#"):
                level = len(stripped) - len(stripped.lstrip("#"))
                result.append(f"<!-- role:heading level:{level} -->")
            elif stripped.startswith("|"):
                result.append("<!-- role:table -->")
        result.append(line)
    return "\n".join(result)


def _normalize_heading_levels(text: str,
                              violations: list[dict[str, str]]) -> str:
    matches = list(_HEADING.finditer(text))
    if not matches:
        return text
    min_level = min(len(m.group(1)) for m in matches)
    if min_level > 1:
        shift = min_level - 1
        for m in reversed(matches):
            replacement = "#" * (len(m.group(1)) - shift) + " " + m.group(2)
            text = text[:m.start()] + replacement + text[m.end():]
        violations.append({"type": "heading_hierarchy",
                           "message": f"Normalized by -{shift}"})
    return text


def _pad_table(rows: list[str]) -> list[str]:
    if len(rows) < 2:
        return rows
    parsed = [[c.strip() for c in r.strip("|").split("|")] for r in rows]
    num_cols = max(len(r) for r in parsed)
    widths = [
        max(3, max(len(r[i]) if i < len(r) and not _SEP_CELL.match(r[i]) else 3
                   for r in parsed))
        for i in range(num_cols)
    ]
    out = []
    for i, row in enumerate(parsed):
        cells = []
        for j in range(num_cols):
            cell = row[j] if j < len(row) else ""
            if i == 1 and _SEP_CELL.match(cell):
                cells.append("-" * widths[j])
            else:
                cells.append(cell.ljust(widths[j]))
        out.append("| " + " | ".join(cells) + " |")
    return out


def _standardize_tables(text: str) -> str:
    if "|" not in text:   # no table rows anywhere → pass is a no-op
        return text
    result: list[str] = []
    buf: list[str] = []
    in_table = False
    for line in text.split("\n"):
        stripped = line.strip()
        if stripped.startswith("|") and stripped.endswith("|"):
            in_table = True
            buf.append(stripped)
        elif in_table:
            if buf:
                result.extend(_pad_table(buf))
            buf, in_table = [], False
            result.append(line)
        else:
            result.append(line)
    if buf:
        result.extend(_pad_table(buf))
    return "\n".join(result)


def _final_cleanup(text: str) -> str:
    text = _NL4.sub("\n\n\n", text)
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    return "\n".join(line.rstrip() for line in text.split("\n")).rstrip("\n") + "\n"


def enforce_schema(markdown_text: str, metadata: dict[str, Any],
                   now_iso: str = PINNED_NOW
                   ) -> tuple[str, list[dict[str, str]]]:
    """Run the seven passes; returns (text, violations)
    (schema_enforcer.py:24-40)."""
    violations: list[dict[str, str]] = []
    if not markdown_text.strip().startswith("---"):
        markdown_text = build_frontmatter(metadata, now_iso) + "\n" + markdown_text
        violations.append({"type": "missing_frontmatter",
                           "message": "Added YAML frontmatter"})
    else:
        markdown_text = _fix_frontmatter(markdown_text, metadata, now_iso,
                                         violations)
    markdown_text = _ensure_page_markers(markdown_text, violations)
    markdown_text = _inject_role_annotations(markdown_text)
    markdown_text = _normalize_heading_levels(markdown_text, violations)
    markdown_text = _standardize_tables(markdown_text)
    markdown_text = _final_cleanup(markdown_text)
    return markdown_text, violations
