"""Arrow schemas for the stage boundaries (SURVEY.md §1.4)."""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# Element IR crossing the extract → document shuffle boundary. Closed field
# set (SURVEY.md §1.2); noise/caption/footnote fields are added *after* the
# shuffle inside the document stage, so they are not part of this schema.
# NOTE: this is the LOGICAL schema of the boundary; the wire format is one
# pickled blob per turn (stages/extract.py — measured 6x cheaper round-trip
# than the Arrow struct encoding). element_to_struct/struct_to_element
# remain the canonical normalization for any consumer that wants the IR as
# Arrow structs.
ELEMENT_TYPE = pa.struct([
    ("type", pa.string()),
    ("content", pa.large_string()),
    ("y", pa.float64()),
    ("bbox", pa.list_(pa.float64(), 4)),
    ("confidence", pa.float64()),
    ("semantic_role", pa.string()),
    ("role_confidence", pa.float64()),
    ("reading_order", pa.int32()),
    ("uncertain", pa.bool_()),
])

ELEMENTS_COLUMN = pa.list_(ELEMENT_TYPE)

SPAN_TYPE = pa.struct([
    ("role", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
])

EXTRACTED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("extracted_text", pa.large_string()),
    ("spans", pa.list_(SPAN_TYPE)),
    ("n_elements", pa.int32()),
    ("strip_ratio", pa.float32()),
    ("parse_failed", pa.bool_()),
    ("was_html", pa.bool_()),
    ("language", pa.string()),
    ("quality_score", pa.float32()),
    ("confidence_score", pa.float32()),
    ("gate_passed", pa.bool_()),
    ("suggested_action", pa.string()),
    ("part", pa.int32()),
])


def element_to_struct(elem: dict) -> dict:
    """Processed element dict → closed struct row (drops turn-local extras)."""
    bbox = elem.get("bbox")
    return {
        "type": elem.get("type", "text"),
        "content": elem.get("content", ""),
        "y": float(elem.get("y", 0.0)),
        "bbox": [float(v) for v in bbox] if bbox else None,
        "confidence": float(elem.get("confidence", 1.0)),
        "semantic_role": elem.get("semantic_role"),
        "role_confidence": float(elem.get("role_confidence", 1.0)),
        "reading_order": elem.get("reading_order"),
        "uncertain": bool(elem.get("uncertain", False)),
    }


def struct_to_element(row: dict) -> dict:
    """Struct row → element dict in the reference handoff shape
    (structure_engine.py:395-406). Null-role structs (tables/figures)
    rebuild their original minimal key set."""
    kind = row["type"]
    if kind == "table":
        return {"y": row["y"], "type": "table", "content": row["content"]}
    if kind == "figure":
        return {"bbox": tuple(row["bbox"]) if row["bbox"] else (0, 0, 0, 0),
                "y": row["y"], "type": "figure", "content": row["content"],
                "semantic_role": row["semantic_role"] or "figure"}
    return {
        "y": row["y"],
        "type": kind,
        "content": row["content"],
        "reading_order": row["reading_order"] if row["reading_order"] is not None else 0,
        "semantic_role": row["semantic_role"] or "paragraph",
        "role_confidence": row["role_confidence"],
        "confidence": row["confidence"],
        "uncertain": row["uncertain"],
        "bbox": tuple(row["bbox"]) if row["bbox"] else (0, 0, 0, 0),
    }
