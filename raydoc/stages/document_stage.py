"""Cross-turn document stage (the single all-to-all shuffle).

``ds.groupby("conv_id").map_groups(document_group_fn, batch_format="pyarrow")``
co-locates every turn of a conversation; the group function restores stable
turn ordering (sort by turn_idx — the O4 contract, SURVEY.md §2.7) and runs
the per-conversation kernel pipeline (noise repeaters, caption/footnote
linking, confidence aggregation, render, enforce, validate, gate).

Skew note (SURVEY.md §7.4.5): group size = turns/conversation (realistic
envelope ≪ block size). Document-level pure aggregates could be salted
two-phase, but rendering needs the full conversation co-located — that is
the partitioning assumption this operator documents and relies on.
"""

from __future__ import annotations

import pyarrow as pa

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.kernels.document import process_conversation
from raydoc.schema import SPAN_TYPE, struct_to_element


def document_group_fn(group: pa.Table,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """One conversation in (any turn order) → per-turn extracted rows out."""
    conv_id = group.column("conv_id")[0].as_py()
    turn_idxs = group.column("turn_idx").to_pylist()
    elements_col = group.column("elements").to_pylist()
    was_html = group.column("was_html").to_pylist()
    strip_ratio = group.column("strip_ratio").to_pylist()
    parse_failed = group.column("parse_failed").to_pylist()
    part = group.column("part")[0].as_py()

    prebuilt = [[struct_to_element(s) for s in elems] if elems else []
                for elems in elements_col]
    stats = list(zip(was_html, strip_ratio, parse_failed))

    result = process_conversation(
        conv_id, turn_idxs, [""] * len(turn_idxs), cfg=cfg,
        prebuilt_elements=prebuilt, turn_stats=stats)

    n = len(result["turn_idx"])
    out = {
        "conv_id": pa.array([conv_id] * n, pa.string()),
        "turn_idx": pa.array(result["turn_idx"], pa.int32()),
        "extracted_text": pa.array(result["turn_markdown"], pa.large_string()),
        "spans": pa.array(result["turn_spans"], pa.list_(SPAN_TYPE)),
        "n_elements": pa.array(result["n_elements"], pa.int32()),
        "strip_ratio": pa.array(result["strip_ratio"], pa.float32()),
        "parse_failed": pa.array(result["parse_failed"], pa.bool_()),
        "was_html": pa.array(result["was_html"], pa.bool_()),
        "language": pa.array([result["language"]] * n, pa.string()),
        "quality_score": pa.array([result["quality_score"]] * n, pa.float32()),
        "confidence_score": pa.array([result["confidence_score"]] * n, pa.float32()),
        "gate_passed": pa.array([result["gate_passed"]] * n, pa.bool_()),
        "suggested_action": pa.array([result["suggested_action"]] * n, pa.string()),
        "part": pa.array([part] * n, pa.int32()),
    }
    if cfg.include_doc_markdown:
        out["doc_markdown"] = pa.array(
            [result["doc_markdown"] if i == 0 else "" for i in range(n)],
            pa.large_string())
    return pa.table(out)
