"""Cross-turn document stage (the single all-to-all shuffle).

``ds.groupby("conv_id").map_groups(document_group_fn, batch_format="pyarrow")``
co-locates every turn of a conversation; the group function restores stable
turn ordering (sort by turn_idx — the O4 contract, SURVEY.md §2.7) and runs
the per-conversation kernel pipeline (noise repeaters, caption/footnote
linking, confidence aggregation, render, enforce, validate, gate).

Skew note (SURVEY.md §7.4.5): group size = turns/conversation (realistic
envelope ≪ block size). Document-level pure aggregates could be salted
two-phase, but rendering needs the full conversation co-located — that is
the partitioning assumption this operator documents and relies on. The
assumption is ENFORCED, not assumed: conversations over
``cfg.max_turns_per_conv`` degrade to chunk-local processing with every
row flagged (see ``_process_conversation_guarded``).
"""

from __future__ import annotations

import pyarrow as pa

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.kernels.document import process_conversation
from raydoc.schema import SPAN_TYPE


OVERSIZE_ACTION = "oversize_conversation_chunked"


def _process_conversation_guarded(conv_id, turn_idxs, prebuilt, stats,
                                  cfg: PipelineConfig) -> list[dict]:
    """Skew guard around ``process_conversation``: a conversation within
    ``cfg.max_turns_per_conv`` runs the normal cross-turn kernel pipeline
    (one result). An over-cap conversation (the pathological million-turn
    case the co-location contract excludes) is processed in
    turn_idx-ordered chunks of the cap instead — bounding the kernel-side
    memory/quadratic work — with cross-turn context (repeaters, linking,
    doc markdown) chunk-local and EVERY row flagged
    (``fallback_applied=True``, ``suggested_action=OVERSIZE_ACTION``) so
    the degradation is visible downstream, never silent."""
    cap = cfg.max_turns_per_conv
    if cap is None or len(turn_idxs) <= cap:
        return [process_conversation(
            conv_id, turn_idxs, [""] * len(turn_idxs), cfg=cfg,
            prebuilt_elements=prebuilt, turn_stats=stats)]
    order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
    results = []
    for off in range(0, len(order), cap):
        ix = order[off:off + cap]
        r = process_conversation(
            conv_id, [turn_idxs[i] for i in ix], [""] * len(ix), cfg=cfg,
            prebuilt_elements=[prebuilt[i] for i in ix],
            turn_stats=[stats[i] for i in ix])
        r["fallback_applied"] = True
        r["suggested_action"] = OVERSIZE_ACTION
        results.append(r)
    return results


def document_group_fn(group: pa.Table,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """One conversation in (any turn order) → per-turn extracted rows out."""
    import pickle
    conv_id = group.column("conv_id")[0].as_py()
    turn_idxs = group.column("turn_idx").to_pylist()
    elements_col = group.column("elements").to_pylist()
    was_html = group.column("was_html").to_pylist()
    strip_ratio = group.column("strip_ratio").to_pylist()
    parse_failed = group.column("parse_failed").to_pylist()
    part = group.column("part")[0].as_py()

    prebuilt = [pickle.loads(b) if b else [] for b in elements_col]
    stats = list(zip(was_html, strip_ratio, parse_failed))

    results = _process_conversation_guarded(conv_id, turn_idxs, prebuilt,
                                            stats, cfg)

    cols: dict[str, list] = {k: [] for k in (
        "turn_idx", "extracted_text", "spans", "n_elements", "strip_ratio",
        "parse_failed", "was_html", "language", "quality_score",
        "confidence_score", "gate_passed", "suggested_action",
        "fallback_applied", "extraction_engine", "doc_markdown")}
    for result in results:
        n = len(result["turn_idx"])
        cols["turn_idx"].extend(result["turn_idx"])
        cols["extracted_text"].extend(result["turn_markdown"])
        cols["spans"].extend(result["turn_spans"])
        cols["n_elements"].extend(result["n_elements"])
        cols["strip_ratio"].extend(result["strip_ratio"])
        cols["parse_failed"].extend(result["parse_failed"])
        cols["was_html"].extend(result["was_html"])
        for k in ("language", "quality_score", "confidence_score",
                  "gate_passed", "suggested_action", "fallback_applied",
                  "extraction_engine"):
            cols[k].extend([result[k]] * n)
        if cfg.include_doc_markdown:
            cols["doc_markdown"].extend(
                [result["doc_markdown"]] + [""] * (n - 1))

    n = len(cols["turn_idx"])
    out = {
        "conv_id": pa.array([conv_id] * n, pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
        "extracted_text": pa.array(cols["extracted_text"], pa.large_string()),
        "spans": pa.array(cols["spans"], pa.list_(SPAN_TYPE)),
        "n_elements": pa.array(cols["n_elements"], pa.int32()),
        "strip_ratio": pa.array(cols["strip_ratio"], pa.float32()),
        "parse_failed": pa.array(cols["parse_failed"], pa.bool_()),
        "was_html": pa.array(cols["was_html"], pa.bool_()),
        "language": pa.array(cols["language"], pa.string()),
        "quality_score": pa.array(cols["quality_score"], pa.float32()),
        "confidence_score": pa.array(cols["confidence_score"], pa.float32()),
        "gate_passed": pa.array(cols["gate_passed"], pa.bool_()),
        "suggested_action": pa.array(cols["suggested_action"], pa.string()),
        "fallback_applied": pa.array(cols["fallback_applied"], pa.bool_()),
        "extraction_engine": pa.array(cols["extraction_engine"], pa.string()),
        "part": pa.array([part] * n, pa.int32()),
    }
    if cfg.include_doc_markdown:
        out["doc_markdown"] = pa.array(cols["doc_markdown"],
                                       pa.large_string())
    return pa.table(out)


def document_block_fn(block: pa.Table,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """One shuffle bucket (MANY complete conversations) → per-turn rows.

    Used with ``groupby("shuffle_key").map_groups(...)``: every conversation
    hashing to the bucket is fully co-located, so this function amortizes the
    Arrow↔Python boundary over ~hundreds of conversations instead of paying
    per-conversation ``map_groups`` overhead (measured ~2× of kernel time at
    6-turn conversations: 5k fn calls + 70k tiny array builds per job)."""
    import pickle
    raw = {
        "conv_id": block.column("conv_id").to_pylist(),
        "turn_idx": block.column("turn_idx").to_pylist(),
        "elements": [pickle.loads(b) if b else []
                     for b in block.column("elements").to_pylist()],
        "was_html": block.column("was_html").to_pylist(),
        "strip_ratio": block.column("strip_ratio").to_pylist(),
        "parse_failed": block.column("parse_failed").to_pylist(),
        "part": block.column("part").to_pylist(),
    }
    return document_rows_from_raw(raw, cfg)


def document_rows_from_raw(raw: dict,
                           cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Core document stage over plain-Python inputs: ``raw`` carries
    parallel lists (conv_id, turn_idx, elements as Element dicts, was_html,
    strip_ratio, parse_failed, part). Used directly by the fused per-file
    path (no Arrow struct round-trip) and via document_block_fn after a
    shuffle."""
    conv_ids = raw["conv_id"]
    turn_idxs = raw["turn_idx"]
    prebuilt_col = raw["elements"]
    was_html = raw["was_html"]
    strip_ratio = raw["strip_ratio"]
    parse_failed = raw["parse_failed"]
    parts = raw["part"]

    by_conv: dict[str, list[int]] = {}
    for i, cid in enumerate(conv_ids):
        by_conv.setdefault(cid, []).append(i)

    o_conv: list[str] = []
    o_turn: list[int] = []
    o_text: list[str] = []
    o_spans: list[list] = []
    o_nel: list[int] = []
    o_strip: list[float] = []
    o_pfail: list[bool] = []
    o_html: list[bool] = []
    o_lang: list[str] = []
    o_qual: list[float] = []
    o_conf: list[float] = []
    o_gate: list[bool] = []
    o_act: list[str] = []
    o_fb: list[bool] = []
    o_eng: list[str] = []
    o_part: list[int] = []
    o_docmd: list[str] = []

    for cid, ix in by_conv.items():
        prebuilt = [prebuilt_col[i] for i in ix]
        stats = [(was_html[i], strip_ratio[i], parse_failed[i]) for i in ix]
        results = _process_conversation_guarded(
            cid, [turn_idxs[i] for i in ix], prebuilt, stats, cfg)
        for result in results:
            n = len(result["turn_idx"])
            o_conv.extend([cid] * n)
            o_turn.extend(result["turn_idx"])
            o_text.extend(result["turn_markdown"])
            o_spans.extend(result["turn_spans"])
            o_nel.extend(result["n_elements"])
            o_strip.extend(result["strip_ratio"])
            o_pfail.extend(result["parse_failed"])
            o_html.extend(result["was_html"])
            o_lang.extend([result["language"]] * n)
            o_qual.extend([result["quality_score"]] * n)
            o_conf.extend([result["confidence_score"]] * n)
            o_gate.extend([result["gate_passed"]] * n)
            o_act.extend([result["suggested_action"]] * n)
            o_fb.extend([result["fallback_applied"]] * n)
            o_eng.extend([result["extraction_engine"]] * n)
            o_part.extend([parts[ix[0]]] * n)
            if cfg.include_doc_markdown:
                o_docmd.extend([result["doc_markdown"]] + [""] * (n - 1))

    out = {
        "conv_id": pa.array(o_conv, pa.string()),
        "turn_idx": pa.array(o_turn, pa.int32()),
        "extracted_text": pa.array(o_text, pa.large_string()),
        "spans": pa.array(o_spans, pa.list_(SPAN_TYPE)),
        "n_elements": pa.array(o_nel, pa.int32()),
        "strip_ratio": pa.array(o_strip, pa.float32()),
        "parse_failed": pa.array(o_pfail, pa.bool_()),
        "was_html": pa.array(o_html, pa.bool_()),
        "language": pa.array(o_lang, pa.string()),
        "quality_score": pa.array(o_qual, pa.float32()),
        "confidence_score": pa.array(o_conf, pa.float32()),
        "gate_passed": pa.array(o_gate, pa.bool_()),
        "suggested_action": pa.array(o_act, pa.string()),
        "fallback_applied": pa.array(o_fb, pa.bool_()),
        "extraction_engine": pa.array(o_eng, pa.string()),
        "part": pa.array(o_part, pa.int32()),
    }
    if cfg.include_doc_markdown:
        out["doc_markdown"] = pa.array(o_docmd, pa.large_string())
    return pa.table(out)
