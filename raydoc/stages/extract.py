"""Per-turn extractor stage (the stateful actor pool).

The A1/A2 slot of the reference (module-global OCR/table engines,
structure_engine.py:30-63) rebuilt as a Ray Data actor pool: everything
expensive — compiled regex banks, the HTML tree parser, classifier tables —
is process/actor state built once per worker (``__init__``), and
``__call__`` handles one zero-copy Arrow batch of turns at a time:

    ds.map_batches(ExtractorActor, batch_format="pyarrow",
                   batch_size=cfg.extract_batch_size,
                   concurrency=cfg.extract_concurrency)

Per-row failure isolation mirrors the reference's per-page try/except
(structure_engine.py:442-445): a turn that fails to parse yields an empty
element list + ``parse_failed=True``; the task never dies.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from raydoc.config import DEFAULT_CONFIG, PipelineConfig
from raydoc.schema import ELEMENTS_COLUMN, element_to_struct


def partition_of(conv_id: str, num_partitions: int) -> int:
    """Deterministic partition assignment (md5-based; stable across runs and
    Python processes — the checkpoint/resume key, SURVEY.md §4.2)."""
    return int(hashlib.md5(conv_id.encode()).hexdigest()[:8], 16) % num_partitions


def shuffle_key_of(conv_id: str, num_partitions: int, fineness: int) -> int:
    """Finer-grained shuffle bucket for the document stage. Buckets =
    num_partitions × fineness so reduce parallelism isn't capped by the
    (coarser) checkpoint partition count; consistent with ``partition_of``
    because (h mod P·F) mod P == h mod P — every conversation in a shuffle
    bucket belongs to exactly one output partition."""
    return int(hashlib.md5(conv_id.encode()).hexdigest()[:8], 16) % (
        num_partitions * fineness)


class ExtractorActor:
    """text → normalized text + element IR, one Arrow batch per call."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        # Heavy setup happens once per actor: importing the kernel modules
        # compiles every pattern bank in this worker process.
        from raydoc.kernels.document import build_turn_elements, extract_turn_text
        self._extract = extract_turn_text
        self._build = build_turn_elements
        self._cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        texts = batch.column("text").to_pylist()

        elements_col: list[list[dict]] = []
        was_html: list[bool] = []
        strip_ratio: list[float] = []
        parse_failed: list[bool] = []
        parts: list[int] = []
        skeys: list[int] = []
        n_parts = self._cfg.num_output_partitions
        fineness = self._cfg.shuffle_fineness

        for conv_id, text in zip(conv_ids, texts):
            h = int(hashlib.md5(conv_id.encode()).hexdigest()[:8], 16)
            parts.append(h % n_parts)
            skeys.append(h % (n_parts * fineness))
            try:
                normalized, html_flag, ratio = self._extract(text or "")
                elements = self._build(normalized, self._cfg)
                elements_col.append([element_to_struct(e) for e in elements])
                was_html.append(html_flag)
                strip_ratio.append(ratio)
                parse_failed.append(False)
            except Exception:
                elements_col.append([])
                was_html.append(False)
                strip_ratio.append(0.0)
                parse_failed.append(True)

        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "elements": pa.array(elements_col, type=ELEMENTS_COLUMN),
            "was_html": pa.array(was_html, pa.bool_()),
            "strip_ratio": pa.array(strip_ratio, pa.float32()),
            "parse_failed": pa.array(parse_failed, pa.bool_()),
            "part": pa.array(parts, pa.int32()),
            "shuffle_key": pa.array(skeys, pa.int32()),
        })
