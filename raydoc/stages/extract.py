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
import os

import pyarrow as pa

from raydoc.config import DEFAULT_CONFIG, PipelineConfig


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


class FusedFileActor:
    """Shuffle-elision fast path: one PARQUET FILE per call, extract +
    document stages fused in a single stateful actor.

    Valid ONLY under the documented partitioning assumption
    ``cfg.assume_conv_aligned``: every conversation's turns live in exactly
    one input file (the standard layout for transcript corpora written per
    conversation range). Then conv co-location already holds at read time
    and the conv_id exchange can be elided entirely — the 100 TB topology
    becomes embarrassingly parallel per file, and measured throughput
    reaches the machine's multiprocessing ceiling. For unaligned input use
    the general ``build_extraction`` groupby path.

    The actor is the A1/A2 stateful slot (structure_engine.py:30-63): kernel
    pattern banks and parser state are built once per actor in __init__.
    """

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG,
                 columns: tuple[str, ...] = ("conv_id", "turn_idx", "text"),
                 out_dir: str | None = None,
                 config_hash: str | None = None,
                 input_root: str | None = None):
        from raydoc.stages.document_stage import document_rows_from_raw
        self._extractor = ExtractorActor(cfg=cfg)
        self._doc_raw = document_rows_from_raw
        self._cfg = cfg
        self._columns = list(columns)
        self._out_dir = out_dir
        self._config_hash = config_hash
        self._input_root = input_root

    def _process_file(self, path: str) -> pa.Table:
        import pyarrow.parquet as pq
        t = pq.read_table(path, columns=self._columns)
        # in-process handoff: elements stay plain Python dicts (no Arrow
        # struct round-trip — that cost exists only to cross the shuffle)
        return self._doc_raw(self._extractor.extract_raw(t), self._cfg)

    def _process_and_write(self, path: str) -> pa.Table:
        """file in → file out (atomic tmp+rename) + manifest; returns a
        one-row metrics table (the dataset's visible output)."""
        import time as _time

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from raydoc.state import manifest as mstate

        t0 = _time.perf_counter()
        out = self._process_file(path)
        opath, _ = mstate.file_output_paths(self._out_dir, path,
                                            self._input_root)
        tmp = opath + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, opath)
        wall = _time.perf_counter() - t0
        rows = out.num_rows
        metrics = {
            "rows": rows,
            "conversations": len(pc.unique(out.column("conv_id"))) if rows else 0,
            "parse_failures": (pc.sum(pc.cast(out.column("parse_failed"),
                                              "int64")).as_py() or 0) if rows else 0,
            "mean_strip_ratio": round(
                (pc.mean(out.column("strip_ratio")).as_py() or 0.0), 6) if rows else 0.0,
            "wall_sec": round(wall, 3),
            "turns_per_sec": round(rows / wall, 2) if wall > 0 else None,
        }
        mstate.write_file_manifest(self._out_dir, path,
                                   config_hash=self._config_hash,
                                   metrics=metrics,
                                   input_root=self._input_root)
        return pa.table({
            "input_file": pa.array([os.path.basename(path)], pa.string()),
            "rows": pa.array([rows], pa.int64()),
            "parse_failures": pa.array([metrics["parse_failures"]], pa.int64()),
            "mean_strip_ratio": pa.array([metrics["mean_strip_ratio"]],
                                         pa.float64()),
            "wall_sec": pa.array([metrics["wall_sec"]], pa.float64()),
            "error": pa.array([None], pa.string()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._out_dir:
            outs = [self._process_file(p)
                    for p in batch.column("path").to_pylist()]
            return pa.concat_tables(outs) if outs else self._process_file_empty()
        # job mode: per-FILE failure isolation (≙ the reference's per-page
        # try/except, structure_engine.py:442-445, lifted to the file level):
        # a corrupt/unreadable input yields a failure metrics row, never a
        # dead task — and no manifest, so a rerun retries exactly that file.
        outs = []
        for p in batch.column("path").to_pylist():
            try:
                outs.append(self._process_and_write(p))
            except Exception as exc:  # noqa: BLE001
                outs.append(pa.table({
                    "input_file": pa.array([os.path.basename(p)], pa.string()),
                    "rows": pa.array([0], pa.int64()),
                    "parse_failures": pa.array([0], pa.int64()),
                    "mean_strip_ratio": pa.array([0.0], pa.float64()),
                    "wall_sec": pa.array([0.0], pa.float64()),
                    "error": pa.array([f"{type(exc).__name__}: {exc}"[:200]],
                                      pa.string()),
                }))
        return pa.concat_tables(outs)

    def _process_file_empty(self) -> pa.Table:
        # column types come from the canonical transcript schema (not a
        # blanket string default) so a non-string column — ts, a future
        # numeric field — round-trips through an empty file correctly
        from raydoc.schema import TRANSCRIPTS_SCHEMA
        empty = pa.table({
            c: pa.array([], TRANSCRIPTS_SCHEMA.field(c).type
                        if TRANSCRIPTS_SCHEMA.get_field_index(c) >= 0
                        else pa.string())
            for c in self._columns})
        return self._doc_raw(self._extractor.extract_raw(empty), self._cfg)


class ExtractorActor:
    """text → normalized text + element IR, one Arrow batch per call."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        # Heavy setup happens once per actor: importing the kernel modules
        # compiles every pattern bank in this worker process.
        from raydoc.kernels.document import build_turn_elements, extract_turn_text
        self._extract = extract_turn_text
        self._build = build_turn_elements
        self._cfg = cfg

    def extract_raw(self, batch: pa.Table) -> dict:
        """Per-turn extraction with elements as plain Python dict lists —
        the in-process handoff for the fused path (no Arrow struct
        round-trip)."""
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
            # defensive: a null conv_id must not kill the task (it groups
            # under the empty key instead)
            h = int(hashlib.md5((conv_id or "").encode()).hexdigest()[:8], 16)
            parts.append(h % n_parts)
            skeys.append(h % (n_parts * fineness))
            try:
                normalized, html_flag, ratio = self._extract(text or "")
                elements_col.append(self._build(normalized, self._cfg))
                was_html.append(html_flag)
                strip_ratio.append(ratio)
                parse_failed.append(False)
            except Exception:
                elements_col.append([])
                was_html.append(False)
                strip_ratio.append(0.0)
                parse_failed.append(True)

        return {
            "conv_id": [c or "" for c in conv_ids],
            "turn_idx": batch.column("turn_idx").to_pylist(),
            "elements": elements_col,
            "was_html": was_html,
            "strip_ratio": strip_ratio,
            "parse_failed": parse_failed,
            "part": parts,
            "shuffle_key": skeys,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = self.extract_raw(batch)
        import pickle
        # Wire format for the element IR across the shuffle: one pickled
        # blob per turn. Measured 6x cheaper round-trip than the Arrow
        # struct encoding (0.05 vs 0.31 ms/turn — ~20% of the document
        # stage's CPU); the logical schema stays documented as
        # schema.ELEMENT_TYPE and the aligned-vs-general path-equality
        # test guards the boundary semantics.
        return pa.table({
            "conv_id": pa.array(raw["conv_id"], pa.string()),
            "turn_idx": pa.array(raw["turn_idx"], pa.int32()),
            "elements": pa.array(
                [pickle.dumps(elems, protocol=5)
                 for elems in raw["elements"]], pa.binary()),
            "was_html": pa.array(raw["was_html"], pa.bool_()),
            "strip_ratio": pa.array(raw["strip_ratio"], pa.float32()),
            "parse_failed": pa.array(raw["parse_failed"], pa.bool_()),
            "part": pa.array(raw["part"], pa.int32()),
            "shuffle_key": pa.array(raw["shuffle_key"], pa.int32()),
        })
