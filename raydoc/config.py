"""Typed configuration for the extraction pipeline.

Collects every threshold the reference scatters as literals (SURVEY.md §2.11):
column gap (layout_analyzer.py:15), repeater thresholds (noise_filter.py:63,
cleaner.py:15), confidence thresholds (confidence_tracker.py:34), caption
proximity (caption_extractor.py:37), quality-gate limits
(validation_framework.py:297-314), page geometry defaults
(semantic_annotator.py:15, caption_extractor.py:221).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- noise / repeater detection (noise_filter.py:62-77) ---
    repeater_threshold: float = 0.5
    min_turns_for_repeaters: int = 3
    repeater_zone: float = 0.33          # top/bottom band fraction
    repeater_max_len: int = 100

    # --- cleaner-variant repeater detection, kept behind a flag (cleaner.py:15) ---
    use_cleaner_repeaters: bool = False
    cleaner_repeater_threshold: float = 0.6

    # --- confidence (confidence_tracker.py:34; layout_analyzer.py:397) ---
    low_confidence: float = 0.7
    critical_confidence: float = 0.5
    artifact_confidence: float = 0.3

    # --- layout (layout_analyzer.py:15) ---
    column_gap: int = 50
    use_enhanced_classification: bool = True

    # --- linking (caption_extractor.py:37, 195) ---
    caption_proximity: float = 100.0
    footnote_bottom: float = 0.8

    # --- page geometry for text-derived elements ---
    page_height: float = 800.0

    # --- quality gate (validation_framework.py:297-314) ---
    quality_threshold: float = 0.6
    max_hallucinations: int = 0
    max_errors: int = 2
    min_content_lines: int = 5
    # Bounded engine-fallback hop (SURVEY §7.4.7; ≙ app.py:284-288): a
    # gate-failed document re-extracts ONCE through the named document
    # variant (kernels/registry.py). Off by default — the per-document
    # equality surface mirrors the reference's EnhancedPipeline, which
    # does not itself fall back (the app layer does); enable via config
    # or the job CLI's --gate-fallback.
    enable_gate_fallback: bool = False
    fallback_variant: str = "legacy"

    # --- pipeline toggles (enhanced_pipeline.py:43-60) ---
    enable_noise_filter: bool = True
    enable_caption_extraction: bool = True
    enable_semantic_annotation: bool = True
    tag_mode: bool = True                # Tag-Don't-Remove (noise_filter.py:87)

    # --- execution knobs (Ray side; not semantics) ---
    extract_batch_size: int = 512
    extract_concurrency: int | tuple[int, int] | None = None
    num_output_partitions: int = 32
    # General-mode crash granularity: partitions process in this many
    # sequential waves, each ending with its manifests stamped — a crash
    # loses at most one wave. 1 = single barrier (fastest); raise for long
    # jobs where restartability matters more than the extra read+barrier
    # per wave. (Aligned mode checkpoints per FILE and ignores this.)
    checkpoint_waves: int = 1
    # document-stage shuffle buckets = num_output_partitions × fineness;
    # finer than the checkpoint unit so reduce parallelism and straggler
    # mitigation don't depend on the (coarse) resume granularity.
    # 8 measured best at 16-32 CPUs (BASELINE.md round-2 A/B: +6-12% over 4
    # at 16 CPUs, ~flat at 4 CPUs).
    shuffle_fineness: int = 8
    # Partitioning assumption enabling shuffle elision: every conversation's
    # turns live in ONE input file (transcript corpora are typically written
    # per conversation range). When True the job uses the fused per-file
    # actor pipeline (no conv_id exchange); when False the general
    # groupby(shuffle_key) path runs. See stages/extract.py FusedFileActor.
    assume_conv_aligned: bool = False
    # General-path exchange strategy. "sort": Ray's pull-based sort shuffle
    # (groupby(shuffle_key) — no extra moving parts, but its fixed
    # sample/sort barrier term caps measured scaling efficiency at ~0.6).
    # "bucketed": two-stage disk-backed hash exchange — stage 1 streams
    # extractor output into per-bucket Arrow IPC fragments (O(1) per
    # batch, no sampling, no sort, no long-lived reducer actors so no
    # HASH_SHUFFLE/actor-pool deadlock), stage 2 processes each bucket as
    # an independent task. On a multi-node cluster the spill root must be
    # shared storage (object store / NFS) — the standard external-shuffle
    # topology (map writes bucket files, reduce reads them), which also
    # makes the exchange itself resumable (stage-1 token marker).
    # Measured (BASELINE.md round 5): bucketed beats sort at every point
    # (16 CPUs: 11.8-12.6k vs 10.6k turns/s) so it is the default;
    # "sort" remains the zero-moving-parts fallback.
    exchange: str = "bucketed"
    # bucketed-exchange buckets = num_output_partitions × spill_fineness
    # (a multiple of the partition count keeps bucket → part consistent);
    # fine enough for reduce-side work stealing, coarse enough to bound
    # fragment counts.
    spill_fineness: int = 2
    # Batch size of the fused stage-1 actor (extract + spill per call).
    # Trade-off: fragment count ≈ (rows / spill_batch_rows) × buckets-
    # touched-per-batch, but batch count must stay ≫ actor count for
    # load balance — 8192 left only 15 batches for 14 actors at 16 CPUs
    # (a 2-batch straggler tail, stage-1 efficiency 0.54); 2048 gives a
    # ~1/4-batch tail. At much larger corpus sizes raise it (more rows
    # per fragment, batch count stays ≫ actors automatically).
    spill_batch_rows: int = 2048
    include_doc_markdown: bool = False   # carry full doc markdown on turn 0 rows
    # Skew guard (SURVEY.md §7.4.5): the document stage co-locates a whole
    # conversation, assuming turns/conv ≪ block size. A pathological
    # million-turn conversation is processed in turn_idx-ordered chunks of
    # this many turns instead of one giant kernel call — cross-turn context
    # (repeaters, linking, doc markdown) becomes chunk-local and every row
    # of the conversation is flagged (fallback_applied=True,
    # suggested_action="oversize_conversation_chunked"), so the contract is
    # enforced and visible, never silently assumed. None disables the guard.
    max_turns_per_conv: int | None = 10_000


DEFAULT_CONFIG = PipelineConfig()
