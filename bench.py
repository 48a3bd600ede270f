#!/usr/bin/env python
"""Benchmark harness for the raydoc engine.

Default mode runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "raydoc_bench_total", "value": <total sec>, "unit": "sec",
     "queries": {"extract_turns": sec, ...}, "sf": 0.1, "num_cpus": 32,
     "extract_turns_per_sec": ..., "extract_rows": ...}

The default mode is SHARDED: the parent process owns no Ray session and
fans the query list out to a handful of fresh-process workers (plus one
worker for the headline jobs), merging their incremental per-query timing
lines into the single JSON result. Rationale: Ray 2.49.2 has a
nondeterministic core race (``reference_count.cc:581 Check failed:
submitted_task_ref_count > 0``) that can abort a session which
creates/destroys hundreds of Datasets; one long session lost the whole
round-3 bench to it. With sharding, a crashed worker costs only its
unfinished queries, which are re-queued into new processes (halving the
chunk, bounded attempts) — a flaky abort can no longer zero the bench.
``--one-process`` restores the old single-session behavior.

``--scaling`` runs the headline extraction job in FRESH processes at two
parallelism levels (default 8 and 32; override with ``--lo/--hi`` — e.g.
``--lo 4 --hi 16`` measures the unsaturated regime, where the host's
shared memory bus doesn't cap speedup) and reports both throughputs plus
scaling efficiency = (thr_hi/thr_lo)/(hi/lo); the sandbox stand-in for the
N-node vs 4N-node cluster criterion (BASELINE.json), recorded in
BASELINE.md along with the host's multiprocessing ceiling.

Internal worker modes: ``--headline-only`` (per-process worker for
--scaling), ``--run-chunk`` (query-chunk worker), ``--headline-bench``
(headline + training-corpus worker for the sharded default).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Queries from __ray_entry__.queries() to time in the full bench, in run
# order. extract_turns (the flagship) is timed separately via run_job so the
# number includes the checkpointed parquet write + manifests.
BENCH_QUERIES = [
    "m4_downsample",
    "value_changepoint",
    "holt_forecast_hourly",
    "hourly_gaps",
    "session_entry_stats",
    "quantile_normalize",
    "event_type_stationary",
    "interevent_gap_percentiles",
    "hour_of_week_profile",
    "dedup_cluster_histogram",
    "user_activity_histogram",
    "conversation_structure",
    "mannwhitney_value",
    "vocab_growth",
    "token_fertility",
    "dup_source_matrix",
    "cdc_chunk_stats",
    "orders_merge_upsert",
    "orders_table_changes",
    "orders_schema_evolution",
    "orders_point_lookup",
    "catalog_txn_snapshot",
    "catalog_cdc_stream",
    "knn_geodesic",
    "label_propagation",
    "ann_recall_report",
    "seasonal_hour_deviation",
    "term_label_chi2",
    "ngram_containment",
    "value_robust_scale",
    "loss_mask_spans",
    "incremental_neardup_stats",
    "textrank_windows",
    "orders_gdpr_delete",
    "events_matview",
    "curriculum_order",
    "pack_conversations",
    "csv_roundtrip_stats",
    "avro_roundtrip_stats",
    "value_regression_tree",
    "benford_values",
    "cohen_kappa",
    "association_rules",
    "trailing_hour_value",
    "neardup_kcore",
    "attribution_linear",
    "orders_time_travel",
    "audio_corpus_stats",
    "orc_roundtrip_stats",
    "warc_roundtrip_stats",
    "star_flatten",
    "jsonl_gz_roundtrip_stats",
    "als_item_factors",
    "dedup_conversations",
    "entity_resolution",
    "building_orders_full_join",
    "line_priority_counts",
    "dominant_part_suppliers",
    "pseudonymize_users",
    "value_acf_by_type",
    "top_session_paths",
    "conversion_latency",
    "bloom_filtered_revenue",
    "colocated_order_revenue",
    "kfold_split",
    "canonical_urls",
    "audience_overlap_hll",
    "mmr_diverse_topk",
    "event_rate_cusum",
    "jsonl_export_meta",
    "pricing_summary",
    "filter_project",
    "distinct_flags",
    "revenue_by_nation",
    "top_orders",
    "top_events",
    "customer_order_stats",
    "click_error_matrix",
    "brand_volume",
    "hourly_event_stats",
    "sliding_event_stats",
    "late_event_stats",
    "sessionize",
    "events_with_prev",
    "value_percentiles",
    "asof_last_view",
    "clicks_after_error",
    "dedup_exact",
    "minhash_clusters",
    "simhash_signatures",
    "simhash_neardups",
    "ngram_jaccard",
    "embedding_neardups",
    "embedding_neardups_clustered",
    "supplier_by_nation",
    "user_topk_events",
    "pdf_dates",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_kmeans",
    "stratified_sample",
    "token_counts",
    "bpe_token_counts",
    "json_props_stats",
    "redact_pii",
    "paragraph_dedup_stats",
    "markdown_to_txt",
    "markdown_to_html",
    "docx_meta",
    "train_test_split",
    "shuffle_sample",
    "quality_counters",
    "gopher_quality",
    "ngram_logprob",
    "fingerprints",
    "winnowing_fingerprints",
    "winnowing_shared_pairs",
    "ngram_novelty_curve",
    "quoted_sentences",
    "rare_token_docs",
    "k_anonymity_report",
    "markdown_structure_stats",
    "image_corpus_stats",
    "l_diversity_report",
    "hourly_duplicate_rate",
    "ship_latency_percentiles",
    "cross_source_gram_overlap",
    "language_id",
    "validate_docs",
    "html_docs",
    "distinct_users",
    "distinct_users_hll",
    "heavy_hitter_users",
    "cms_user_counts",
    "cms_error_report",
    "media_meta",
    "normalize_markdown",
    "extract_turns_checksum",
    "status_priority_pivot",
    "rollup_pricing",
    "customers_semi_f",
    "customers_anti_f",
    "order_status_except",
    "user_running_value",
    "pack_sequences",
    "decontaminate",
    "paragraph_dedup_global",
    "tfidf_top_terms",
    "funnel_counts",
    "value_percentiles_sketch",
    "distinct_users_by_type",
    "distinct_users_by_type_hll",
    "value_percentiles_by_type_sketch",
    "neardup_components",
    "cube_orders",
    "profile_events",
    "weighted_sample",
    "user_type_pagerank",
    "bloom_novel_docs",
    "global_rank_ntile",
    "order_status_intersect",
    "collapse_repeats",
    "median_by_type",
    "orders_upsert",
    "cohort_retention",
    "value_histogram",
    "dup_ngram_fraction",
    "neardup_triangles",
    "embedding_pca",
    "resample_ffill",
    "inverted_index",
    # round-3 third-session operators
    "event_transitions",
    "value_outliers",
    "covariance_by_type",
    "global_percent_rank",
    "user_moving_sum",
    "latest_user_event",
    "debounced_events",
    "status_priority_sets",
    "neardup_dedup_corpus",
    "pmi_collocations",
    "fuzzy_name_pairs",
    "compression_ratio",
    "zonemap_value_scan",
    "incremental_hourly_stats",
    "hourly_distinct_users",
    "ann_pq_topk",
    "embedding_logreg",
    "user_time_window_sum",
    "user_favorite_type",
    "domain_mix",
    "status_priority_unpivot",
    "corpus_quality_report",
    "strip_dup_ngrams",
    "knn_graph",
    "label_knn_accuracy",
    "label_distance_matrix",
    "local_supplier_volume",
    "orders_above_avg",
    "customer_order_dist",
    "semantic_dedup",
    "label_centroids",
    "chunk_documents",
    "value_mad_by_type",
    "user_event_sequence",
    "semantic_clusters",
    "type_percent_rank",
    "constraint_report",
    "zorder_box_scan",
    "session_outage_overlap",
    "value_trend_by_type",
    "cheapest_supplier_per_part",
    "rich_inactive_customers",
    "user_value_ewma",
    "bm25_search",
    "skyline_orders",
    "top_supplier_revenue",
    "audience_jaccard",
    "neardup_hops",
    "order_status_intersect_all",
    "order_status_except_all",
    "resample_linear",
    "type_triple_support",
    "user_type_gini",
    "ab_test_chi2",
    "rrf_fusion",
    "value_target_encode",
    "orders_checksum",
    "user_longest_streak",
    "orders_scd2",
    "orders_scd2_snapshot",
    "domain_temperature_sample",
    "uniform_sample_md5",
    "url_path_rollup",
    "value_hour_corr",
    "embedding_dbscan",
    "sliding_distinct_users",
    "type_drift_cells",
    "bpe_learn_merges",
    "p90_by_type",
    "p75_cont_by_type",
    "value_winsorized",
    "value_decile",
    "merged_intervals",
    "late_shipment_orders",
    "promo_revenue",
    "snapshot_diff",
    "bpe_encode",
    "shipping_priority",
    "returned_item_customers",
    "large_volume_customers",
    "bracket_revenue",
    "profit_by_nation",
    "volume_shipping",
    "market_share",
    "discount_band_revenue",
    "top_part_revenue_share",
    "supplier_count_by_part",
    "lone_return_suppliers",
    "unicode_normalize",
    "lexical_diversity",
    "value_band_pairs",
    "asof_nearest_view",
    "phash_neardups",
    "phash_clusters",
    "top_terms_by_lang",
    "extract_mentions",
    "pii_by_source",
    "value_iqr_outliers",
    "user_time_weighted_avg",
    "user_peak_concurrency",
    "asof_recent_view",
    "event_trigrams",
    "orders_apply_changes",
    "user_rfm_segments",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _init_ray(num_cpus: int) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def prepare_transcripts(sf_dir: str, out_dir: str, shards: int = 32,
                        replicate: int = 1) -> str:
    """Materialize the deterministic transcript corpus derived from the
    driver's documents table as SHARDED parquet (one file per conv range) so
    read_parquet yields enough blocks for full parallelism. ``replicate``
    appends a suffix to conv_id per copy (distinct conversations) to scale
    the corpus for the scaling-efficiency measurement."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from raydoc.sources.transcripts import transcripts_from_documents

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    table = transcripts_from_documents(docs, turns_per_conv=6)
    n = table.num_rows
    step = max(1, (n + shards - 1) // shards)
    # shard on row ranges; conversations are contiguous in generation order
    # and a conv never spans a shard boundary (6 turns per conv, step % 6
    # enforced) so the conv_id groupby shuffle stays balanced.
    step = ((step + 5) // 6) * 6
    cidx = table.schema.get_field_index("conv_id")
    part = 0
    for rep in range(replicate):
        t = table
        if replicate > 1:
            t = t.set_column(cidx, "conv_id", pc.binary_join_element_wise(
                t.column("conv_id").cast("string"), f"r{rep}", "-"))
        i = 0
        while i < n:
            pq.write_table(t.slice(i, step),
                           os.path.join(out_dir, f"shard-{part:04d}.parquet"))
            i += step
            part += 1
    with open(marker, "w") as f:
        f.write(str(n * replicate))
    return out_dir


def run_headline(transcripts_dir: str, out_dir: str,
                 mode: str = "general") -> dict:
    """The flagship job: transcripts → extraction → checkpointed partitioned
    parquet write. mode="general" uses the actor-pool + conv_id-shuffle
    pipeline (arbitrary input layout); mode="aligned" uses the
    shuffle-elision fused pipeline (documented partitioning assumption:
    conversations never span input files — true for this corpus)."""
    from dataclasses import replace
    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.extract_pipeline import run_job
    overrides: dict = {"assume_conv_aligned": mode == "aligned"}
    # experiment knobs for the scaling investigation (BASELINE.md)
    if os.environ.get("RAYDOC_SHUFFLE_FINENESS"):
        overrides["shuffle_fineness"] = int(os.environ["RAYDOC_SHUFFLE_FINENESS"])
    if os.environ.get("RAYDOC_EXTRACT_CONCURRENCY"):
        overrides["extract_concurrency"] = int(os.environ["RAYDOC_EXTRACT_CONCURRENCY"])
    if os.environ.get("RAYDOC_OUTPUT_PARTITIONS"):
        overrides["num_output_partitions"] = int(os.environ["RAYDOC_OUTPUT_PARTITIONS"])
    if os.environ.get("RAYDOC_EXCHANGE"):
        overrides["exchange"] = os.environ["RAYDOC_EXCHANGE"]
    cfg = replace(DEFAULT_CONFIG, **overrides)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    report = run_job(transcripts_dir, out_dir, cfg=cfg, resume=False)
    wall = time.perf_counter() - t0
    return {"rows": report["rows_written"], "wall_sec": round(wall, 3),
            "turns_per_sec": round(report["rows_written"] / wall, 2)}


def _consume(result) -> int:
    """Force full execution of a query result; return row count."""
    import pyarrow as pa
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        return result.count()
    if isinstance(result, pa.Table):
        return result.num_rows
    return len(result)


def _run_queries(sf_dir: str, names: list[str],
                 emit: bool = False) -> dict[str, float]:
    """Time each named queries() entry in the CURRENT Ray session. With
    ``emit``, print one ``##Q {json}`` line per query as it completes so a
    mid-run Ray-core crash loses nothing already measured."""
    import __ray_entry__ as entrymod
    qs = entrymod.queries()

    # one tiny dataset op so Ray Data session warmup (~2-4 s: executor,
    # worker start) isn't billed to the first query
    import ray.data as _rd
    _rd.range(1000).map_batches(lambda b: b).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        try:
            _consume(fn(sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failed query is reported, not fatal
            timings[name] = -1.0
            print(f"# bench query {name} failed: {exc}", file=sys.stderr)
        if emit:
            print("##Q " + json.dumps({"name": name, "sec": timings[name]}),
                  flush=True)
    return timings


def _headline_and_corpus(sf_dir: str) -> tuple[dict, dict]:
    """Headline extraction jobs + composed training-corpus pipeline in the
    CURRENT Ray session. Returns (timings, headline summary fields).

    INTERLEAVED best-of-2 per mode (general, aligned, general, aligned):
    the sandbox host's load drifts ±40% on the minutes scale, so a single
    timing of either mode is noise — the repo-wide measurement rule
    (BASELINE.md / CLAUDE.md)."""
    timings: dict[str, float] = {}
    tdir = prepare_transcripts(
        sf_dir, f"/tmp/raydoc_bench_transcripts_{_sf_of(sf_dir)}")
    runs: dict[str, list[dict]] = {"general": [], "aligned": []}
    for mode in ("general", "aligned", "general", "aligned"):
        t0 = time.perf_counter()
        r = run_headline(tdir, f"/tmp/raydoc_bench_out_{mode}", mode=mode)
        r["timed"] = round(time.perf_counter() - t0, 3)
        runs[mode].append(r)
    headline = max(runs["general"], key=lambda r: r["turns_per_sec"])
    headline_aligned = max(runs["aligned"], key=lambda r: r["turns_per_sec"])
    timings["extract_turns"] = headline["timed"]
    timings["extract_turns_aligned"] = headline_aligned["timed"]

    # the composed downstream pipeline (extract → quality filter → dedup →
    # split → partitioned write)
    from dataclasses import replace
    from raydoc.config import DEFAULT_CONFIG
    from raydoc.pipelines.training_corpus import build_training_corpus
    shutil.rmtree("/tmp/raydoc_bench_corpus", ignore_errors=True)
    t0 = time.perf_counter()
    corpus_stats = build_training_corpus(
        tdir, "/tmp/raydoc_bench_corpus",
        cfg=replace(DEFAULT_CONFIG, assume_conv_aligned=True))
    timings["training_corpus"] = round(time.perf_counter() - t0, 3)

    fields = {
        "extract_rows": headline["rows"],
        "extract_wall_sec": headline["wall_sec"],
        "extract_turns_per_sec": headline["turns_per_sec"],
        "extract_aligned_wall_sec": headline_aligned["wall_sec"],
        "extract_aligned_turns_per_sec": headline_aligned["turns_per_sec"],
        "corpus_rows": corpus_stats["rows"],
        "corpus_train_rows": corpus_stats["train_rows"],
    }
    return timings, fields


def full_bench(sf_dir: str, num_cpus: int) -> dict:
    """Single-session bench (the pre-round-4 behavior; ``--one-process``)."""
    _init_ray(num_cpus)
    timings = _run_queries(sf_dir, BENCH_QUERIES)
    # headline jobs LAST so actor-pool teardown doesn't pollute the first
    # query timings
    h_timings, fields = _headline_and_corpus(sf_dir)
    timings.update(h_timings)
    total = round(sum(v for v in timings.values() if v > 0), 3)
    return {
        "metric": "raydoc_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        **fields,
    }


def chunk_worker(sf_dir: str, num_cpus: int, names: list[str]) -> None:
    """``--run-chunk`` worker: fresh Ray session, incremental ##Q lines."""
    crash_after = int(os.environ.get("RAYDOC_BENCH_CRASH_AFTER", "-1"))
    if crash_after >= 0:  # test hook simulating the Ray-core session abort
        names, rest = names[:crash_after], names[crash_after:]
        _init_ray(num_cpus)
        _run_queries(sf_dir, names, emit=True)
        if rest:
            os._exit(134)
        return
    _init_ray(num_cpus)
    _run_queries(sf_dir, names, emit=True)


def headline_worker(sf_dir: str, num_cpus: int) -> None:
    """``--headline-bench`` worker: fresh Ray session, one ##H line."""
    _init_ray(num_cpus)
    timings, fields = _headline_and_corpus(sf_dir)
    print("##H " + json.dumps({"timings": timings, **fields}), flush=True)


def _collect_marked(stdout: str, mark: str) -> list[dict]:
    out = []
    for line in stdout.splitlines():
        if line.startswith(mark):
            try:
                out.append(json.loads(line[len(mark):]))
            except json.JSONDecodeError:
                pass
    return out


def sharded_bench(sf_dir: str, num_cpus: int, chunk_size: int = 55) -> dict:
    """Default mode: fan BENCH_QUERIES out to fresh-process workers so the
    flaky Ray 2.49.2 ``reference_count.cc:581`` session abort (triggered by
    hundreds of Dataset create/teardowns in one session) can only cost the
    unfinished queries of one worker, which are re-queued (chunk halved,
    ≤3 attempts per query) into new processes. The parent owns no Ray
    session. Output schema is identical to the single-session bench."""
    import subprocess

    me = os.path.abspath(__file__)
    timings: dict[str, float] = {}
    pending = [BENCH_QUERIES[i:i + chunk_size]
               for i in range(0, len(BENCH_QUERIES), chunk_size)]
    attempts: dict[str, int] = {}
    while pending:
        chunk = [n for n in pending.pop(0) if n not in timings]
        if not chunk:
            continue
        cmd = [sys.executable, me, "--run-chunk",
               "--queries", ",".join(chunk),
               "--sf-dir", sf_dir, "--num-cpus", str(num_cpus)]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=2400)
            stdout, rc, stderr = proc.stdout, proc.returncode, proc.stderr
        except subprocess.TimeoutExpired as exc:
            stdout = (exc.stdout or b"").decode(errors="replace") \
                if isinstance(exc.stdout, bytes) else (exc.stdout or "")
            rc, stderr = -9, "chunk worker timed out"
        for rec in _collect_marked(stdout, "##Q "):
            timings[rec["name"]] = rec["sec"]
        if rc != 0:
            lost = [n for n in chunk if n not in timings]
            print(f"# chunk worker rc={rc}; {len(lost)} queries lost, "
                  f"requeueing\n{stderr[-2000:]}", file=sys.stderr)
            retry = []
            for n in lost:
                attempts[n] = attempts.get(n, 0) + 1
                if attempts[n] >= 3:
                    timings[n] = -1.0
                else:
                    retry.append(n)
            if len(retry) > 1:  # halve so a poisoned chunk converges
                mid = len(retry) // 2
                pending[:0] = [retry[:mid], retry[mid:]]
            elif retry:
                pending.insert(0, retry)

    fields: dict = {}
    for attempt in range(2):  # headline worker, retried once on a crash
        cmd = [sys.executable, me, "--headline-bench",
               "--sf-dir", sf_dir, "--num-cpus", str(num_cpus)]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=3600)
            marked = _collect_marked(proc.stdout, "##H ")
        except subprocess.TimeoutExpired:
            marked = []
            proc = None
        if marked:
            h = marked[-1]
            timings.update(h.pop("timings"))
            fields = h
            break
        print("# headline worker failed"
              + (f" rc={proc.returncode}\n{proc.stderr[-2000:]}" if proc
                 else " (timeout)"), file=sys.stderr)

    total = round(sum(v for v in timings.values() if v > 0), 3)
    return {
        "metric": "raydoc_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "sharded": True,
        **fields,
    }


def headline_only(sf_dir: str, num_cpus: int, replicate: int = 1,
                  mode: str = "general") -> dict:
    _init_ray(num_cpus)
    tdir = prepare_transcripts(
        sf_dir, f"/tmp/raydoc_bench_transcripts_{_sf_of(sf_dir)}_x{replicate}",
        replicate=replicate)
    # same warmup the query runner uses: Ray Data session/executor start
    # (~2 s) is a fixed per-process cost, not pipeline work — billing it
    # to the job skews the lo-vs-hi scaling ratio (17% of an 11 s hi
    # wall vs 6% of a 32 s lo wall)
    import ray.data as _rd
    _rd.range(1000).map_batches(lambda b: b).count()
    out = run_headline(tdir, f"/tmp/raydoc_scaling_out_{num_cpus}_{mode}",
                       mode=mode)
    out["num_cpus"] = num_cpus
    out["mode"] = mode
    return out


def _hw_work(_):
    import re as _re
    pat = _re.compile(r"\b\w+\b")
    s = "the quick brown fox jumps-over the lazy dog " * 50
    t0 = time.perf_counter()
    for _ in range(2000):
        pat.findall(s)
    return time.perf_counter() - t0


def _hw_ceiling(lo: int, hi: int) -> float:
    """This box's best-case lo→hi scaling for ANY CPU-bound work: the same
    regex microbenchmark under plain multiprocessing. All-core turbo/memory
    bandwidth limits mean even embarrassingly parallel code scales below
    1.0 here; on a real N→4N-node cluster each node keeps its own memory
    bus, so engine efficiency should be read relative to this ceiling."""
    import multiprocessing as mp

    work = _hw_work
    thr = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            t0 = time.perf_counter()
            p.map(work, range(n * 4))
            thr[n] = n * 4 / (time.perf_counter() - t0)
    return round((thr[hi] / thr[lo]) / (hi / lo), 3)


def scaling(sf_dir: str, lo: int = 8, hi: int = 32, replicate: int = 4) -> dict:
    """Fresh-process runs at two parallelism levels (the sandbox stand-in
    for N-node vs 4N-node clusters, per BASELINE.md), for BOTH pipeline
    modes. The corpus is replicated so compute dominates fixed
    startup/shuffle-barrier costs."""
    per_mode: dict[str, dict] = {}
    for mode in ("aligned", "general"):
        attempts: dict[int, list[dict]] = {lo: [], hi: []}
        # interleave lo/hi attempts (the shared sandbox host's load drifts
        # on the minutes scale — interleaving exposes both points to the
        # same conditions), keep best-of-2 per point
        for n in (lo, hi, lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=sf_dir)
            proc = subprocess_run(
                [sys.executable, os.path.abspath(__file__),
                 "--headline-only", "--replicate", str(replicate),
                 "--mode", mode],
                env=env)
            attempts[n].append(json.loads(proc.strip().splitlines()[-1]))
        results = {n: max(a, key=lambda r: r["turns_per_sec"])
                   for n, a in attempts.items()}
        thr_lo = results[lo]["turns_per_sec"]
        thr_hi = results[hi]["turns_per_sec"]
        per_mode[mode] = {
            "efficiency": round((thr_hi / thr_lo) / (hi / lo), 3) if thr_lo else None,
            "lo_turns_per_sec": thr_lo, "hi_turns_per_sec": thr_hi,
            "lo_wall_sec": results[lo]["wall_sec"],
            "hi_wall_sec": results[hi]["wall_sec"],
            "rows": results[hi]["rows"],
        }
    ceiling = _hw_ceiling(lo, hi)
    eff = per_mode["aligned"]["efficiency"]
    return {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "lo_cpus": lo, "hi_cpus": hi,
        "modes": per_mode,
        "hw_ceiling": ceiling,
        "normalized_efficiency": round(eff / ceiling, 3) if eff and ceiling else None,
        "sf": _sf_of(sf_dir),
    }


def subprocess_run(cmd: list[str], env: dict) -> str:
    import subprocess
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"worker failed:\n{proc.stderr[-4000:]}")
    return proc.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--one-process", action="store_true",
                    help="single-session bench (pre-round-4 behavior)")
    ap.add_argument("--run-chunk", action="store_true",
                    help="internal: query-chunk worker")
    ap.add_argument("--headline-bench", action="store_true",
                    help="internal: headline+corpus worker")
    ap.add_argument("--queries", default="",
                    help="comma-separated query names for --run-chunk")
    ap.add_argument("--chunk-size", type=int, default=55)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    # criterion pair N -> 4N. Default 4 -> 16 rather than 8 -> 32: this
    # host's shared memory bus saturates past ~16 active cores (the
    # in-run multiprocessing ceiling itself reads ~0.81 at 8 -> 32, see
    # BASELINE.md), so 8 -> 32 measures the bus, not the engine. Both
    # pairs are reported in BASELINE.md.
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--mode", default="general",
                    choices=("general", "aligned"))
    args = ap.parse_args()

    if args.headline_only:
        out = headline_only(args.sf_dir, args.num_cpus, args.replicate,
                            args.mode)
    elif args.run_chunk:
        chunk_worker(args.sf_dir, args.num_cpus,
                     [n for n in args.queries.split(",") if n])
        out = None
    elif args.headline_bench:
        headline_worker(args.sf_dir, args.num_cpus)
        out = None
    elif args.scaling:
        out = scaling(args.sf_dir, args.lo, args.hi)
    elif args.one_process:
        out = full_bench(args.sf_dir, args.num_cpus)
    else:
        out = sharded_bench(args.sf_dir, args.num_cpus, args.chunk_size)
    if out is not None:
        print(json.dumps(out))

    import ray
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
