"""Generic randomized-equivalence sweep: every oracle-backed query that
reads only the events / documents / embeddings tables runs against ONE
adversarial random corpus (skewed users, tied timestamps, negative and
huge values, empty documents, unit-norm-violating embeddings) and must
hash-match its own DuckDB oracle there — not just on the fixed driver
corpus. Queries needing the TPC-H tables are exercised by the driver
gate + the dedicated join/bucket property files instead."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

def _write_corpus(tmp_path, seed):
    rng = np.random.RandomState(seed)
    n = 2500
    users = rng.zipf(1.3, n) % 31
    ts = pd.to_datetime(
        rng.randint(0, 9 * 86400, n) * 1_000_000
        + np.int64(1_700_000_000_000_000), unit="us")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click", "error", "purchase"])[
                rng.randint(0, 4, n)]),
        "value": pa.array(np.round(
            rng.standard_normal(n) * 10 ** rng.randint(0, 5, n), 2)),
        "props": pa.array(
            np.array(['{}', '{"k": 3, "plan": "pro"}', '{"k": -17}',
                      '{"plan": "free"}', '[]'])[rng.randint(0, 5, n)]),
    }), tmp_path / "events.parquet")

    vocab = ("hash join sort scan merge spark window stream batch table "
             "query index shuffle block arrow ray data actor pool "
             "http://ex.com/a click@ex.com 10.0.0.1 <b>bold</b>").split()
    nd = 150
    texts = []
    for i in range(nd):
        k = int(rng.randint(0, 80))            # includes EMPTY docs
        texts.append(" ".join(rng.choice(vocab, k)) if k else "")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(np.array(["en", "de", "fr"])[
            rng.randint(0, 3, nd)]),
        "source": pa.array(np.array(["web", "pdf", "chat"])[
            rng.randint(0, 3, nd)]),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    }), tmp_path / "documents.parquet")

    nv, d = 200, 16
    emb = rng.standard_normal((nv, d)).astype(np.float32) * 3
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 5, nv).astype(np.int32),
                          pa.int32()),
    }), tmp_path / "embeddings.parquet")
    return str(tmp_path)


@pytest.fixture(scope="module", params=[1234, 5678])
def corpus(request, tmp_path_factory):
    return _write_corpus(tmp_path_factory.mktemp("sweep"),
                         request.param)


def _sql(sf, q):
    con = duckdb.connect()
    for v in ("events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                    f"read_parquet('{sf}/{v}.parquet')")
    return con.execute(q).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False))


# Every oracle-backed query key whose engine side reads ONLY
# events/documents/embeddings (no TPC-H tables, no file sinks whose
# oracle embeds absolute fixed-corpus paths).
SWEEP = [
    # events analytics
    "ab_test_chi2", "audience_jaccard", "cohort_retention",
    "debounced_events", "distinct_users",
    "distinct_users_by_type", "event_trigrams", "events_with_prev",
    "funnel_counts", "global_rank_ntile", "heavy_hitter_users",
    "hourly_distinct_users", "hourly_event_stats",
    "incremental_hourly_stats", "json_props_stats", "kfold_split",
    "late_event_stats", "median_by_type", "merged_intervals",
    "p75_cont_by_type", "p90_by_type", "profile_events",
    "pseudonymize_users", "sessionize", "sliding_distinct_users",
    "sliding_event_stats", "stratified_sample", "top_events",
    "type_drift_cells", "type_triple_support", "user_peak_concurrency",
    "user_rfm_segments", "user_running_value", "user_time_weighted_avg",
    "user_topk_events", "user_type_gini", "user_type_pagerank",
    "value_band_pairs", "value_decile", "value_histogram",
    "value_hour_corr", "value_iqr_outliers", "value_percentiles",
    "value_target_encode", "value_trend_by_type", "value_winsorized",
    "resample_ffill", "zonemap_value_scan", "zorder_box_scan",
    "seasonal_hour_deviation", "value_robust_scale",
    "m4_downsample", "mannwhitney_value",
    "value_changepoint", "holt_forecast_hourly", "hourly_gaps", "session_entry_stats", "quantile_normalize", "event_type_stationary", "interevent_gap_percentiles",
    "hour_of_week_profile", "user_activity_histogram",
    "hourly_duplicate_rate", "cms_error_report",
    # documents / text
    "vocab_growth", "token_fertility", "dup_source_matrix",
    "token_counts", "bpe_token_counts", "quality_counters",
    "gopher_quality", "fingerprints", "lexical_diversity",
    "unicode_normalize", "redact_pii", "paragraph_dedup_stats",
    "dup_ngram_fraction", "strip_dup_ngrams", "html_docs",
    "extract_mentions", "canonical_urls", "chunk_documents",
    "inverted_index", "pmi_collocations", "top_terms_by_lang",
    "domain_mix", "dedup_exact", "dedup_cluster_histogram", "simhash_signatures", "curriculum_order",
    "pack_conversations", "term_label_chi2", "ngram_containment",
    "uniform_sample_md5", "weighted_sample", "train_test_split",
    "domain_temperature_sample", "paragraph_dedup_global",
    "pii_by_source", "corpus_quality_report", "markdown_to_txt",
    "winnowing_fingerprints", "cross_source_gram_overlap",
    "winnowing_shared_pairs", "ngram_novelty_curve",
    "quoted_sentences", "rare_token_docs", "markdown_structure_stats",
    "markdown_to_html", "pdf_dates", "collapse_repeats", "bm25_search",
    "normalize_markdown",
    # embeddings
    "ann_topk", "embedding_neardups", "knn_graph", "knn_geodesic",
    "label_propagation", "label_knn_accuracy", "label_distance_matrix",
    "label_centroids",
    "semantic_clusters", "semantic_dedup", "rrf_fusion",
    "embedding_dbscan",
    # interchange roundtrips (sink → source → checksum; commas, quotes,
    # embedded markup and URLs in text are the stress case)
    "csv_roundtrip_stats", "avro_roundtrip_stats", "orc_roundtrip_stats",
    "warc_roundtrip_stats", "jsonl_gz_roundtrip_stats", "media_meta",
]


@pytest.mark.parametrize("name", SWEEP)
def test_query_matches_oracle_on_random_corpus(ray_session, corpus, name):
    import __ray_entry__ as e
    fn = e.queries()[name]
    got = fn(corpus)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = _sql(corpus, e.oracle_sql()[name])
    assert _canon(got) == _canon(exp)
