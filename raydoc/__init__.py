"""raydoc — Ray-Data-native transcript/document extraction engine.

A from-scratch rebuild of the document-to-markdown extraction core of
nyimin/SmolDocling-OCR ("DocFlow", /root/reference) as a streaming batch
pipeline over Parquet tables of multi-turn transcripts:

- ``raydoc.kernels``   pure per-turn / per-conversation transform functions
                       (the reference's deterministic semantics, no Ray)
- ``raydoc.stages``    Ray Data ``map_batches`` stages (incl. the stateful
                       extractor actor pool)
- ``raydoc.pipelines`` end-to-end Dataset pipelines (read → extract →
                       groupby(conv_id) document stage → partitioned write)
- ``raydoc.sources``   deterministic synthetic transcript generation
- ``raydoc.functions`` general large-scale data ops (dedup, ANN,
                       text analysis, relational, windows, multimodal)
- ``raydoc.state``     partition manifests / checkpoint-resume

See SURVEY.md for the full operator inventory and file:line citations into
the reference.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import raydoc` light — no Ray import)."""
    api = {
        "extract_dataset": ("raydoc.pipelines.extract_pipeline", "extract_dataset"),
        "run_job": ("raydoc.pipelines.extract_pipeline", "run_job"),
        "read_extracted": ("raydoc.pipelines.training_corpus", "read_extracted"),
        "build_training_corpus": ("raydoc.pipelines.training_corpus",
                                  "build_training_corpus"),
        "PipelineConfig": ("raydoc.config", "PipelineConfig"),
        "DEFAULT_CONFIG": ("raydoc.config", "DEFAULT_CONFIG"),
        # operators Ray Data lacks natively
        "asof_join": ("raydoc.functions.asof", "asof_join"),
        "range_join": ("raydoc.functions.rangejoin", "range_join"),
        "band_join": ("raydoc.functions.rangejoin", "band_join"),
        "phash_neardups": ("raydoc.functions.multimodal",
                           "phash_neardups"),
        "ahash64": ("raydoc.functions.multimodal", "ahash64"),
        "interval_overlap_join": ("raydoc.functions.rangejoin",
                                  "interval_overlap_join"),
        "broadcast_join": ("raydoc.functions.joins", "broadcast_join"),
        "bucket_hash_join": ("raydoc.functions.joins", "bucket_hash_join"),
        "salted_hash_join": ("raydoc.functions.joins", "salted_hash_join"),
        "bloom_prefiltered_join": ("raydoc.functions.joins",
                                   "bloom_prefiltered_join"),
        "bucket_semi_join": ("raydoc.functions.joins", "bucket_semi_join"),
        "except_distinct": ("raydoc.functions.joins", "except_distinct"),
        "intersect_distinct": ("raydoc.functions.joins",
                               "intersect_distinct"),
        "merge_upsert": ("raydoc.functions.joins", "merge_upsert"),
        "apply_changes": ("raydoc.functions.joins", "apply_changes"),
        "intersect_all": ("raydoc.functions.joins", "intersect_all"),
        "except_all": ("raydoc.functions.joins", "except_all"),
        "scd2_history": ("raydoc.functions.joins", "scd2_history"),
        "connected_components": ("raydoc.functions.graph",
                                 "connected_components"),
        "bfs_hops_distributed": ("raydoc.functions.graph",
                                 "bfs_hops_distributed"),
        "embedding_dbscan": ("raydoc.functions.graph", "embedding_dbscan"),
        "rrf_fusion": ("raydoc.functions.similarity", "rrf_fusion"),
        "pagerank": ("raydoc.functions.graph", "pagerank"),
        "triangle_count": ("raydoc.functions.graph", "triangle_count"),
        "pivot_agg": ("raydoc.functions.relational", "pivot_agg"),
        "rollup_aggregate": ("raydoc.functions.relational",
                             "rollup_aggregate"),
        "cube_aggregate": ("raydoc.functions.relational", "cube_aggregate"),
        "grouping_sets_aggregate": ("raydoc.functions.relational",
                                    "grouping_sets_aggregate"),
        "profile_columns": ("raydoc.functions.profile", "profile_columns"),
        "constraint_report": ("raydoc.functions.profile",
                              "constraint_report"),
        "partial_groupby": ("raydoc.functions.agg", "partial_groupby"),
        "incremental_groupby": ("raydoc.functions.agg",
                                "incremental_groupby"),
        "auto_join": ("raydoc.functions.joins", "auto_join"),
        "bloom_build": ("raydoc.functions.dedup", "bloom_build"),
        "bloom_filter_novel": ("raydoc.functions.dedup",
                               "bloom_filter_novel"),
        "pca_components": ("raydoc.functions.similarity", "pca_components"),
        "pq_topk": ("raydoc.functions.similarity", "pq_topk"),
        "logreg_fit": ("raydoc.functions.similarity", "logreg_fit"),
        "kmeans_centroids": ("raydoc.functions.similarity",
                             "kmeans_centroids"),
        "strip_dup_ngrams": ("raydoc.functions.textstats",
                             "strip_dup_ngrams"),
        "chunk_documents": ("raydoc.functions.textstats",
                            "chunk_documents"),
        "knn_graph": ("raydoc.functions.similarity", "knn_graph"),
        "semantic_dedup": ("raydoc.functions.similarity", "semantic_dedup"),
        "semantic_clusters": ("raydoc.functions.similarity",
                              "semantic_clusters"),
        "label_centroids": ("raydoc.functions.similarity",
                            "label_centroids"),
        "mmr_diverse_topk": ("raydoc.functions.similarity",
                             "mmr_diverse_topk"),
        "bloom_build_ints": ("raydoc.functions.dedup", "bloom_build_ints"),
        "bloom_filter_member_ints": ("raydoc.functions.dedup",
                                     "bloom_filter_member_ints"),
        # extension surface
        "register_text_extractor": ("raydoc.kernels.registry",
                                    "register_text_extractor"),
        "register_document_variant": ("raydoc.kernels.registry",
                                      "register_document_variant"),
        # export sinks
        "export_docx": ("raydoc.functions.export", "export_docx"),
        "export_jsonl": ("raydoc.functions.export", "export_jsonl"),
        "export_media": ("raydoc.functions.multimodal", "export_media"),
        "compact_parquet_dir": ("raydoc.pipelines.compact",
                                "compact_parquet_dir"),
        "read_parquet_evolved": ("raydoc.sources.evolved",
                                 "read_parquet_evolved"),
        "write_clustered_parquet": ("raydoc.pipelines.clustered",
                                    "write_clustered_parquet"),
        "write_bucketed_parquet": ("raydoc.pipelines.bucketed",
                                   "write_bucketed_parquet"),
        "bucketed_join_dataset": ("raydoc.pipelines.bucketed",
                                  "bucketed_join_dataset"),
        "read_clustered_range": ("raydoc.pipelines.clustered",
                                 "read_clustered_range"),
        "write_zordered_parquet": ("raydoc.pipelines.zorder",
                                   "write_zordered_parquet"),
        "read_zordered_box": ("raydoc.pipelines.zorder",
                              "read_zordered_box"),
    }
    if name in api:
        import importlib
        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
