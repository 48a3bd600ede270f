"""Oracle-equality smoke of the functions library at sf0.001 (the driver
repeats this at sf0.01 with the same harness logic)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _to_pandas(result):
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


@pytest.mark.parametrize("name", [
    "pricing_summary", "filter_project", "distinct_flags", "top_orders",
    "revenue_by_nation", "customer_order_stats", "brand_volume",
    "top_events", "hourly_event_stats", "sliding_event_stats",
    "sessionize", "events_with_prev", "value_percentiles", "asof_last_view",
    "clicks_after_error",
    "dedup_exact",
    "token_counts", "bpe_token_counts", "quality_counters",
    "gopher_quality", "fingerprints", "json_props_stats",
    "redact_pii", "paragraph_dedup_stats", "stratified_sample",
    "embedding_neardups", "ann_topk", "media_meta",
    "supplier_by_nation", "user_topk_events", "pdf_dates",
    "markdown_to_txt", "markdown_to_html", "train_test_split",
    "distinct_users", "heavy_hitter_users", "html_docs",
    "user_running_value", "pack_sequences", "decontaminate",
    "paragraph_dedup_global", "tfidf_top_terms", "funnel_counts",
    "simhash_neardups", "simhash_signatures", "distinct_users_by_type",
    "minhash_clusters", "ngram_jaccard", "normalize_markdown",
    "neardup_components", "event_transitions", "value_outliers",
    "global_percent_rank", "neardup_dedup_corpus", "dup_ngram_fraction",
    "cohort_retention", "click_error_matrix", "user_moving_sum",
    "latest_user_event", "covariance_by_type", "pmi_collocations",
    "fuzzy_name_pairs", "zonemap_value_scan", "debounced_events",
    "status_priority_sets", "incremental_hourly_stats",
    "hourly_distinct_users", "user_time_window_sum",
    "user_favorite_type", "domain_mix", "status_priority_unpivot",
    "corpus_quality_report", "strip_dup_ngrams", "knn_graph",
    "local_supplier_volume", "orders_above_avg", "customer_order_dist",
    "semantic_dedup", "label_centroids", "chunk_documents",
    "median_by_type", "value_mad_by_type", "user_event_sequence",
    "semantic_clusters", "type_percent_rank", "constraint_report",
    "zorder_box_scan", "session_outage_overlap", "value_trend_by_type",
    "cheapest_supplier_per_part", "rich_inactive_customers",
    "user_value_ewma", "bm25_search", "skyline_orders",
    "top_supplier_revenue", "audience_jaccard", "neardup_hops",
    "order_status_intersect_all", "order_status_except_all",
    "resample_linear", "type_triple_support", "user_type_gini",
    "ab_test_chi2", "rrf_fusion", "value_target_encode",
    "orders_checksum", "user_longest_streak", "orders_scd2",
    "value_hour_corr", "embedding_dbscan", "sliding_distinct_users",
    "type_drift_cells", "p90_by_type", "p75_cont_by_type",
    "value_winsorized", "value_decile", "merged_intervals",
    "late_shipment_orders", "promo_revenue", "snapshot_diff",
    "shipping_priority", "returned_item_customers",
    "large_volume_customers", "bracket_revenue", "profit_by_nation",
    "volume_shipping", "unicode_normalize", "lexical_diversity",
    "value_band_pairs", "asof_nearest_view", "market_share",
    "discount_band_revenue", "top_part_revenue_share",
    "supplier_count_by_part", "lone_return_suppliers",
    "top_terms_by_lang", "extract_mentions", "pii_by_source",
    "value_iqr_outliers", "user_time_weighted_avg",
    "user_peak_concurrency", "asof_recent_view", "event_trigrams",
    "orders_apply_changes", "user_rfm_segments",
    "line_priority_counts", "dominant_part_suppliers",
    "pseudonymize_users",
])
def test_query_matches_oracle(ray_session, oracle, name):
    import __ray_entry__ as entrymod
    mine = _to_pandas(entrymod.queries()[name](SF))
    exp = oracle.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(mine.columns) == sorted(exp.columns)
    assert _canon(mine) == _canon(exp)


@pytest.mark.parametrize("name", [
    "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk", "language_id",
    "bpe_learn_merges", "bpe_encode",
    "ngram_logprob", "embedding_kmeans", "embedding_logreg",
    "embedding_neardups_clustered",
    "shuffle_sample", "extract_turns_aligned", "validate_docs",
    "phash_neardups", "phash_clusters",
])
def test_rows_only_queries_run(ray_session, name):
    import __ray_entry__ as entrymod
    mine = _to_pandas(entrymod.queries()[name](SF))
    assert len(mine) >= 0
    assert len(mine.columns) >= 1


def test_minhash_finds_exact_duplicates(ray_session, tmp_path):
    """A duplicated doc must land in one cluster with the min id as rep."""
    import pyarrow.parquet as pq
    from raydoc.functions.dedup import minhash_lsh_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta " * 10
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [base, base + " iota", "completely different words here "
                 * 12, base],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = minhash_lsh_clusters(str(tmp_path)).to_pandas()
    clusters = dict(zip(out["doc_id"], out["cluster"]))
    assert clusters[4] == clusters[1] == 1
    assert clusters[2] == 1          # near-dup joins the cluster
    assert clusters[3] == 3          # unrelated stays alone


def test_bucket_hash_join_matches_broadcast(ray_session):
    """Large-large join path agrees with the broadcast path."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from raydoc.functions.joins import broadcast_join, bucket_hash_join

    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust_t = pq.read_table(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])
    cust_t = cust_t.rename_columns(["o_custkey", "c_acctbal"])
    a = broadcast_join(orders, cust_t, key="o_custkey").to_pandas()
    cust_ds = rd.from_arrow(cust_t)
    b = bucket_hash_join(orders, cust_ds, key="o_custkey",
                         num_buckets=8).to_pandas()
    assert _canon(a[sorted(a.columns)]) == _canon(b[sorted(b.columns)])


def test_media_decode_stub(ray_session):
    """The stubbed decoder path: fake header decodes, real bytes don't."""
    import ray.data as rd
    from raydoc.functions.multimodal import media_pipeline

    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"RAWDIM:640x480;rest", b"\x89PNG\r\n"],
                            pa.binary()),
        "mime": ["image/raw", "image/png"],
    })
    rows = sorted(media_pipeline(rd.from_arrow(t)).take_all(),
                  key=lambda r: r["media_id"])
    assert rows[0]["decoded"] and rows[0]["width"] == 640
    assert not rows[1]["decoded"] and rows[1]["width"] is None


def test_ivf_topk_recall_vs_brute_force(ray_session):
    """Deterministic (seeded) IVF recall against the exact baseline."""
    from raydoc.functions import similarity

    exact = similarity.brute_force_topk(SF, k=10)
    approx = similarity.ivf_topk(SF, k=10)

    def sets(t):
        out = {}
        for r in t.to_pylist():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    e, a = sets(exact), sets(approx)
    assert set(e) == set(a)
    recall = sum(len(e[q] & a[q]) for q in e) / sum(len(e[q]) for q in e)
    assert recall >= 0.5, recall


def test_media_resize_and_frame_sample_stubs(ray_session):
    """Stubbed decode kernels, real Ray plumbing: resize rescales the fake
    format and passes real bytes through; the frame sampler explodes one
    video row into frame rows."""
    import ray.data as rd
    from raydoc.functions.multimodal import (frame_sample_pipeline,
                                             resize_pipeline)

    imgs = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"RAWDIM:1024x768;data", b"\xff\xd8\xff JPEG"],
                            pa.binary()),
        "mime": ["image/raw", "image/jpeg"],
    })
    rows = sorted(resize_pipeline(rd.from_arrow(imgs), max_side=512).take_all(),
                  key=lambda r: r["media_id"])
    assert rows[0]["resized"] and (rows[0]["width"], rows[0]["height"]) == (512, 384)
    assert rows[0]["payload"].startswith(b"RAWDIM:512x384;")
    assert not rows[1]["resized"] and rows[1]["payload"].startswith(b"\xff\xd8")

    vids = pa.table({
        "media_id": pa.array([7, 8], pa.int64()),
        "payload": pa.array([b"RAWVID:5;f0|f1|f2|f3|f4", b"mp4 real bytes"],
                            pa.binary()),
        "mime": ["video/raw", "video/mp4"],
    })
    frames = sorted(frame_sample_pipeline(rd.from_arrow(vids), every_n=2).take_all(),
                    key=lambda r: (r["media_id"], r["frame_idx"]))
    sampled = [f for f in frames if f["media_id"] == 7]
    assert [f["frame"] for f in sampled] == [b"f0", b"f2", b"f4"]
    assert frames[-1]["media_id"] == 8 and not frames[-1]["sampled"]


def test_hll_estimate_within_error_bound(ray_session, oracle):
    """HLL (p=12, ~1.6% typical error) must land within 5% of exact."""
    from raydoc.functions import sketches

    exact = sketches.distinct_users_exact(SF)["n_users"][0].as_py()
    est = sketches.distinct_users_hll(SF)["n_users_estimate"][0].as_py()
    assert abs(est - exact) / exact < 0.05, (exact, est)


def test_audio_feature_stub(ray_session):
    """Stubbed audio decode + real feature math on the fake PCM format."""
    import numpy as np
    import ray.data as rd
    from raydoc.functions.multimodal import audio_feature_pipeline

    samples = (np.sin(np.linspace(0, 2 * np.pi * 10, 16000))
               * 16384).astype(np.int16)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"RAWPCM:16000;" + samples.tobytes(),
                             b"ID3 real mp3 bytes"], pa.binary()),
        "mime": ["audio/raw", "audio/mpeg"],
    })
    rows = sorted(audio_feature_pipeline(rd.from_arrow(t)).take_all(),
                  key=lambda r: r["media_id"])
    assert rows[0]["decoded"] and abs(rows[0]["duration_sec"] - 1.0) < 1e-9
    assert 0.3 < rows[0]["rms"] < 0.4          # sine rms ≈ A/√2 = 0.3536
    assert not rows[1]["decoded"] and rows[1]["duration_sec"] is None


def test_bucket_count_does_not_change_results(ray_session):
    """Shuffle bucket counts are a pure parallelism knob: the same query at
    two different bucket counts must be row-identical (VERDICT r1 item 7)."""
    from raydoc.functions.relational import q_user_topk_events
    from raydoc.functions.windows import events_with_prev, sessionize

    for fn in (sessionize, events_with_prev, q_user_topk_events):
        a = _to_pandas(fn(SF, num_buckets=4))
        b = _to_pandas(fn(SF, num_buckets=256))
        assert _canon(a) == _canon(b), fn.__name__


def test_reduce_bucket_count_scales_with_cluster(ray_session):
    from raydoc.functions._buckets import reduce_bucket_count
    n = reduce_bucket_count()
    assert n >= 64 and (n & (n - 1)) == 0   # power of two, >= floor


def test_export_media_sink(ray_session, tmp_path):
    """K8 media sink: payloads written by workers, manifest stamped."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.multimodal import export_media

    payloads = [b"RAWDIM:8x6;" + bytes(range(48)), b"", b"\x00\xff" * 10]
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(["m1", "m2", "m3"]),
        "payload": pa.array(payloads, pa.binary()),
    }))
    out = str(tmp_path / "media")
    n = export_media(ds, out)
    assert n == 3
    for mid, data in zip(("m1", "m2", "m3"), payloads):
        with open(os.path.join(out, f"{mid}.bin"), "rb") as fh:
            assert fh.read() == data
    with open(os.path.join(out, "_media_manifest.json")) as fh:
        m = json.load(fh)
    assert m["files"] == 3 and m["bytes"] == sum(len(p) for p in payloads)


def test_asof_join_generic(ray_session):
    """Generic as-of operator: backward/forward directions, unmatched left
    rows null-filled, column collisions rejected."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raydoc.functions.asof import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "t": pa.array([10, 25, 10, 5], pa.int64()),
        "lid": pa.array(["a", "b", "c", "d"]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "t": pa.array([8, 20, 30], pa.int64()),
        "rv": pa.array([100, 200, 300], pa.int64()),
    }))

    back = asof_join(left, right, key="k", ts="t",
                     num_buckets=4).to_pandas().sort_values("lid")
    got = {r.lid: (None if r.rv != r.rv else int(r.rv))
           for r in back.itertuples()}
    # a: t=10, latest right <=10 for k=1 is t=8 -> 100
    # b: t=25 -> t=20 -> 200; c: k=2 t=10, right t=30 > 10 -> null
    # d: k=3 no right rows -> null
    assert got == {"a": 100, "b": 200, "c": None, "d": None}

    fwd = asof_join(left, right, key="k", ts="t", direction="forward",
                    num_buckets=4).to_pandas().sort_values("lid")
    got = {r.lid: (None if r.rv != r.rv else int(r.rv))
           for r in fwd.itertuples()}
    assert got == {"a": 200, "b": None, "c": 300, "d": None}

    bad = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                  "t": pa.array([1], pa.int64()),
                                  "lid": pa.array(["x"])}))
    with pytest.raises(ValueError):
        asof_join(left, bad, key="k", ts="t")


def test_range_join_generic(ray_session):
    """Granule-binned containment join: intervals spanning multiple
    granules, inclusive bounds, per-key separation, no duplicate pairs."""
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.rangejoin import range_join

    points = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([5, 10, 99, 10], pa.int64()),
        "pid": pa.array(["p1", "p2", "p3", "p4"]),
    }))
    intervals = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "start": pa.array([0, 10, 0], pa.int64()),
        "end": pa.array([50, 12, 9], pa.int64()),
        "iid": pa.array(["i1", "i2", "i3"]),
    }))
    # granule far smaller than interval i1 (explodes into 6 granules)
    got = range_join(points, intervals, key="k", granule_us=10,
                     num_buckets=4).to_pandas()
    pairs = sorted(zip(got["pid"], got["iid"]))
    # p1(ts=5): i1 only; p2(ts=10): i1 and i2 (inclusive start);
    # p3(ts=99): none; p4(k=2, ts=10): none (i3 ends at 9)
    assert pairs == [("p1", "i1"), ("p2", "i1"), ("p2", "i2")]


def test_cms_estimates_bound_exact_counts(ray_session, oracle):
    """Count-Min property: every returned estimate >= the true count
    (one-sided error), and the true heaviest user is in the candidate set
    with a tight estimate (width 8192 >> distinct users here)."""
    from raydoc.functions.sketches import cms_user_counts

    got = cms_user_counts(SF, k=10).to_pandas()
    true = dict(oracle.sql(
        "SELECT user_id, count(*) FROM events GROUP BY user_id").fetchall())
    assert len(got) > 0
    for r in got.itertuples():
        assert r.est_count >= true[r.user_id]
    top_true = max(true, key=lambda u: (true[u], -u))
    assert top_true in set(got["user_id"])


def test_lsh_multiprobe_improves_recall(ray_session):
    """Multi-probe LSH: probing low-margin bit-flip buckets can only add
    candidates — recall vs brute force is monotone in `multiprobe`."""
    from raydoc.functions.similarity import brute_force_topk, lsh_topk

    brute = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(SF).to_pylist()}

    def recall(mp):
        got = {(r["query_id"], r["vec_id"])
               for r in lsh_topk(SF, multiprobe=mp).to_pylist()}
        return len(got & brute) / len(brute)

    r0, r2, r4 = recall(0), recall(2), recall(4)
    assert r0 <= r2 <= r4


def test_ngram_logprob_ranks_garbled_below_natural(ray_session, tmp_path):
    """LM quality scorer property: corpus-trained char-trigram logprob of a
    natural English doc beats uniformly-random character noise."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydoc.functions.textstats import ngram_logprob

    rng = random.Random(5)
    natural = ("the quick brown fox jumps over the lazy dog and then "
               "returns home for a quiet evening of reading books. ") * 20
    garbled = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz .,!?")
                      for _ in range(len(natural)))
    docs = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array([natural] * 10 + [natural, garbled]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    out = ngram_logprob(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[10, "logprob"] > out.loc[11, "logprob"]


def test_embedding_kmeans_deterministic_and_complete(ray_session):
    from raydoc.functions.similarity import embedding_kmeans

    a = embedding_kmeans(SF, k=4, iters=5).to_pandas()
    b = embedding_kmeans(SF, k=4, iters=5).to_pandas()
    assert a.equals(b)                         # seeded + fixed iterations
    assert a["cluster"].between(0, 3).all()
    assert len(a) == len(set(a["vec_id"]))     # every vector labeled once
    assert a["cluster"].nunique() >= 2         # non-degenerate on this data


def test_clustered_neardups_subset_of_exact(ray_session):
    """Cluster-bucketed near-dup pairs are a SUBSET of the exact pairs
    (within-cluster only), with recall that improves as k shrinks and
    reaches 1.0 at k=1 (degenerate = exact)."""
    from raydoc.functions.dedup import (embedding_neardups,
                                        embedding_neardups_clustered)

    exact = {(r["a"], r["b"])
             for r in embedding_neardups(SF, threshold=0.4).to_pylist()}
    approx = {(r["a"], r["b"]) for r in embedding_neardups_clustered(
        SF, threshold=0.4, k=4).to_pylist()}
    assert approx <= exact
    one = {(r["a"], r["b"]) for r in embedding_neardups_clustered(
        SF, threshold=0.4, k=1).to_pylist()}
    assert one == exact


def test_bbox_containment_antijoin(ray_session):
    """J2 geometric anti-join vs a brute-force reference on random boxes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.rangejoin import bbox_containment_antijoin

    rng = np.random.RandomState(3)
    n_el, n_reg = 400, 40
    pages_e = rng.randint(0, 12, n_el)
    x0 = rng.uniform(0, 500, n_el); y0 = rng.uniform(0, 700, n_el)
    eboxes = np.stack([x0, y0, x0 + rng.uniform(5, 60, n_el),
                       y0 + rng.uniform(5, 30, n_el)], axis=1)
    pages_r = rng.randint(0, 12, n_reg)
    rx0 = rng.uniform(0, 400, n_reg); ry0 = rng.uniform(0, 600, n_reg)
    rboxes = np.stack([rx0, ry0, rx0 + rng.uniform(50, 250, n_reg),
                       ry0 + rng.uniform(50, 200, n_reg)], axis=1)

    elements = rd.from_arrow(pa.table({
        "page_id": pa.array(pages_e, pa.int64()),
        "bbox": pa.array(eboxes.tolist(), pa.list_(pa.float64(), 4)),
        "eid": pa.array(np.arange(n_el), pa.int64()),
    }))
    regions = rd.from_arrow(pa.table({
        "page_id": pa.array(pages_r, pa.int64()),
        "bbox": pa.array(rboxes.tolist(), pa.list_(pa.float64(), 4)),
    }))

    got = sorted(bbox_containment_antijoin(
        elements, regions, num_buckets=4).to_pandas()["eid"])

    def contained(e, pg):
        for rp, rb in zip(pages_r, rboxes):
            if rp == pg and e[0] >= rb[0] and e[1] >= rb[1] \
                    and e[2] <= rb[2] and e[3] <= rb[3]:
                return True
        return False

    want = sorted(i for i in range(n_el)
                  if not contained(eboxes[i], pages_e[i]))
    assert got == want
    assert len(want) < n_el        # some elements actually got absorbed


def test_ddsketch_quantiles_within_relative_error(ray_session):
    """DDSketch estimates vs the exact sort-based percentiles: relative
    error must stay under the gamma bound (~1%) plus slack."""
    from raydoc.functions.sketches import value_percentiles_sketch
    from raydoc.functions.windows import value_percentiles
    est = value_percentiles_sketch(SF).to_pandas()
    exact = value_percentiles(SF).to_pandas()
    assert list(est["q"]) == list(exact["q"])
    for ve, vx in zip(est["value_est"], exact["value"]):
        assert abs(ve - vx) / max(abs(vx), 1e-9) < 0.02


def test_grouped_hll_within_error_of_exact(ray_session):
    from raydoc.functions.sketches import (distinct_users_by_type,
                                           distinct_users_by_type_hll)
    exact = distinct_users_by_type(SF).to_pandas().set_index("event_type")
    est = distinct_users_by_type_hll(SF).to_pandas().set_index("event_type")
    assert sorted(exact.index) == sorted(est.index)
    for g in exact.index:
        e, a = exact.loc[g, "n_users"], est.loc[g, "n_users_estimate"]
        assert abs(a - e) / e < 0.05, (g, e, a)


def test_grouped_ddsketch_within_relative_error(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.sketches import value_percentiles_by_type_sketch
    est = value_percentiles_by_type_sketch(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for (g, q), sub in est.groupby(["event_type", "q"]):
        vals = np.sort(ev.loc[ev["event_type"] == g, "value"].to_numpy())
        exact = vals[int(np.floor((len(vals) - 1) * q))]
        got = sub["value_est"].iloc[0]
        assert abs(got - exact) / max(abs(exact), 1e-9) < 0.02, (g, q)


def test_compression_ratio_properties(ray_session):
    """zlib signal: deterministic, bounded, and repetitive text must
    compress strictly better than the word-soup corpus median."""
    from raydoc.functions.textstats import compression_ratio
    a = compression_ratio(SF).to_pandas()
    b = compression_ratio(SF).to_pandas()
    assert a.equals(b)                                   # deterministic
    assert (a["n_compressed"] > 0).all()
    assert (a.loc[a["n_bytes"] > 0, "ratio_milli"] > 0).all()
    # zlib overhead bound: compressed <= raw + 11 + 5*ceil(raw/16383)
    ok = a["n_compressed"] <= a["n_bytes"] + 11 + 5 * (
        a["n_bytes"] // 16383 + 1)
    assert ok.all()


def test_compression_ratio_orders_repetitive_below_random(
        ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import compression_ratio
    rep = "spam ham " * 500
    soup = " ".join(f"w{i * 7919 % 4973}x{i * 104729 % 9973}"
                    for i in range(1000))
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                             "text": pa.array([rep, soup])}),
                   tmp_path / "documents.parquet")
    out = compression_ratio(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "ratio_milli"] < out.loc[2, "ratio_milli"] / 4


def test_value_outliers_are_the_extreme_tail(ray_session):
    """Every flagged event must deviate > 3 sigma (float check with slack
    both ways is avoided — recompute the exact integer rule in-test)."""
    import math
    import pyarrow.parquet as pq
    from raydoc.functions.windows import value_outliers
    got = value_outliers(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]
                       ).to_pandas()
    cents = (ev["value"] * 100).round().astype("int64")
    flagged = set(got["event_id"])
    for etype, sub in ev.assign(c=cents).groupby("event_type"):
        n = len(sub)
        s1 = int(sub["c"].sum())
        s2 = int((sub["c"].astype(object) ** 2).sum())
        rhs = 9 * (n * s2 - s1 * s1)
        for eid, c in zip(sub["event_id"], sub["c"]):
            expect = (n * int(c) - s1) ** 2 > rhs
            assert (eid in flagged) == expect, (etype, eid)


def test_neardup_dedup_corpus_consistent_with_clusters(ray_session):
    """Kept docs = cluster roots; n_dups = cluster sizes; every doc is
    represented by exactly one kept root."""
    from raydoc.functions.dedup import (minhash_lsh_clusters,
                                        neardup_dedup_corpus)
    clusters = minhash_lsh_clusters(SF).to_pandas()
    kept = neardup_dedup_corpus(SF).to_pandas()
    sizes = clusters.groupby("cluster").size()
    assert sorted(kept["doc_id"]) == sorted(sizes.index)
    got = kept.set_index("doc_id")["n_dups"]
    assert (got.sort_index() == sizes.sort_index()).all()
    assert got.sum() == len(clusters)


def test_edit1_predicate():
    from raydoc.functions.textstats import _edit1
    assert _edit1("cat", "cut")            # substitution
    assert _edit1("cat", "cats")           # insertion at end
    assert _edit1("cat", "at")             # deletion at front
    assert _edit1("cat", "cart")           # insertion inside
    assert not _edit1("cat", "dog")
    assert not _edit1("cat", "cattle")
    assert not _edit1("abc", "cba")


def test_pq_topk_recall_vs_brute_force(ray_session):
    """PQ + exact re-rank recall against the exact baseline; re-ranked
    cosines are true, so every returned hit must be a real neighbor."""
    from raydoc.functions import similarity
    exact = similarity.brute_force_topk(SF, k=10)
    approx = similarity.pq_topk(SF, k=10)

    def sets(t):
        out = {}
        for r in t.to_pylist():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    e, a = sets(exact), sets(approx)
    assert set(e) == set(a)
    recall = sum(len(e[q] & a[q]) for q in e) / sum(len(e[q]) for q in e)
    assert recall >= 0.6, recall


def test_embedding_logreg_beats_majority_baseline(ray_session):
    """Distributed one-vs-rest logreg: deterministic across runs and
    clearly above the majority-class baseline (the labels are only
    weakly encoded in the embeddings — local full-batch GD caps ~0.40;
    25 distributed iterations reach ~0.33)."""
    from raydoc.functions.similarity import embedding_logreg
    a = embedding_logreg(SF).to_pandas()
    b = embedding_logreg(SF).to_pandas()
    assert a.equals(b)
    acc = (a["label"] == a["pred"]).mean()
    majority = a["label"].value_counts().max() / len(a)
    assert acc > 2 * majority, (acc, majority)


def test_knn_graph_exact_with_ties(ray_session, tmp_path):
    """knn_graph matches a local exact computation on a corpus with
    duplicate vectors (d2=0 ties must break by neighbor_id, and tied
    candidates must survive the per-block local top-k)."""
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.similarity import knn_graph

    rng = np.random.RandomState(42)
    base = rng.randn(10, 8).astype(np.float32)
    # 30 vectors: each base vector repeated 3x -> heavy d2=0 ties
    mat = np.repeat(base, 3, axis=0)
    t = pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = knn_graph(str(tmp_path), k=4, n_blocks=4).to_pandas()

    q = np.floor(mat.astype(np.float64) * 1024).astype(np.int64)
    norms = (q * q).sum(axis=1)
    d2m = norms[:, None] + norms[None, :] - 2 * (q @ q.T)
    for v in range(30):
        cand = sorted((int(d2m[v, u]), u) for u in range(30) if u != v)
        got = out[out["vec_id"] == v].sort_values("nn_rank")
        assert list(got["neighbor_id"]) == [u for _, u in cand[:4]]
        assert list(got["d2"]) == [d for d, _ in cand[:4]]


def test_semantic_dedup_vs_clusters_consistency(ray_session):
    """Cross-operator invariants on the same tau-graph: every cluster's
    minimum survives dedup, and every dropped vector shares a cluster
    with a smaller one."""
    from raydoc.functions.similarity import semantic_clusters, semantic_dedup

    kept = {r["vec_id"] for r in semantic_dedup(SF).to_pylist()}
    clus = semantic_clusters(SF).to_pandas()
    minima = set(clus.groupby("cluster")["vec_id"].min())
    assert minima <= kept
    dropped = set(clus["vec_id"]) - kept
    cmap = dict(zip(clus["vec_id"], clus["cluster"]))
    by_cluster = clus.groupby("cluster")["vec_id"].min().to_dict()
    for v in dropped:
        assert by_cluster[cmap[v]] < v


def test_block_pair_ops_tiny_corpus(ray_session, tmp_path):
    """Corpora smaller than n_blocks leave some repartition blocks
    empty — the block-pair operators must not crash on them."""
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.similarity import (knn_graph, semantic_clusters,
                                             semantic_dedup)

    rng = np.random.RandomState(3)
    t = pa.table({
        "vec_id": pa.array(np.arange(5, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r))
                               for r in rng.randn(5, 8)],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    g = knn_graph(str(tmp_path), k=2, n_blocks=8).to_pandas()
    assert len(g) == 10 and set(g["vec_id"]) == set(range(5))
    kept = semantic_dedup(str(tmp_path), n_blocks=8)
    assert 1 <= kept.num_rows <= 5
    clus = semantic_clusters(str(tmp_path), n_blocks=8)
    assert clus.num_rows == 5


def test_user_event_sequence_all_null_types(ray_session, tmp_path):
    """A user whose every event_type is NULL gets seq = NULL (SQL
    string_agg semantics), not ''."""
    import datetime
    import pyarrow.parquet as pq
    from raydoc.functions.windows import user_event_sequence

    ts = [datetime.datetime(2025, 1, 1, h) for h in range(3)]
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "event_type": pa.array([None, None, "click"], pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = {r["user_id"]: r
           for r in user_event_sequence(str(tmp_path)).to_pylist()}
    assert out[7]["seq"] is None and out[7]["n_events"] == 2
    assert out[8]["seq"] == "click"


def test_semantic_clusters_regimes_agree(ray_session, tmp_path):
    """Driver union-find and distributed connected-components produce
    identical labels (max_driver_pairs=0 forces the distributed path).
    Small implanted-duplicate corpus keeps the distributed rounds
    cheap — the full-corpus regime equality runs via the gate."""
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.similarity import semantic_clusters

    rng = np.random.RandomState(9)
    base = rng.randn(8, 16) * 10
    mat = np.repeat(base, 3, axis=0)          # 8 clusters of 3 dups
    t = pa.table({
        "vec_id": pa.array(np.arange(24, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    a = semantic_clusters(str(tmp_path), n_blocks=4).to_pylist()
    b = semantic_clusters(str(tmp_path), n_blocks=4,
                          max_driver_pairs=0).to_pylist()
    assert a == b
    labels = {r["vec_id"]: r["cluster"] for r in a}
    for c in range(8):                         # each triple co-clusters
        assert labels[3 * c] == labels[3 * c + 1] == labels[3 * c + 2] \
            == 3 * c


def test_bm25_ranks_term_dense_doc_first(ray_session, tmp_path):
    """A document saturated with the query terms must outrank sparse
    ones; zero-match docs must not appear; scores strictly ordered."""
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import bm25_search

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["hash join merge " * 20,
                 "hash table scan filter sort " + "pad " * 40,
                 "nothing relevant at all " * 10,
                 "merge sort merge " + "pad " * 10],
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = bm25_search(str(tmp_path), top_k=10).to_pandas()
    assert list(out["doc_id"])[0] == 1
    assert 3 not in set(out["doc_id"])
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (out["score"].to_numpy()[:-1]
            >= out["score"].to_numpy()[1:]).all()


def test_cheapest_supplier_tiebreak_prefers_low_suppkey(ray_session,
                                                        tmp_path):
    """Equal best prices must resolve to the LOWEST suppkey (the packed
    int64 argmin tiebreak), and the price must unpack exactly."""
    import pyarrow.parquet as pq
    from raydoc.functions.relational import q_cheapest_supplier_per_part

    li = pa.table({
        "l_partkey": pa.array([10, 10, 10, 11], pa.int64()),
        "l_suppkey": pa.array([7, 3, 9, 2], pa.int64()),
        "l_extendedprice": pa.array([55.5, 55.5, 99.0, 12.34]),
    })
    sup = pa.table({
        "s_suppkey": pa.array([2, 3, 7, 9], pa.int64()),
        "s_name": ["s2", "s3", "s7", "s9"],
    })
    pq.write_table(li, tmp_path / "lineitem.parquet")
    pq.write_table(sup, tmp_path / "supplier.parquet")
    out = q_cheapest_supplier_per_part(str(tmp_path)).to_pandas()
    row10 = out[out["p_partkey"] == 10].iloc[0]
    assert row10["s_suppkey"] == 3 and row10["s_name"] == "s3"
    assert row10["best_price_cents"] == 5550
    row11 = out[out["p_partkey"] == 11].iloc[0]
    assert row11["s_suppkey"] == 2 and row11["best_price_cents"] == 1234


def test_skyline_mask_dominance_semantics():
    """Duplicates on both dims all survive; one-strict dominance kills;
    incomparable points coexist; brute-force agreement on random data."""
    import numpy as np
    from raydoc.functions.relational import _skyline2d_mask

    price = np.array([10, 10, 10, 9, 5, 5], np.int64)
    date = np.array([7, 7, 6, 8, 9, 9], np.int64)
    # (10,7)x2 dup -> both survive; (10,6) dominated by (10,7);
    # (9,8) incomparable with (10,7) -> survives; (5,9)x2 dup survive
    assert list(_skyline2d_mask(price, date)) == [
        True, True, False, True, True, True]

    rng = np.random.default_rng(7)
    p = rng.integers(0, 50, 300).astype(np.int64)
    d = rng.integers(0, 50, 300).astype(np.int64)
    got = _skyline2d_mask(p, d)
    brute = np.array([
        not np.any((p >= p[i]) & (d >= d[i]) & ((p > p[i]) | (d > d[i])))
        for i in range(p.size)])
    assert (got == brute).all()
    assert list(_skyline2d_mask(np.array([], np.int64),
                                np.array([], np.int64))) == []


def test_audience_jaccard_omits_empty_intersections(ray_session, tmp_path):
    """Disjoint audiences produce NO row (inner-join semantics); the
    jaccard value is the exact integer ratio."""
    import pyarrow.parquet as pq
    from raydoc.functions.relational import q_audience_jaccard

    ev = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "ts": pa.array([0] * 8, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3, 1, 2, 4, 5, 6], pa.int64()),
        "event_type": ["a", "a", "a", "b", "b", "b", "c", "c"],
        "value": pa.array([0.0] * 8),
        "props": pa.array(["{}"] * 8),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    out = q_audience_jaccard(str(tmp_path)).to_pandas()
    # a={1,2,3}, b={1,2,4}, c={5,6}: only (a,b) intersect
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["type_a"], row["type_b"]) == ("a", "b")
    assert row["n_inter"] == 2 and row["n_union"] == 4
    assert row["jaccard"] == 0.5


def test_lazy_public_api_resolves_every_name():
    """Every name in raydoc.__getattr__'s API map must import and be
    callable/usable — catches dangling re-exports after refactors."""
    import ast
    import inspect

    import raydoc

    src = inspect.getsource(raydoc.__getattr__)
    tree = ast.parse("def f():\n" + "\n".join(
        "    " + line for line in src.splitlines()[1:]))
    names = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            names = [k.value for k in node.keys
                     if isinstance(k, ast.Constant)]
            break
    assert len(names) > 40
    for n in names:
        obj = getattr(raydoc, n)
        assert obj is not None, n
