"""audience_overlap_hll: sketch set-ops vs the exact overlap; 
mmr_diverse_topk: relevance/diversity/determinism properties."""

import duckdb
import numpy as np


def test_audience_overlap_hll_tracks_exact(ray_session):
    """Inclusion–exclusion HLL intersection within 10% of the exact
    pairwise overlap (p=12 registers ⇒ ~1.6% per-cardinality error)."""
    from raydoc.functions.sketches import audience_overlap_hll

    sf = "/root/testdata/sf0.001"
    got = audience_overlap_hll(sf).to_pandas()
    exact = duckdb.sql(f"""
        WITH a AS (SELECT DISTINCT event_type, user_id
                   FROM '{sf}/events.parquet')
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               COUNT(*) AS n_inter
        FROM a x JOIN a y ON x.user_id = y.user_id
                         AND x.event_type < y.event_type
        GROUP BY 1, 2""").df()
    m = got.merge(exact, on=["type_a", "type_b"], how="inner")
    assert len(m) == len(got) == 10           # C(5,2) pairs, all overlap
    rel = (m["n_intersect_est"] - m["n_inter"]).abs() / m["n_inter"]
    assert rel.max() < 0.10
    assert (got["n_union_est"] >= got[["n_a_est", "n_b_est"]]
            .max(axis=1)).all()


def test_mmr_first_pick_is_global_best_and_diverse(ray_session):
    from raydoc.functions.similarity import (brute_force_topk,
                                             mmr_diverse_topk,
                                             _read_query_vectors)

    sf = "/root/testdata/sf0.001"
    k = 8
    mmr = mmr_diverse_topk(sf, k=k).to_pandas()
    plain = brute_force_topk(sf, query_ids=[0], k=k).to_pandas()
    # rank 1 = the global cosine argmax (λ·sim dominates an empty set)
    assert mmr.loc[mmr["rank"] == 1, "vec_id"].iloc[0] == \
        plain.loc[plain["rank"] == 1, "vec_id"].iloc[0]
    assert mmr["vec_id"].is_unique and len(mmr) == k
    assert (mmr["mmr_score"].diff().dropna() <= 1e-12).all()  # monotone

    def mean_pairwise(ids):
        _, c = _read_query_vectors(sf, sorted(int(v) for v in ids))
        s = c @ c.T
        return (s.sum() - np.trace(s)) / (len(ids) * (len(ids) - 1))

    # the MMR set is strictly less self-similar than plain top-k
    assert mean_pairwise(mmr["vec_id"]) < mean_pairwise(plain["vec_id"])
    again = mmr_diverse_topk(sf, k=k).to_pandas()
    assert again.equals(mmr)


def test_ann_recall_report_floors(ray_session):
    """The report runs all three indexes on the real sf0.01 embeddings —
    unstructured random normals, a hard case. The LSH floor pins the
    multi-table + margin-aware-multiprobe redesign (8 tables × 12
    probes, measured 74% here vs 8% for the old single-table/2-probe
    config the report itself flagged); IVF/PQ floors pin their measured
    regime with safety margin."""
    from raydoc.functions.similarity import ann_recall_report
    got = ann_recall_report("/root/testdata/sf0.01").to_pandas()
    assert sorted(got["method"]) == ["ivf", "lsh", "pq"]
    assert (got["possible"] > 0).all()
    rec = dict(zip(got["method"], got["recall_pct"]))
    assert rec["ivf"] >= 30
    assert rec["pq"] >= 30
    assert rec["lsh"] >= 60
    assert (got["hits"] <= got["possible"]).all()
    assert (got["recall_pct"] <= 100).all()
