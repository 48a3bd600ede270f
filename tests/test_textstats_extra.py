

def test_bpe_learn_merges_known_corpus(ray_session, tmp_path):
    """Known-answer BPE training: (h,e) wins round 1 on the lexicographic
    tiebreak against (t,h), then (t,he) dominates round 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import bpe_learn_merges

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["the the the the", "then there"],
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = bpe_learn_merges(str(tmp_path), n_merges=2).to_pandas()
    assert list(out["merge_rank"]) == [1, 2]
    assert (out.iloc[0]["left"], out.iloc[0]["right"]) == ("h", "e")
    assert out.iloc[0]["pair_count"] == 6
    assert (out.iloc[1]["left"], out.iloc[1]["right"]) == ("t", "he")
    assert out.iloc[1]["pair_count"] == 6
