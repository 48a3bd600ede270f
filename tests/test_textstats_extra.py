

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


def test_bpe_encode_known_corpus(ray_session, tmp_path):
    """Encoding replays the trainer's merges: after (h,e) then (t,he),
    'the'→[the] (1 token), 'then'→[the,n] (2), 'there'→[the,r,e] (3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import bpe_encode

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["the the the the", "then there"],
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = bpe_encode(str(tmp_path), n_merges=2).to_pandas()
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["n_words"]) == [4, 2]
    # doc1: 4 × 'the' = 4 tokens; doc2: 'then' (2) + 'there' (3) = 5
    assert list(out["n_bpe_tokens"]) == [4, 5]


def test_bpe_encode_matches_trainer_final_vocab(ray_session, tmp_path):
    """The streaming encoder's per-word token counts equal the symbol
    counts in the trainer's internal final vocabulary (sequential
    rank-order application IS the learned tokenization)."""
    import re
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import bpe_encode, bpe_learn_merges

    text = ("low lower lowest newer newest wider widest "
            "low low lower newer newer")
    docs = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
    pq.write_table(docs, tmp_path / "documents.parquet")
    n_merges = 5
    merges = bpe_learn_merges(str(tmp_path), n_merges=n_merges)
    mlist = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))

    def ref_encode(word):
        syms = list(word)
        for l_sym, r_sym in mlist:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == l_sym
                        and syms[i + 1] == r_sym):
                    out.append(l_sym + r_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = re.findall(r"\w+", text.lower())
    want = sum(len(ref_encode(w)) for w in words)
    got = bpe_encode(str(tmp_path), n_merges=n_merges).to_pandas()
    assert got.iloc[0]["n_words"] == len(words)
    assert got.iloc[0]["n_bpe_tokens"] == want


def test_export_jsonl_roundtrip_idempotent_atomic(ray_session, tmp_path):
    """Shards round-trip losslessly, rerunning the same input rewrites
    the SAME content-hashed filenames (idempotent resume), and no .tmp
    debris survives a completed run."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd
    from raydoc.functions.export import export_jsonl

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    m1 = export_jsonl(ds, out).to_pandas()
    assert (m1["n_rows"].sum()) == 500
    files = sorted(glob.glob(out + "/*.jsonl"))
    assert [os.path.basename(f) for f in files] == sorted(m1["shard"])
    assert not glob.glob(out + "/*.tmp*")
    back = rd.read_json(files).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    orig = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert back[["doc_id", "text", "lang"]].equals(orig)
    m2 = export_jsonl(rd.read_parquet(
        f"{sf}/documents.parquet",
        columns=["doc_id", "text", "lang"]), out).to_pandas()
    assert m2.equals(m1)


def test_canonicalize_url_rules():
    from raydoc.functions.textstats import canonicalize_url

    assert canonicalize_url("HTTPS://WWW.Ex.COM:443/P?utm_x=1&id=2#f") == \
        "https://www.ex.com/P?id=2"
    assert canonicalize_url("http://a.b:8080/x?utm_source=z") == \
        "http://a.b:8080/x"
    assert canonicalize_url("http://a.b:80/x?q=1&q=2") == \
        "http://a.b/x?q=1&q=2"


def test_export_jsonl_removes_stale_shards(ray_session, tmp_path):
    """A rerun over DIFFERENT data must not leave the previous run's
    shards mixed into the directory (consumers glob *.jsonl)."""
    import glob
    import os

    import ray.data as rd
    from raydoc.functions.export import export_jsonl

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    full = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    export_jsonl(full, out)
    sub = rd.read_parquet(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"]) \
        .filter(lambda r: r["doc_id"] < 100)
    m2 = export_jsonl(sub, out).to_pandas()
    files = sorted(os.path.basename(f)
                   for f in glob.glob(out + "/*.jsonl"))
    assert files == sorted(m2["shard"])
    back = rd.read_json(glob.glob(out + "/*.jsonl")).to_pandas()
    assert len(back) == int(m2["n_rows"].sum())
    assert back["doc_id"].max() < 100


def test_export_jsonl_collapses_identical_blocks(ray_session, tmp_path):
    """Byte-identical blocks hash to ONE shard file; the manifest must
    describe the directory (one row per file), not the input blocks."""
    import glob

    import pyarrow as pa
    import ray.data as rd
    from raydoc.functions.export import export_jsonl

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a", "b", "c"]})
    ds = rd.from_arrow(t).union(rd.from_arrow(t))
    out = str(tmp_path / "shards")
    m = export_jsonl(ds, out).to_pandas()
    files = glob.glob(out + "/*.jsonl")
    assert len(files) == len(m)
    n_lines = sum(1 for f in files for _ in open(f))
    assert n_lines == int(m["n_rows"].sum())


def test_als_deterministic_and_converges(ray_session):
    """ALS: bucket-count invariance is within float fold tolerance,
    RMSE is monotone decreasing, and the distributed fit matches a
    local numpy ALS with the same init and update rule."""
    import duckdb
    import hashlib
    import numpy as np

    from raydoc.functions.similarity import als_fit

    sf = "/root/testdata/sf0.001"
    rank, iters, reg = 2, 4, 0.1
    items, f, hist = als_fit(sf, rank=rank, iters=iters, reg=reg,
                             num_buckets=64)
    assert all(b < a for a, b in zip(hist, hist[1:]))

    items2, f2, _ = als_fit(sf, rank=rank, iters=iters, reg=reg,
                            num_buckets=16)
    assert items2 == items
    assert np.allclose(f, f2, rtol=1e-9, atol=1e-12)

    # local twin: same ratings, same deterministic init, same updates
    rows = duckdb.sql(f"""
        SELECT user_id, event_type, COUNT(*) AS n
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY 1, 2""").fetchall()
    idx = {it: i for i, it in enumerate(items)}
    by_user: dict[int, list[tuple[int, float]]] = {}
    for u, e, n in rows:
        by_user.setdefault(u, []).append((idx[e], np.log1p(float(n))))
    lf = np.array([[int(hashlib.md5(f"{it}:{k}".encode()).hexdigest()[:8],
                        16) / 0xFFFFFFFF
                    for k in range(rank)] for it in items])
    eye = np.eye(rank)
    m = len(items)
    for _ in range(iters):
        gram = np.zeros((m, rank, rank))
        rhs = np.zeros((m, rank))
        for u in sorted(by_user):
            obs = np.array([i for i, _ in by_user[u]])
            rv = np.array([r for _, r in by_user[u]])
            fo = lf[obs]
            xu = np.linalg.solve(fo.T @ fo + reg * eye, fo.T @ rv)
            np.add.at(gram, obs, np.outer(xu, xu))
            np.add.at(rhs, obs, xu[None, :] * rv[:, None])
        lf = np.stack([np.linalg.solve(gram[i] + reg * eye, rhs[i])
                       for i in range(m)])
    assert np.allclose(f, lf, rtol=1e-8, atol=1e-10)


def test_dedup_conversations_planted_duplicates(ray_session):
    """Session-level dedup: the planted duplicate count is recovered
    exactly, every kept conversation is the original (min conv_id), and
    the kept checksum matches a local recomputation."""
    import duckdb
    import hashlib

    from raydoc.functions.dedup import dedup_conversations

    sf = "/root/testdata/sf0.001"
    out = dedup_conversations(sf).to_pandas()
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()]
    planted = sum(1 for d in ids if d % 7 == 0)
    assert int(out["n_unique"][0]) == len(ids)
    assert int(out["n_dup_convs"][0]) == planted
    assert int(out["n_convs"][0]) == len(ids) + planted
    total = 0
    for d in ids:  # kept = the "doc-" original, never the "dup-" copy
        total += int(hashlib.md5(f"doc-{d}".encode()).hexdigest()[:16], 16)
    assert out["kept_checksum"][0] == format(total % (1 << 64), "016x")


def test_loss_mask_spans_tile_and_mask(ray_session):
    """Spans of each conversation tile [0, n_tok) exactly (no gap, no
    overlap), roles cycle user/assistant/tool, and loss_mask marks
    exactly the assistant spans."""
    import re

    import duckdb

    from raydoc.functions.textstats import _BPE_SPLIT, loss_mask_spans

    sf = "/root/testdata/sf0.001"
    out = loss_mask_spans(sf).to_pandas()
    texts = dict(duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall())
    assert set(out["doc_id"]) == {d for d, v in texts.items()
                                  if _BPE_SPLIT.findall(v or "")}
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("turn_idx")
        n_tok = len(_BPE_SPLIT.findall(texts[doc_id] or ""))
        assert list(g["turn_idx"]) == list(range(len(g)))
        assert g["tok_start"].iloc[0] == 0
        assert g["tok_end"].iloc[-1] == n_tok
        assert (g["tok_end"].values[:-1] == g["tok_start"].values[1:]).all()
        assert (g["tok_end"].values > g["tok_start"].values).all()
        assert (g["loss_mask"].values == (g["turn_idx"].values % 3 == 1)).all()
        assert (g["role"].values[g["loss_mask"].values == 1] ==
                "assistant").all()


def test_textrank_windows_invariants(ray_session):
    """Exactly one is_top window per doc (the lexicographic argmax), ranks
    per doc sum near the fixed-point scale envelope, and every window of
    every tokenized doc is present."""
    import re

    import duckdb

    from raydoc.functions.textstats import textrank_windows

    sf = "/root/testdata/sf0.001"
    out = textrank_windows(sf).to_pandas()
    texts = dict(duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall())
    for doc_id, g in out.groupby("doc_id"):
        toks = re.findall(r"[a-z0-9]+", (texts[doc_id] or "").lower())
        assert len(g) == (len(toks) + 9) // 10
        assert g["is_top"].sum() == 1
        best = g.sort_values(["rank_fp", "window_idx"],
                             ascending=[False, True]).iloc[0]
        assert g.set_index("window_idx")["is_top"][best["window_idx"]] == 1
    assert set(out["doc_id"]) == {d for d, v in texts.items()
                                  if re.findall(r"[a-z0-9]+",
                                                (v or "").lower())}


def test_pack_conversations_invariants(ray_session):
    """Every sequence fits the budget unless it is a single oversized
    conversation; within a sequence offsets are contiguous in doc order;
    every document appears exactly once."""
    import duckdb

    from raydoc.functions.textstats import pack_conversations

    sf = "/root/testdata/sf0.001"
    budget = 512
    out = pack_conversations(sf, budget=budget).to_pandas()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert len(out) == n_docs and out["doc_id"].is_unique
    for (_b, _s), g in out.groupby(["bucket", "seq_in_bucket"]):
        g = g.sort_values("doc_id")
        total = int(g["n_tokens"].sum())
        assert total <= budget or len(g) == 1       # oversized singleton
        starts = g["tok_start_in_seq"].to_numpy()
        toks = g["n_tokens"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts + toks)[:-1]).all()
