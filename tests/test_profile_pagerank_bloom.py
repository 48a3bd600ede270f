"""Round-3 additions: table profiler, integer fixed-point PageRank,
weighted sampling, CUBE, and Bloom-filter incremental dedup — each checked
against a local single-process reference on synthetic data (the SQL twins
are additionally driver-checked at sf0.01)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# --- profiler ----------------------------------------------------------------

def test_profile_columns_counts_and_extremes(ray_session):
    from raydoc.functions.profile import profile_columns
    t = pa.table({
        "a": pa.array([5, None, 3, 10, 3], pa.int64()),
        "s": pa.array(["b", "a", None, "a", "c"], pa.string()),
    })
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2)])
    out = profile_columns(ds, ["a", "s"]).to_pydict()
    assert out["column"] == ["a", "s"]
    assert out["n_rows"] == [5, 5]
    assert out["n_nonnull"] == [4, 4]
    assert out["n_distinct"] == [3, 3]
    # int extremes fold NUMERICALLY ("10" > "9" would fail a string fold)
    assert out["min_val"] == ["3", "a"]
    assert out["max_val"] == ["10", "c"]


def test_profile_events_sf0001(ray_session):
    from raydoc.functions.profile import profile_events
    out = profile_events("/root/testdata/sf0.001")
    d = {r["column"]: r for r in out.to_pylist()}
    assert d["event_id"]["n_distinct"] == d["event_id"]["n_rows"]
    assert d["event_type"]["n_distinct"] <= 10


# --- pagerank ----------------------------------------------------------------

def _pagerank_ref(edges, n_iter=5, scale=10 ** 12, damping=85):
    """Single-process reference with the exact integer update rule."""
    nodes = sorted({x for e in edges for x in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = ((100 - damping) * (scale // n)) // 100
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {v: base + (damping * s[v]) // 100 for v in nodes}
    return r


@pytest.mark.parametrize("seed,ranks_in", [(3, "dataset"), (4, "dataset"),
                                           (3, "broadcast"),
                                           (4, "broadcast")])
def test_pagerank_matches_reference(ray_session, seed, ranks_in):
    from raydoc.functions.graph import pagerank
    rng = np.random.RandomState(seed)
    # random digraph where every node has outdeg >= 1 (ring + chords)
    n = 30
    edges = [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)]
    for _ in range(40):
        a, b = rng.randint(0, n, 2)
        edges.append((f"n{a}", f"n{b}"))
    edges = sorted(set(edges))
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string()),
    }))
    got = {r["node"]: r["rank_fp"]
           for r in pagerank(ds, n_iter=3, num_buckets=8,
                             ranks_in=ranks_in).take_all()}
    assert got == _pagerank_ref(edges, n_iter=3)


def test_pagerank_rank_mass_conserved_modulo_rounding(ray_session):
    from raydoc.functions.graph import pagerank
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string()),
    }))
    ranks = pagerank(ds, n_iter=5, num_buckets=4).take_all()
    total = sum(r["rank_fp"] for r in ranks)
    # floor divisions only ever LOSE mass, and at most a few units per
    # node per round
    assert 0.99 * 10 ** 12 < total <= 10 ** 12


# --- weighted sampling --------------------------------------------------------

def test_weighted_sample_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import weighted_sample
    sf = "/root/testdata/sf0.001"
    got = weighted_sample(sf, k=25).to_pydict()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pydict()
    keyed = sorted(
        (int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:],
                        "little") // max(c, 1), d, c)
        for d, c in zip(docs["doc_id"], docs["n_chars"]))
    want = sorted((d, c) for _, d, c in keyed[:25])
    assert list(zip(got["doc_id"], got["n_chars"])) == want


def test_weighted_sample_biases_toward_long_docs(ray_session):
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import weighted_sample
    sf = "/root/testdata/sf0.001"
    got = weighted_sample(sf, k=50)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["n_chars"])
    import pyarrow.compute as pc
    corpus_mean = pc.mean(docs["n_chars"]).as_py()
    sample_mean = pc.mean(got["n_chars"]).as_py()
    assert sample_mean > corpus_mean


# --- cube ----------------------------------------------------------------

def test_cube_aggregate_matches_pandas(ray_session):
    from raydoc.functions.relational import cube_aggregate
    import pandas as pd
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "x": rng.choice(["p", "q"], 200),
        "y": rng.choice(["u", "v", "w"], 200),
        "v": rng.randint(0, 100, 200).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = cube_aggregate(ds, ["x", "y"],
                         {"s": ("v", "sum"), "n": ("v", "count")}).to_pandas()
    # 4 grouping sets: (x,y), (x), (y), ()
    assert len(out) == 6 + 2 + 3 + 1
    grand = out[out["x"].isna() & out["y"].isna()]
    assert grand["s"].iloc[0] == df["v"].sum()
    assert grand["n"].iloc[0] == 200
    per_x = out[out["x"].notna() & out["y"].isna()].set_index("x")["s"]
    assert per_x.to_dict() == df.groupby("x")["v"].sum().to_dict()


# --- bloom filter dedup --------------------------------------------------

def test_bloom_no_false_negatives(ray_session):
    from raydoc.functions.dedup import bloom_build, bloom_filter_novel
    seen_texts = [f"document body {i}" for i in range(500)]
    seen = rd.from_arrow(pa.table({"text": pa.array(seen_texts)}))
    bloom = bloom_build(seen, n_bits=1 << 16)
    # every true duplicate must drop — bloom filters never false-negative
    dups = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(100)), pa.int64()),
        "text": pa.array(seen_texts[:100]),
    }))
    assert bloom_filter_novel(dups, bloom).count() == 0


def test_bloom_low_false_positive_rate(ray_session):
    from raydoc.functions.dedup import bloom_build, bloom_filter_novel
    seen = rd.from_arrow(pa.table(
        {"text": pa.array([f"seen {i}" for i in range(1000)])}))
    bloom = bloom_build(seen, n_bits=1 << 16)   # 65 bits/doc
    novel = rd.from_arrow(pa.table(
        {"text": pa.array([f"novel {i}" for i in range(1000)])}))
    kept = bloom_filter_novel(novel, bloom).count()
    assert kept >= 990    # <1% false positives at 65 bits/doc, 5 hashes


def test_bloom_novel_docs_partitions(ray_session):
    from raydoc.functions.dedup import bloom_novel_docs
    out = bloom_novel_docs("/root/testdata/sf0.001")
    ids = out.column("doc_id").to_pylist()
    # only new-shard ids (doc_id % 10 >= 3) can appear
    assert all(i % 10 >= 3 for i in ids)
    assert len(ids) > 0


# --- global rank / ntile / grouped median / intersect / collapse ----------

def test_global_rank_ntile_matches_local(ray_session):
    from raydoc.functions.windows import global_rank_ntile
    import pyarrow.parquet as pq
    import pandas as pd
    sf = "/root/testdata/sf0.001"
    got = global_rank_ntile(sf, n_tiles=4, num_buckets=8).to_pandas()
    df = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    df = df.sort_values(["value", "event_id"], ignore_index=True)
    n = len(df)
    r0 = np.arange(n)
    size_small, n_big = n // 4, n % 4
    big_span = n_big * (size_small + 1)
    tile = np.where(r0 < big_span, r0 // (size_small + 1) + 1,
                    (r0 - big_span) // size_small + n_big + 1)
    want = pd.DataFrame({"event_id": df["event_id"], "rn": r0 + 1,
                         "tile": tile}).sort_values("event_id",
                                                    ignore_index=True)
    got = got.sort_values("event_id", ignore_index=True)
    assert (got["rn"].to_numpy() == want["rn"].to_numpy()).all()
    assert (got["tile"].to_numpy() == want["tile"].to_numpy()).all()


def test_median_by_type_matches_numpy(ray_session):
    from raydoc.functions.windows import median_by_type
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r["median_value"]
           for r in median_by_type(sf).to_pylist()}
    df = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for g, sub in df.groupby("event_type"):
        v = np.sort(sub["value"].to_numpy())
        assert got[g] == v[(len(v) - 1) // 2]


def test_intersect_distinct(ray_session):
    from raydoc.functions.joins import intersect_distinct
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3, None],
                                                 pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([2, 3, 3, 4],
                                                  pa.int64())}))
    got = sorted(r["k"] for r in
                 intersect_distinct(left, right, key="k").take_all())
    assert got == [2, 3]


def test_collapse_repeats_kernel(ray_session):
    # exercised through the sf0.001 query; semantics pinned here
    from raydoc.functions.textstats import collapse_repeats
    out = collapse_repeats("/root/testdata/sf0.001")
    for row in out.to_pylist():
        words = row["cleaned"].split(" ")
        assert all(a != b for a, b in zip(words, words[1:]))


# --- upsert / cohort / histogram / dup-ngram -------------------------------

def test_merge_upsert_semantics(ray_session):
    from raydoc.functions.joins import merge_upsert
    base = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array(["a", "b", "c"], pa.string()),
        "ver": pa.array([1, 1, 1], pa.int64()),
    }))
    upd = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 2], pa.int64()),
        "v": pa.array(["B", "D", "B2"], pa.string()),
        "ver": pa.array([2, 1, 1], pa.int64()),
    }))
    got = {r["k"]: (r["v"], r["ver"]) for r in
           merge_upsert(base, upd, key="k", version_col="ver",
                        num_buckets=4).take_all()}
    assert got[1] == ("a", 1)
    assert got[2] == ("B", 2)        # higher version wins
    assert got[3] == ("c", 1)
    assert got[4] == ("D", 1)        # insert
    # equal-version tie in base-vs-update goes to the update side
    base2 = rd.from_arrow(pa.table({"k": pa.array([9], pa.int64()),
                                    "v": pa.array(["old"], pa.string()),
                                    "ver": pa.array([1], pa.int64())}))
    upd2 = rd.from_arrow(pa.table({"k": pa.array([9], pa.int64()),
                                   "v": pa.array(["new"], pa.string()),
                                   "ver": pa.array([1], pa.int64())}))
    got2 = merge_upsert(base2, upd2, key="k", version_col="ver",
                        num_buckets=2).take_all()
    assert got2 == [{"k": 9, "v": "new", "ver": 1}]


def test_value_histogram_counts(ray_session):
    from raydoc.functions.windows import value_histogram
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    got = value_histogram(sf, n_bins=10)
    vals = pq.read_table(f"{sf}/events.parquet",
                         columns=["value"])["value"].to_numpy()
    lo, hi = vals.min(), vals.max()
    bins = np.minimum(np.floor((vals - lo) / ((hi - lo) / 10.0)),
                      9).astype(np.int64)
    import collections
    want = collections.Counter(bins)
    assert {r["bin"]: r["n"] for r in got.to_pylist()} == dict(want)
    assert sum(r["n"] for r in got.to_pylist()) == len(vals)


def test_cohort_retention_first_offset_is_cohort_size(ray_session):
    from raydoc.functions.windows import cohort_retention
    out = cohort_retention("/root/testdata/sf0.001").to_pandas()
    # offset 0 exists for every cohort and is its largest cell
    for _, sub in out.groupby("cohort_day"):
        assert 0 in set(sub["day_offset"])
        d0 = sub[sub["day_offset"] == 0]["n_users"].iloc[0]
        # no later offset can exceed the cohort's own size
        assert (sub["n_users"] <= d0).all()
        assert d0 >= 1


def test_dup_ngram_fraction_bounds(ray_session):
    from raydoc.functions.textstats import dup_ngram_fraction
    out = dup_ngram_fraction("/root/testdata/sf0.001").to_pylist()
    assert len(out) > 0
    assert all(0 <= r["n_dup"] <= r["n_grams"] for r in out)
    # the synthetic corpus has exact-duplicate docs => some dup grams
    assert any(r["n_dup"] > 0 for r in out)


def test_triangle_count_matches_bruteforce(ray_session):
    from raydoc.functions.graph import triangle_count
    import itertools
    rng = np.random.RandomState(11)
    n = 25
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.randint(0, n, (80, 2)) if a != b})
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64()),
    }))
    got = sorted((r["a"], r["b"], r["c"])
                 for r in triangle_count(ds, num_buckets=8).take_all())
    es = set(edges)
    want = sorted((a, b, c) for a, b, c in itertools.combinations(range(n), 3)
                  if (a, b) in es and (b, c) in es and (a, c) in es)
    assert got == want and len(want) > 0


def test_embedding_pca_matches_local_numpy(ray_session):
    import pyarrow.parquet as pq
    from raydoc.functions.similarity import embedding_pca
    sf = "/root/testdata/sf0.001"
    got = embedding_pca(sf, k=2).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    t = pq.read_table(f"{sf}/embeddings.parquet")
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])
    ids = np.asarray(t["vec_id"].to_pylist())
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    comps = evecs[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    Y = (X - mean) @ comps.T
    srt = np.argsort(ids)
    assert np.allclose(got[["pc1", "pc2"]].to_numpy(), Y[srt], atol=1e-8)
    # top component carries the most variance
    assert got["pc1"].var() >= got["pc2"].var()


def test_profile_columns_float_extremes_fold_numerically(ray_session):
    from raydoc.functions.profile import profile_columns
    t = pa.table({"f": pa.array([10.5, 2.5, 9.0, None], pa.float64())})
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2)])
    out = profile_columns(ds, ["f"]).to_pylist()[0]
    # '10.5' < '2.5' lexically — a string fold would return min '10.5'
    assert out["min_val"] == "2.5" and out["max_val"] == "10.5"
    assert out["n_nonnull"] == 3
    import pytest as _pt
    with _pt.raises(ValueError):
        profile_columns(rd.from_arrow(pa.table(
            {"ts": pa.array([1], pa.timestamp("us"))})), ["ts"])


def test_pagerank_modes_agree_on_sink_nodes(ray_session):
    from raydoc.functions.graph import pagerank
    edges = [("a", "b"), ("c", "b"), ("c", "a")]   # b is a sink
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string()),
    }))
    r1 = {r["node"]: r["rank_fp"] for r in
          pagerank(ds, n_iter=3, num_buckets=4).take_all()}
    r2 = {r["node"]: r["rank_fp"] for r in
          pagerank(ds, n_iter=3, num_buckets=4,
                   ranks_in="broadcast").take_all()}
    assert r1 == r2 and set(r1) == {"a", "b", "c"}


def test_triangle_count_pipe_in_string_ids(ray_session):
    from raydoc.functions.graph import triangle_count
    # ('1|2','3') must NOT be closed by edge ('1','2|3')
    edges = [("1|2", "9"), ("9", "x"), ("1", "2|3")]
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.string()),
        "b": pa.array([e[1] for e in edges], pa.string()),
    }))
    assert triangle_count(ds, num_buckets=4).count() == 0


def test_resample_ffill_carries_last_value(ray_session):
    from raydoc.functions.windows import resample_ffill
    import pyarrow.parquet as pq
    import pandas as pd
    sf = "/root/testdata/sf0.001"
    got = resample_ffill(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    # spot-check a user: every grid value equals the latest event value
    # at-or-before the grid instant (max event_id on ts ties)
    uid = int(got["user_id"].iloc[0])
    sub = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
    sub = sub.drop_duplicates("ts", keep="last")
    for _, row in got[got["user_id"] == uid].head(48).iterrows():
        le = sub[sub["ts"] <= row["hour"]]
        assert len(le) > 0                      # grid starts after 1st event
        assert row["value"] == le["value"].iloc[-1]
    # grid is hourly and inside the span
    hours = got[got["user_id"] == uid]["hour"]
    assert ((hours.dt.minute == 0) & (hours.dt.second == 0)).all()


def test_inverted_index_postings(ray_session):
    from raydoc.functions.textstats import inverted_index
    out = inverted_index("/root/testdata/sf0.001", min_df=2).to_pylist()
    assert len(out) > 0
    for r in out:
        ids = [int(x) for x in r["postings"].split(",")]
        assert r["df"] == len(ids) >= 2
        assert ids == sorted(ids) == sorted(set(ids))


def test_strip_dup_ngrams_crafted(ray_session, tmp_path):
    """First occurrence survives; later occurrences lose their covered
    span; short/unique/NULL docs pass through."""
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import strip_dup_ngrams

    g = "a b c d e f g h"                      # the duplicated 8-gram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            g + " x y",                        # first occurrence: kept
            "z " + g + " w",                   # dup at s=2: 8 words cut
            "p q r s t u v aa bb cc",          # unique grams: untouched
            "short doc",                       # < n words: untouched
            None,                              # NULL -> ''
        ], pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = {r["doc_id"]: r
           for r in strip_dup_ngrams(str(tmp_path)).to_pylist()}
    assert out[1]["clean_text"] == g + " x y"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "z w"
    assert out[2]["n_removed"] == 8 and out[2]["n_words"] == 10
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "short doc"
    assert out[5]["clean_text"] == "" and out[5]["n_words"] == 1


def test_strip_dup_ngrams_self_overlap(ray_session, tmp_path):
    """A gram repeated INSIDE one doc: the second occurrence's span is
    removed, the first kept."""
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import strip_dup_ngrams

    words = "a b c d e f g h".split() * 2      # same 8-gram at s=1, s=9
    docs = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array([" ".join(words)], pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    row = strip_dup_ngrams(str(tmp_path)).to_pylist()[0]
    assert row["clean_text"] == "a b c d e f g h"
    assert row["n_removed"] == 8 and row["n_words"] == 16


def test_strip_dup_ngrams_randomized_vs_duckdb(ray_session, tmp_path):
    """Randomized equivalence with the SQL twin on adversarial corpora:
    tiny vocab (guaranteed gram collisions), empty-string words
    (multi-space runs), duplicated segments, short docs."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from raydoc.functions.textstats import strip_dup_ngrams

    rng = np.random.RandomState(123)
    vocab = ["a", "b", "c", "aa", "bb", ""]
    texts = []
    for i in range(60):
        m = int(rng.randint(0, 26))
        words = [vocab[j] for j in rng.randint(0, len(vocab), m)]
        texts.append(" ".join(words))
    texts[10] = texts[5]                      # exact dup doc
    texts[20] = texts[5] + " c " + texts[7]   # embedded dup segment
    docs = pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")

    mine = strip_dup_ngrams(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(entrymod.oracle_sql()["strip_dup_ngrams"]).fetchdf()
    mine = mine.sort_values("doc_id", ignore_index=True)
    exp = exp.sort_values("doc_id", ignore_index=True)
    for col in ["doc_id", "clean_text", "n_words", "n_removed"]:
        assert list(mine[col]) == list(exp[col]), col


def test_chunk_documents_boundaries(ray_session, tmp_path):
    """Chunk arithmetic: full coverage, exact overlap, short docs and
    exact-boundary docs emit the right chunk set."""
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import chunk_documents

    w = [f"w{i}" for i in range(1, 131)]       # 130 words
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            " ".join(w),                       # 130 -> chunks at 1, 113
            " ".join(w[:128]),                 # exactly one chunk
            "tiny doc",                        # short -> itself
            None,                              # NULL -> one '' chunk
        ], pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = chunk_documents(str(tmp_path), chunk=128,
                          overlap=16).to_pandas()
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_idx"]) == [1, 2]
    assert d1.iloc[0]["chunk_text"] == " ".join(w[:128])
    assert d1.iloc[1]["chunk_text"] == " ".join(w[112:130])
    assert list(d1["n_chunk_words"]) == [128, 18]
    assert len(out[out["doc_id"] == 2]) == 1
    assert out[out["doc_id"] == 3].iloc[0]["chunk_text"] == "tiny doc"
    assert out[out["doc_id"] == 4].iloc[0]["chunk_text"] == ""


def test_chunk_documents_reconstruction_property(ray_session, tmp_path):
    """For every doc: dropping each chunk's leading `overlap` words
    (except the first chunk) and concatenating reconstructs the
    original word sequence exactly — full coverage, no duplication."""
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.textstats import chunk_documents

    rng = np.random.RandomState(17)
    texts = [" ".join(f"w{rng.randint(100)}"
                      for _ in range(int(rng.randint(1, 300))))
             for _ in range(40)]
    docs = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    chunk, overlap = 64, 16
    out = chunk_documents(str(tmp_path), chunk=chunk,
                          overlap=overlap).to_pandas()
    for d, sub in out.groupby("doc_id"):
        sub = sub.sort_values("chunk_idx")
        words = []
        for i, row in enumerate(sub.itertuples(index=False)):
            ws = row.chunk_text.split(" ")
            words.extend(ws if i == 0 else ws[overlap:])
        assert " ".join(words) == texts[d], d


def test_knn_graph_prefix_property(ray_session):
    """knn(k=3) must be the rank-prefix of knn(k=6) for every vector."""
    from raydoc.functions.similarity import knn_graph

    small = knn_graph("/root/testdata/sf0.001", k=3).to_pandas()
    big = knn_graph("/root/testdata/sf0.001", k=6).to_pandas()

    def key(df):
        return {(r.vec_id, r.nn_rank): (r.neighbor_id, r.d2)
                for r in df.itertuples(index=False)}

    ks, kb = key(small), key(big)
    assert set(ks) <= set(kb)
    assert all(kb[k] == v for k, v in ks.items())


def test_constraint_report_detects_injected_violations(ray_session,
                                                       tmp_path):
    """Every rule fires on a corpus with known injected violations."""
    import pyarrow.parquet as pq
    from raydoc.functions.profile import constraint_report

    long = " ".join(["w"] * 25)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([long, long, "short doc", None, long + " x"],
                         pa.string()),
    }), tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 99, 10], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "l_quantity": pa.array([5.0, 0.0, 51.0, -2.0], pa.float64()),
    }), tmp_path / "lineitem.parquet")

    out = dict(zip(*[constraint_report(str(tmp_path)).column(c)
                     .to_pylist() for c in ("rule", "n_violations")]))
    assert out == {"doc_min_words_20": 2,     # "short doc" + NULL
                   "doc_text_not_null": 1,
                   "doc_text_unique": 2,      # the two identical longs
                   "lineitem_qty_range": 3,
                   "orders_fk_customer": 1}


def test_bloom_int_pushdown_no_false_negatives(ray_session):
    """bloom_filter_member_ints never drops a true member (pushdown can
    only ADD false positives — the exact verify join removes them), and
    the full pushdown query equals the plain semi-join result."""
    import numpy as np
    import ray.data as rd
    from raydoc.functions.dedup import (bloom_build_ints,
                                        bloom_filter_member_ints)

    rng = np.random.RandomState(5)
    members = np.unique(rng.randint(0, 1 << 40, 2_000).astype(np.int64))
    build = rd.from_arrow(pa.table({"k": pa.array(members, pa.int64())}))
    bloom = bloom_build_ints(build, "k", n_bits=1 << 16)
    probe_keys = np.concatenate(
        [members, rng.randint(0, 1 << 40, 3_000).astype(np.int64)])
    probe = rd.from_arrow(pa.table({"k": pa.array(probe_keys, pa.int64())}))
    kept = set(bloom_filter_member_ints(probe, bloom, "k", 1 << 16)
               .to_pandas()["k"])
    assert set(members.tolist()) <= kept     # zero false negatives


def test_bloom_filtered_revenue_equals_plain_semijoin(ray_session):
    """The bloom-pushdown plan is exact: equals DuckDB's IN-subquery."""
    import duckdb
    from raydoc.functions.relational import q_bloom_filtered_revenue
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = q_bloom_filtered_revenue(sf).to_pandas()
    con = duckdb.connect()
    for tb in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"'{sf}/{tb}.parquet'")
    exp = con.execute(e.oracle_sql()["bloom_filtered_revenue"]).df()
    assert got.astype(str).values.tolist() == exp.astype(str).values.tolist()


def test_kfold_split_is_a_partition(ray_session):
    """Folds 0..k-1, every doc exactly once, deterministic across runs."""
    from raydoc.functions.textstats import kfold_split

    sf = "/root/testdata/sf0.001"
    a = kfold_split(sf).to_pandas()
    b = kfold_split(sf).to_pandas()
    assert a.equals(b)
    assert set(a["fold"]) <= set(range(5))
    assert a["doc_id"].is_unique and len(a) == 500
