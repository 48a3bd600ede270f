"""m4_downsample / mannwhitney_value / vocab_growth / cdc_chunk_stats:
brute-force oracles and the CDC invariance properties the DuckDB gate
cannot express."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_events(tmp_path, seed: int, n: int = 4000):
    rng = np.random.RandomState(seed)
    ts = pd.to_datetime(
        rng.randint(0, 10 * 86400, n) * 1_000_000
        + np.int64(1_700_000_000_000_000), unit="us")
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, 50, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click", "error"])[rng.randint(0, 3, n)]),
        # negative values, ties, and a few extreme magnitudes
        "value": pa.array(np.round(
            rng.standard_normal(n) * 10 ** rng.randint(0, 4, n), 2)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _mk_docs(tmp_path, seed: int, texts=None, nd: int = 80):
    rng = np.random.RandomState(seed)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    if texts is None:
        texts = []
        for _ in range(nd):
            k = int(rng.randint(0, 60))
            texts.append(" ".join(rng.choice(vocab, k)) if k else "")
    nd = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * nd),
        "source": pa.array(["web"] * nd),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    }), tmp_path / "documents.parquet")
    return str(tmp_path)


def _sql(sf, q):
    con = duckdb.connect()
    for v in ("events", "documents"):
        try:
            con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                        f"read_parquet('{sf}/{v}.parquet')")
        except duckdb.IOException:
            pass
    return con.execute(q).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False))


@pytest.mark.parametrize("seed", [7, 8])
def test_m4_matches_twin(ray_session, tmp_path, seed):
    from raydoc.functions.windows import m4_downsample
    import __ray_entry__ as e
    sf = _mk_events(tmp_path, seed)
    got = m4_downsample(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["m4_downsample"])
    assert _canon(got) == _canon(exp)


def test_m4_keeps_extremes_and_bounds(ray_session, tmp_path):
    from raydoc.functions.windows import m4_downsample
    sf = _mk_events(tmp_path, 9)
    got = m4_downsample(sf).to_pandas()
    raw = pq.read_table(sf + "/events.parquet").to_pandas()
    raw["cents"] = (raw["value"] * 100).round().astype("int64")
    # the global per-type min/max always survive downsampling
    for et, g in raw.groupby("event_type"):
        kept = got[got["event_type"] == et]["cents"]
        assert g["cents"].min() == kept.min()
        assert g["cents"].max() == kept.max()
    # at most 4 points per (type, 24h bucket)
    got["b"] = got["ts"].astype("int64") // (24 * 3_600_000_000)
    assert got.groupby(["event_type", "b"]).size().max() <= 4


@pytest.mark.parametrize("seed", [21, 22])
def test_mannwhitney_matches_bruteforce(ray_session, tmp_path, seed):
    from raydoc.functions.windows import mannwhitney_value
    sf = _mk_events(tmp_path, seed, n=1500)
    got = mannwhitney_value(sf).to_pandas().set_index("event_type")
    raw = pq.read_table(sf + "/events.parquet").to_pandas()
    cents = (raw["value"] * 100).round().astype("int64").to_numpy()
    # brute force: tie-averaged ranks x2 over the full series
    order = np.argsort(cents, kind="stable")
    ranks2 = np.empty(len(cents), np.int64)
    sorted_c = cents[order]
    i = 0
    while i < len(sorted_c):
        j = i
        while j < len(sorted_c) and sorted_c[j] == sorted_c[i]:
            j += 1
        ranks2[order[i:j]] = (i + 1) + j  # 2 * avg(i+1 .. j)
        i = j
    for et in raw["event_type"].unique():
        m = (raw["event_type"] == et).to_numpy()
        r2 = int(ranks2[m].sum())
        n1 = int(m.sum())
        assert got.loc[et, "n"] == n1
        assert got.loc[et, "rank_sum2"] == r2
        assert got.loc[et, "u2"] == r2 - n1 * (n1 + 1)


@pytest.mark.parametrize("seed", [31, 32])
def test_vocab_growth_matches_bruteforce(ray_session, tmp_path, seed):
    import re

    from raydoc.functions.textstats import vocab_growth
    sf = _mk_docs(tmp_path, seed)
    step = 50
    got = vocab_growth(sf, step=step, num_buckets=8).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet").to_pandas() \
        .sort_values("doc_id")
    # the canonical sequential definition: ASCII word runs over lowered
    # text (= the DuckDB twin's regexp_extract_all(lower(text), '\w+'))
    word = re.compile(r"[0-9A-Za-z_]+")
    first = {}
    pos = 0
    for txt in docs["text"]:
        for tok in word.findall((txt or "").lower()):
            first.setdefault(tok, pos)
            pos += 1
    want = {}
    for p in first.values():
        want[p // step] = want.get(p // step, 0) + 1
    got_map = dict(zip(got["pos_bucket"], got["new_terms"]))
    assert got_map == want
    assert list(got["vocab_size"]) == list(np.cumsum(got["new_terms"]))
    assert int(got["vocab_size"].iloc[-1]) == len(first)


def test_vocab_growth_non_ascii_consistent(ray_session, tmp_path):
    """Non-ASCII word chars must not desynchronize bucket token counts
    from in-bucket positions (the two tokenizers are pinned to the same
    ASCII class over lowered text): 'déjà' is 2 tokens ('d', 'j') on both
    sides, never 3-vs-2."""
    import re

    from raydoc.functions.textstats import vocab_growth
    texts = ["déjà vu encore déjà", "naïve café crème naïve",
             "plain ascii words here", "déjà naïve mixtures vu café",
             "zürich über straße zürich", "plain words again encore"]
    t = pa.table({"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    step = 4
    got = vocab_growth(str(tmp_path), step=step, num_buckets=3).to_pandas()

    word = re.compile(r"[0-9A-Za-z_]+")
    first, pos = {}, 0
    for txt in texts:
        for tok in word.findall(txt.lower()):
            first.setdefault(tok, pos)
            pos += 1
    want = {}
    for p in first.values():
        want[p // step] = want.get(p // step, 0) + 1
    assert dict(zip(got["pos_bucket"], got["new_terms"])) == want
    assert int(got["vocab_size"].iloc[-1]) == len(first)


def _cdc_stats(sf):
    from raydoc.functions.dedup import cdc_chunk_stats
    return cdc_chunk_stats(sf, avg_bits=5).to_pandas().iloc[0]


def test_cdc_mass_conservation(ray_session, tmp_path):
    sf = _mk_docs(tmp_path, 41)
    docs = pq.read_table(sf + "/documents.parquet").to_pandas()
    total = sum(len((t or "").encode()) for t in docs["text"])
    r = _cdc_stats(sf)
    assert r["total_bytes"] == total
    assert r["distinct_bytes"] <= r["total_bytes"]
    assert r["distinct_chunks"] <= r["total_chunks"]
    assert 0 <= r["dup_byte_pct"] <= 100


def test_cdc_duplicate_doc_adds_no_distinct_mass(ray_session,
                                                 tmp_path_factory):
    base = ["the quick brown fox jumps over the lazy dog " * 30,
            "pack my box with five dozen liquor jugs " * 25]
    sf1 = _mk_docs(tmp_path_factory.mktemp("a"), 0, texts=base)
    sf2 = _mk_docs(tmp_path_factory.mktemp("b"), 0, texts=base + base)
    r1, r2 = _cdc_stats(sf1), _cdc_stats(sf2)
    assert r2["total_chunks"] == 2 * r1["total_chunks"]
    assert r2["total_bytes"] == 2 * r1["total_bytes"]
    assert r2["distinct_chunks"] == r1["distinct_chunks"]
    assert r2["distinct_bytes"] == r1["distinct_bytes"]


def test_cdc_shift_invariance(ray_session, tmp_path_factory):
    """THE content-defined-chunking property: prepending an edit to a
    long doc leaves almost all chunk digests intact, so the duplicate
    mass vs the original stays near 100% (a fixed-size chunker would
    share ~0%)."""
    long_doc = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
                * 80)
    edited = "EDIT>>> " + long_doc
    sf = _mk_docs(tmp_path_factory.mktemp("c"), 0,
                  texts=[long_doc, edited])
    r = _cdc_stats(sf)
    # the two docs share nearly all chunk bytes: distinct mass is far
    # below the 2x total an unshared pair would produce
    assert r["distinct_bytes"] < r["total_bytes"] * 0.6
    assert r["dup_byte_pct"] >= 40


def test_changepoint_finds_step(ray_session, tmp_path):
    """A clean level shift: 50 hours at ~10.00 then 50 at ~500.00 —
    the argmax split must land exactly at the boundary."""
    n = 100
    ts = pd.to_datetime(np.arange(n) * 3_600_000_000
                        + np.int64(1_700_000_000_000_000), unit="us")
    vals = np.where(np.arange(n) < 50, 10.0, 500.0)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    from raydoc.functions.windows import value_changepoint
    got = value_changepoint(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got["n_before"].iloc[0] == 50
    assert got["n_after"].iloc[0] == 50


def test_holt_constant_series_converges(ray_session, tmp_path):
    """On a constant 100.00/hour series the level locks to 10000 cents
    and the trend decays to 0 — the fixed point of the recurrence."""
    n = 120
    ts = pd.to_datetime(np.arange(n) * 3_600_000_000
                        + np.int64(1_700_000_000_000_000), unit="us")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.full(n, 100.0)),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    from raydoc.functions.windows import holt_forecast_hourly
    got = holt_forecast_hourly(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got["n_hours"].iloc[0] == n
    assert abs(got["level"].iloc[0] - 10000) <= 1
    assert abs(got["trend"].iloc[0]) <= 1
    assert abs(got["forecast_next"].iloc[0] - 10000) <= 2


def test_dup_source_matrix_counts_cross_source_digests(ray_session,
                                                       tmp_path):
    """Constructed corpus: texts A and B live in web+pdf, text C in
    web+pdf+chat, text D only in web — the matrix counts distinct
    shared digests per unordered source pair."""
    texts = ["A", "A", "B", "B", "C", "C", "C", "D", "A"]
    srcs = ["web", "pdf", "web", "pdf", "web", "pdf", "chat", "web",
            "web"]  # trailing duplicate A-in-web must NOT double-count
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([1] * n, pa.int64()),
    }), tmp_path / "documents.parquet")
    from raydoc.functions.textstats import dup_source_matrix
    got = dup_source_matrix(str(tmp_path)).to_pandas()
    want = {("chat", "pdf"): 1,       # C
            ("chat", "web"): 1,       # C
            ("pdf", "web"): 3}        # A, B, C
    assert dict(zip(zip(got["src_a"], got["src_b"]),
                    got["shared_texts"])) == want


def test_token_fertility_matches_twin(ray_session, tmp_path):
    from raydoc.functions.textstats import token_fertility
    import __ray_entry__ as e
    sf = _mk_docs(tmp_path, 55)
    got = token_fertility(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["token_fertility"])
    assert _canon(got) == _canon(exp)


def test_conversation_structure_flags_violations(ray_session):
    """Constructed conversations: one valid, one with a turn_idx gap,
    one breaking the role cycle, one with an empty turn."""
    from raydoc.functions.textstats import conversation_structure

    def conv(cid, idxs, roles, texts):
        n = len(idxs)
        return pa.table({
            "conv_id": pa.array([cid] * n, pa.string()),
            "turn_idx": pa.array(idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us"))})

    t = pa.concat_tables([
        conv("ok", [0, 1, 2], ["user", "assistant", "tool"],
             ["a", "b", "c"]),
        conv("gap", [0, 2, 3], ["user", "assistant", "tool"],
             ["a", "b", "c"]),
        conv("role", [0, 1], ["assistant", "user"], ["a", "b"]),
        conv("empty", [0, 1], ["user", "assistant"], ["a", ""]),
    ])
    got = conversation_structure("unused", transcripts=t).to_pandas()
    r = got.iloc[0]
    assert r["n_convs"] == 4
    assert r["valid_convs"] == 1
    assert r["dense_violations"] == 1
    assert r["role_violations"] == 1
    assert r["empty_turn_convs"] == 1
    assert r["total_turns"] == 10


def test_conversation_structure_synthetic_corpus_valid(ray_session):
    """The derived transcript corpus is structurally valid by
    construction — the gate must report 100% valid."""
    from raydoc.functions.textstats import conversation_structure
    got = conversation_structure("/root/testdata/sf0.001").to_pandas()
    r = got.iloc[0]
    assert r["n_convs"] > 0
    assert r["valid_convs"] == r["n_convs"]
    assert r["dense_violations"] == 0


def test_quantile_normalize_aligns_distributions(ray_session, tmp_path):
    """After normalization every type's min maps to the global min and
    its max to the global max, and outputs take only observed global
    values — the defining property of quantile normalization."""
    from raydoc.functions.windows import quantile_normalize_values
    sf = _mk_events(tmp_path, 77, n=2000)
    got = quantile_normalize_values(sf).to_pandas()
    raw = pq.read_table(sf + "/events.parquet").to_pandas()
    gc = (raw["value"] * 100).round().astype("int64")
    assert set(got["qnorm_cents"]).issubset(set(gc))
    for et, grp in got.groupby("event_type"):
        assert grp["qnorm_cents"].min() == gc.min()
        assert grp["qnorm_cents"].max() == gc.max()
