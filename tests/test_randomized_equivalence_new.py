"""Randomized DuckDB equivalence for the newest oracle-backed operators
(trailing window, attribution, audits, regression tree, loss-mask spans,
TextRank) — adversarial synthetic tables (skewed users, tied timestamps,
negative/zero values, empty and one-token documents), not just the fixed
driver corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_events(tmp_path, seed: int, n: int = 2500):
    rng = np.random.RandomState(seed)
    users = rng.zipf(1.3, n) % 31
    ts = pd.to_datetime(
        rng.randint(0, 9 * 86400, n) * 1_000_000
        + np.int64(1_700_000_000_000_000), unit="us")
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click", "error", "purchase"])[
                rng.randint(0, 4, n)]),
        # include zeros, negatives and huge magnitudes (Benford skips <=0)
        "value": pa.array(np.round(
            rng.standard_normal(n) * 10 ** rng.randint(0, 5, n), 2)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


_VOCAB = ("hash join sort scan merge spark window stream batch table "
          "query index shuffle block arrow ray data actor pool").split()


def _mk_documents(tmp_path, seed: int, n: int = 120):
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(n):
        k = int(rng.randint(0, 90))          # includes EMPTY documents
        texts.append(" ".join(rng.choice(_VOCAB, k)) if k else "")
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["synth"] * n),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _sql(sf, q, view):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {view} AS SELECT * FROM "
                f"read_parquet('{sf}/{view}.parquet')")
    return con.execute(q).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False))


@pytest.mark.parametrize("seed", [41, 42])
def test_trailing_hour_value_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.windows import trailing_hour_value
    sf = _mk_events(tmp_path, seed)
    got = trailing_hour_value(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["trailing_hour_value"], "events")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [43, 44])
def test_attribution_linear_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.windows import attribution_linear
    sf = _mk_events(tmp_path, seed)
    got = attribution_linear(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["attribution_linear"], "events")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [45, 46])
def test_association_rules_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.audit import association_rules
    sf = _mk_events(tmp_path, seed)
    got = association_rules(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["association_rules"], "events")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [47, 48])
def test_benford_values_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.audit import benford_values
    sf = _mk_events(tmp_path, seed)
    got = benford_values(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["benford_values"], "events")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [49, 50])
def test_regression_tree_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.mltree import value_regression_tree
    sf = _mk_events(tmp_path, seed)
    got = value_regression_tree(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["value_regression_tree"], "events")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [51, 52])
def test_cohen_kappa_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.audit import cohen_kappa
    sf = _mk_documents(tmp_path, seed)
    got = cohen_kappa(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["cohen_kappa"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [53, 54])
def test_loss_mask_spans_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.textstats import loss_mask_spans
    sf = _mk_documents(tmp_path, seed)
    got = loss_mask_spans(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["loss_mask_spans"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [55, 56])
def test_textrank_windows_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.textstats import textrank_windows
    sf = _mk_documents(tmp_path, seed)
    got = textrank_windows(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["textrank_windows"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [57, 58])
def test_url_path_rollup_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.textstats import url_path_rollup
    sf = _mk_documents(tmp_path, seed)
    got = url_path_rollup(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["url_path_rollup"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [59, 60])
def test_tfidf_top_terms_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.textstats import tfidf_top_terms
    sf = _mk_documents(tmp_path, seed)
    got = tfidf_top_terms(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["tfidf_top_terms"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [61, 62])
def test_pack_sequences_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.textstats import pack_sequences
    sf = _mk_documents(tmp_path, seed)
    got = pack_sequences(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["pack_sequences"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [63, 64])
def test_decontaminate_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.textstats import decontaminate
    sf = _mk_documents(tmp_path, seed)
    got = decontaminate(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["decontaminate"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [65, 66])
def test_simhash_neardups_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.dedup import simhash_neardups
    sf = _mk_documents(tmp_path, seed)
    got = simhash_neardups(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["simhash_neardups"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [67])
def test_minhash_clusters_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.dedup import minhash_lsh_clusters
    sf = _mk_documents(tmp_path, seed)
    got = minhash_lsh_clusters(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["minhash_clusters"], "documents")
    assert _canon(got) == _canon(exp)


@pytest.mark.parametrize("seed", [68])
def test_ngram_jaccard_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as e
    from raydoc.functions.dedup import ngram_jaccard_pairs
    sf = _mk_documents(tmp_path, seed)
    got = ngram_jaccard_pairs(sf).to_pandas()
    exp = _sql(sf, e.oracle_sql()["ngram_jaccard"], "documents")
    assert _canon(got) == _canon(exp)
