"""Regime equality for the adaptive MinHash near-dup family: a dup-heavy
corpus labeled identically by the driver-resident small regime
(``max_driver_pairs`` high) and the fully distributed regime
(``max_driver_pairs=0`` forces the semi-join + bucketed-hash-join verify
and distributed min-label component propagation). This is the at-scale
path a 100 TB web-corpus dedup hits first — equality here pins that the
scale path cannot drift from the oracle-backed small path."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
         "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


def _dup_heavy_corpus(tmp_path, n_groups=40, group_size=4, n_singletons=40,
                      seed=7):
    """~200 docs, 30-50% dup mass: each group is one base text plus
    small perturbations (a few words swapped), so LSH proposes many
    candidate pairs and the Jaccard verify keeps most of them."""
    rng = random.Random(seed)
    ids, texts = [], []
    next_id = 1
    for g in range(n_groups):
        base = [rng.choice(WORDS) for _ in range(60)]
        for m in range(group_size):
            words = list(base)
            for _ in range(m):  # member 0 is the base itself
                words[rng.randrange(len(words))] = rng.choice(WORDS)
            ids.append(next_id)
            texts.append(" ".join(words))
            next_id += 1
    for s in range(n_singletons):
        ids.append(next_id)
        texts.append(" ".join(rng.choice(WORDS) for _ in range(60)))
        next_id += 1
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_minhash_clusters_distributed_equals_driver(ray_session, tmp_path):
    from raydoc.functions.dedup import minhash_lsh_clusters

    sf = _dup_heavy_corpus(tmp_path)
    small = minhash_lsh_clusters(sf).to_pandas()
    dist = minhash_lsh_clusters(sf, max_driver_pairs=0).to_pandas()

    assert small.equals(dist)
    # the corpus must actually exercise clustering (non-trivial components)
    n_nontrivial = (small["cluster"] != small["doc_id"]).sum()
    assert n_nontrivial > 50


def test_neardup_dedup_corpus_distributed_equals_driver(ray_session,
                                                        tmp_path):
    from raydoc.functions.dedup import neardup_dedup_corpus

    sf = _dup_heavy_corpus(tmp_path, seed=11)
    small = neardup_dedup_corpus(sf).to_pandas()
    dist = neardup_dedup_corpus(sf, max_driver_pairs=0).to_pandas()

    assert small.equals(dist)
    assert (small["n_dups"] > 1).sum() > 20   # real dup clusters survived


def test_ngram_jaccard_distributed_equals_driver(ray_session, tmp_path):
    """Same regime-equality pin for the exact n-gram verify family:
    max_driver_pairs=0 forces the semi-join + bucketed-hash-join text
    path; scores and pairs must match the driver regime exactly."""
    from raydoc.functions.dedup import (ngram_containment_pairs,
                                        ngram_jaccard_pairs)

    sf = _dup_heavy_corpus(tmp_path, seed=13)
    for fn in (ngram_jaccard_pairs, ngram_containment_pairs):
        small = fn(sf).to_pandas()
        dist = fn(sf, max_driver_pairs=0).to_pandas()
        assert small.equals(dist)
        assert len(small) > 20


def test_verified_pairs_regimes_agree(ray_session, tmp_path):
    """The verify stage itself (pair set before labeling) agrees between
    regimes — catches a drift hidden by labeling coincidences."""
    import ray.data as rd
    from raydoc.functions.dedup import _minhash_verified_pairs

    sf = _dup_heavy_corpus(tmp_path, n_groups=20, n_singletons=20, seed=3)
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    small = sorted(map(tuple, _minhash_verified_pairs(
        ds, 0.5, 16, 3, "doc_id").to_pandas().values))
    dist = sorted(map(tuple, _minhash_verified_pairs(
        ds, 0.5, 16, 3, "doc_id", max_driver_pairs=0).to_pandas().values))
    assert small == dist
    assert len(small) > 30
