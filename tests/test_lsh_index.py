"""Cross-job incremental NEAR-dup index (state/lsh_index.py)."""

import pyarrow as pa

import ray
import ray.data as rd

from raydoc.state.lsh_index import (create_lsh_index, incremental_neardup,
                                    load_lsh_index, lsh_index_stats,
                                    save_lsh_index)


def _docs(texts, start_id=0):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)),
                           pa.int64()),
        "text": pa.array(texts, pa.string())}))


_CORPUS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a completely different sentence about distributed query engines",
    "ray data streams arrow blocks through the object store with backpressure",
    "minhash signatures band into lsh buckets for near duplicate detection",
]


def test_reingest_identical_drops_everything(ray_session):
    index = create_lsh_index(n_shards=2)
    kept1 = incremental_neardup(_docs(_CORPUS), index,
                                token_salt=b"job-a").count()
    kept2 = incremental_neardup(_docs(_CORPUS), index,
                                token_salt=b"job-b").count()
    assert kept1 == len(_CORPUS)
    assert kept2 == 0


def test_near_duplicate_dropped_disjoint_kept(ray_session):
    index = create_lsh_index(n_shards=2)
    assert incremental_neardup(_docs(_CORPUS), index,
                               token_salt=b"a").count() == len(_CORPUS)
    # paraphrase-grade mutation: one appended token — exact dedup would
    # keep it, the LSH index must drop it
    near = [t + " extra" for t in _CORPUS]
    fresh = ["entirely novel text nothing shares shingles with this one",
             "another brand new document with its own unique vocabulary"]
    assert incremental_neardup(_docs(near), index,
                               token_salt=b"b").count() == 0
    assert incremental_neardup(_docs(fresh, 100), index,
                               token_salt=b"c").count() == len(fresh)


def test_retry_same_salt_replays_first_answer(ray_session):
    """A re-executed task (same content, same salt) must get its
    first-attempt answer back — its own bands must not read as dups."""
    index = create_lsh_index(n_shards=1)
    kept1 = incremental_neardup(_docs(_CORPUS), index,
                                token_salt=b"same").count()
    kept_retry = incremental_neardup(_docs(_CORPUS), index,
                                     token_salt=b"same").count()
    assert kept1 == len(_CORPUS)
    assert kept_retry == len(_CORPUS)


def test_verify_mode_never_drops_more_than_contract(ray_session):
    contract = create_lsh_index(n_shards=2)
    verify = create_lsh_index(n_shards=2, verify_threshold=0.5)
    near = [t + " tail" for t in _CORPUS]
    for salt, batch in ((b"1", _CORPUS), (b"2", near)):
        kc = incremental_neardup(_docs(batch), contract,
                                 token_salt=salt).count()
        kv = incremental_neardup(_docs(batch), verify,
                                 verify_threshold=0.5,
                                 token_salt=salt).count()
        assert kv >= kc
    # exact duplicate has estimated Jaccard 1.0 — dropped in both modes
    assert incremental_neardup(_docs(_CORPUS), verify,
                               verify_threshold=0.5,
                               token_salt=b"3").count() == 0


def test_save_load_roundtrip(ray_session, tmp_path):
    index = create_lsh_index(n_shards=3)
    incremental_neardup(_docs(_CORPUS), index, token_salt=b"a").count()
    before = lsh_index_stats(index)
    save_lsh_index(index, str(tmp_path / "lsh"))
    loaded = load_lsh_index(str(tmp_path / "lsh"))
    assert lsh_index_stats(loaded) == before
    assert incremental_neardup(_docs(_CORPUS), loaded,
                               token_salt=b"b").count() == 0
    for sh in index + loaded:
        ray.kill(sh)
