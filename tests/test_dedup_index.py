"""Shared mutable dedup index: cross-ingest dedup, first-wins atomicity,
persistence round-trip."""

import pyarrow as pa

import ray.data as rd

from raydoc.state.dedup_index import (create_dedup_index, incremental_dedup,
                                      index_stats, load_index, save_index)


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }))


def test_incremental_dedup_across_ingests(ray_session):
    index = create_dedup_index(n_shards=3)

    # ingest 1: one internal duplicate
    a = incremental_dedup(_ds(["alpha", "beta", "alpha", "gamma"]),
                          index).to_pandas()
    assert sorted(a["text"]) == ["alpha", "beta", "gamma"]

    # ingest 2 (a separate Dataset run): overlaps ingest 1
    b = incremental_dedup(_ds(["beta", "delta", "gamma", "epsilon"]),
                          index).to_pandas()
    assert sorted(b["text"]) == ["delta", "epsilon"]

    stats = index_stats(index)
    assert stats["total_digests"] == 5
    assert stats["n_shards"] == 3


def test_index_save_load_roundtrip(ray_session, tmp_path):
    index = create_dedup_index(n_shards=2)
    incremental_dedup(_ds(["one", "two", "three"]), index).to_pandas()
    save_index(index, str(tmp_path / "idx"))

    restored = load_index(str(tmp_path / "idx"))
    assert index_stats(restored)["total_digests"] == 3
    out = incremental_dedup(_ds(["two", "four"]), restored).to_pandas()
    assert sorted(out["text"]) == ["four"]


def test_load_index_from_empty_dir(ray_session, tmp_path):
    """A pre-created empty index directory must yield a working fresh
    index (not a zero-shard one that ZeroDivisionErrors every batch)."""
    d = tmp_path / "empty_idx"
    d.mkdir()
    index = load_index(str(d))
    out = incremental_dedup(_ds(["x", "x", "y"]), index).to_pandas()
    assert sorted(out["text"]) == ["x", "y"]


def test_seen_then_add_idempotent_under_retry(ray_session):
    """A retried call with the same token gets its first-attempt answer
    (no silent batch drop on Ray task re-execution)."""
    import ray as _ray

    from raydoc.state.dedup_index import DedupIndexShard

    sh = DedupIndexShard.remote()
    digs = [b"a" * 16, b"b" * 16]
    first = _ray.get(sh.seen_then_add.remote(digs, b"tok1"))
    assert first == [False, False]
    retry = _ray.get(sh.seen_then_add.remote(digs, b"tok1"))
    assert retry == [False, False]          # memoized, not re-evaluated
    other = _ray.get(sh.seen_then_add.remote(digs, b"tok2"))
    assert other == [True, True]            # a NEW batch sees the dups
