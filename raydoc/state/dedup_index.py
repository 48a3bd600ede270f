"""Shared mutable dedup index — the one slot where raw Ray actors are the
right tool (a Dataset can't express cross-JOB mutable state).

Continuous corpus building ingests shard after shard; each new shard must
drop rows whose content was EVER seen before, not just within the current
Dataset. That requires a mutable index that outlives any one pipeline run:

- ``create_dedup_index(n_shards)`` → N detached-scope index actors, each
  owning one hash-partition of the seen-set (memory scales out with
  shards; routing is hash(content) % N so a given hash always hits the
  same actor — no cross-actor coordination, no global lock).
- ``incremental_dedup(ds, index)`` → the Dataset stage: per batch, hash
  the content column, group hashes by shard, ONE batched
  ``seen_then_add`` call per shard actor (first-wins semantics are atomic
  per actor — an actor processes one call at a time), filter the batch to
  first-seen rows. The batch never leaves the worker; only md5 digests
  travel to the index.
- ``index_stats`` / ``save`` / ``load`` for inspection and persistence
  (parquet of 16-byte digests per shard — restartable ingestion).

At 100 TB scale: 64-256 shard actors spread across the cluster hold the
digest set (16 bytes/doc ⇒ ~1.6 GB per 10⁸ docs per shard at 64 shards);
batched round-trips amortize the actor RPC to ~µs/row.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray
import ray.data as rd


@ray.remote(num_cpus=0.1)
class DedupIndexShard:
    """One hash-partition of the global seen-set. Actor semantics give
    atomic first-wins: concurrent callers serialize per shard.

    Idempotent under Ray task RETRIES: each call carries a token derived
    from the BATCH CONTENT (md5 of the digest list — identical on any
    re-execution of the same logical batch, independent of task ids or
    batch-slicing stability, neither of which is a documented Ray
    contract); the shard memoizes its answer per token, so a re-executed
    map task (whose digests are now 'seen' from its own first attempt)
    gets the ORIGINAL answer back instead of silently dropping the whole
    batch. The memo evicts LRU-style one entry at a time (never wholesale,
    which would strip protection from every in-flight retry at once).
    Trade-off: two DISTINCT batches with byte-identical content share a
    token, so the second keeps rows the index already saw — duplicates
    leak (bounded by the memo window) rather than unique rows being
    dropped, the safe failure direction for corpus building."""

    _MEMO_MAX = 4096

    def __init__(self) -> None:
        from collections import OrderedDict
        self._seen: set[bytes] = set()
        self._memo: OrderedDict[bytes, list[bool]] = OrderedDict()

    def seen_then_add(self, digests: list[bytes],
                      token: bytes | None = None) -> list[bool]:
        """For each digest: True if it was already in the index (dup);
        afterwards every digest is in the index. Duplicates WITHIN the
        call keep the first occurrence. ``token`` (content-derived per
        logical batch) makes retried calls return their first-attempt
        answer."""
        if token is not None and token in self._memo:
            self._memo.move_to_end(token)
            return self._memo[token]
        seen = self._seen
        out = []
        for d in digests:
            if d in seen:
                out.append(True)
            else:
                seen.add(d)
                out.append(False)
        if token is not None:
            while len(self._memo) >= self._MEMO_MAX:
                self._memo.popitem(last=False)
            self._memo[token] = out
        return out

    def size(self) -> int:
        return len(self._seen)

    def dump(self) -> bytes:
        return b"".join(sorted(self._seen))

    def restore(self, blob: bytes) -> int:
        self._seen.update(blob[i:i + 16] for i in range(0, len(blob), 16))
        return len(self._seen)


def create_dedup_index(n_shards: int = 8) -> list:
    """N index shard actors (caller owns the handles' lifetime)."""
    return [DedupIndexShard.remote() for _ in range(n_shards)]


def incremental_dedup(ds: rd.Dataset, index: list,
                      col: str = "text",
                      token_salt: bytes | str = b"") -> rd.Dataset:
    """Drop rows whose ``col`` content hash was ever seen by ``index``
    (across ALL prior and concurrent ingests); first occurrence wins.
    Safe under Ray task retries (per-batch token memoization in the
    shards — see DedupIndexShard). Pass a distinct ``token_salt`` per
    INGEST JOB: without it, a later job re-ingesting byte-identical
    batches replays the first job's memoized "all new" answers while
    the memo still holds them (duplicates leak); retries within one job
    share the salt, so idempotence is unaffected."""
    if not index:
        raise ValueError("incremental_dedup needs at least one index shard")
    n = len(index)
    salt = token_salt.encode() if isinstance(token_salt, str) else token_salt

    def fn(t: pa.Table) -> pa.Table:
        digests = [hashlib.md5((v or "").encode()).digest()
                   for v in t.column(col).to_pylist()]
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_shard.setdefault(d[0] % n, []).append(i)
        keep = [False] * t.num_rows
        # one batched RPC per shard actor, issued concurrently; the token
        # is derived from the BATCH CONTENT (md5 over the digest list), so
        # any re-execution of the same logical batch — regardless of task
        # id or slicing stability — gets its first-attempt answers back
        # instead of seeing its own digests as duplicates
        token = hashlib.md5(salt + b"".join(digests)).digest()
        futures = {s: index[s].seen_then_add.remote(
            [digests[i] for i in rows], token) for s, rows in by_shard.items()}
        for s, rows in by_shard.items():
            for i, dup in zip(rows, ray.get(futures[s])):
                keep[i] = not dup
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def index_stats(index: list) -> dict:
    sizes = ray.get([sh.size.remote() for sh in index])
    return {"n_shards": len(index), "total_digests": sum(sizes),
            "shard_sizes": sizes}


def save_index(index: list, out_dir: str) -> None:
    """Persist each shard's digest set (parquet, one file per shard)."""
    import os

    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    blobs = ray.get([sh.dump.remote() for sh in index])
    for s, blob in enumerate(blobs):
        t = pa.table({"digest": pa.array(
            [blob[i:i + 16] for i in range(0, len(blob), 16)], pa.binary())})
        pq.write_table(t, os.path.join(out_dir, f"shard-{s:04d}.parquet"))


def load_index(out_dir: str, default_shards: int = 8) -> list:
    """Recreate index actors from a saved dump. A directory with no shard
    files (pre-created mount, first run) yields a FRESH default-sized
    index rather than a zero-shard one."""
    import glob
    import os

    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    if not files:
        return create_dedup_index(default_shards)
    index = [DedupIndexShard.remote() for _ in files]
    ray.get([sh.restore.remote(
        b"".join(pq.read_table(f).column("digest").to_pylist()))
        for sh, f in zip(index, files)])
    return index
