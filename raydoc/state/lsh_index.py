"""Shared mutable NEAR-dup index — the MinHash-LSH twin of
``state/dedup_index.py`` (which is exact-hash only).

Continuous corpus building must also drop rows that are *near*
duplicates of anything EVER ingested — paraphrases, boilerplate
re-crawls, whitespace-mangled copies — not just byte-identical ones.
The batch operator (``functions/dedup.py:minhash_lsh_clusters``) only
sees one Dataset; this index carries the LSH state across jobs:

- ``create_lsh_index(n_shards, verify_threshold=None)`` → N
  detached-scope shard actors. Each band key routes to ONE shard
  (hash(band_key) % N), so membership is atomic per shard with no
  cross-actor coordination.
- ``incremental_neardup(ds, index)`` → the Dataset stage: per batch,
  each doc's 64-perm MinHash signature (the exact machinery of
  ``dedup.minhash_signature``) folds into ``bands`` band keys; one
  batched ``probe_then_add`` RPC per shard answers "was this band key
  ever seen" with first-wins semantics; the doc is dropped iff ANY of
  its bands was seen (the standard LSH contract: P[flagged] =
  1-(1-J^r)^b — ~0.96 at J=0.8, ~0.17 at J=0.3 with b=16, r=4).
  Only 9-byte band keys travel to the index; the batch never leaves
  the worker.

Memory at 100 TB: the default contract-only mode stores 16 band keys
× 9 B per doc (~150 B/doc ⇒ ~19 GB per 10⁹ docs, scaled out across
shards) — the shape production incremental near-dedup runs at. The
``verify_threshold`` mode additionally stores one 512-byte signature
per (band key) owner and re-checks estimated Jaccard worker-side
before dropping — higher precision (collisions below τ survive) at
~8.5 kB/doc, for precision-critical corpora that fit it.

Retry idempotence follows DedupIndexShard: every RPC carries a token
derived from the BATCH CONTENT; shards memoize answers per token (LRU,
evicted one at a time), so a re-executed map task gets its
first-attempt answer instead of colliding with its own bands.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray
import ray.data as rd

_BANDS = 16
_ROWS_PER_BAND = 64 // _BANDS


@ray.remote(num_cpus=0.1)
class LshIndexShard:
    """One hash-partition of the global band-key space.

    ``verify=False``: a set of band keys (dup = key present).
    ``verify=True``: band key → first owner's full signature bytes, so
    the caller can estimate Jaccard against the actual prior document
    and keep sub-threshold collisions."""

    _MEMO_MAX = 4096

    def __init__(self, verify: bool = False) -> None:
        from collections import OrderedDict
        self._verify = verify
        self._set: set[bytes] = set()
        self._own: dict[bytes, bytes] = {}
        self._memo: OrderedDict[bytes, list] = OrderedDict()

    def probe_then_add(self, band_keys: list[bytes],
                       sigs: list[bytes] | None = None,
                       token: bytes | None = None) -> list:
        """First-wins per band key. Returns, per entry: contract mode —
        bool (key was already present); verify mode — the prior owner's
        signature bytes, or None if this entry claimed the key. A key
        appearing twice IN the call is owned by its first occurrence."""
        if token is not None and token in self._memo:
            self._memo.move_to_end(token)
            return self._memo[token]
        out: list = []
        if self._verify:
            own = self._own
            for k, s in zip(band_keys, sigs or []):
                prior = own.get(k)
                if prior is None:
                    own[k] = s
                out.append(prior)
        else:
            seen = self._set
            for k in band_keys:
                if k in seen:
                    out.append(True)
                else:
                    seen.add(k)
                    out.append(False)
        if token is not None:
            while len(self._memo) >= self._MEMO_MAX:
                self._memo.popitem(last=False)
            self._memo[token] = out
        return out

    def size(self) -> int:
        return len(self._own) if self._verify else len(self._set)

    def dump(self) -> tuple[list[bytes], list[bytes] | None]:
        if self._verify:
            keys = sorted(self._own)
            return keys, [self._own[k] for k in keys]
        return sorted(self._set), None

    def restore(self, keys: list[bytes],
                sigs: list[bytes] | None) -> int:
        if self._verify and sigs is not None:
            for k, s in zip(keys, sigs):
                self._own.setdefault(k, s)
            return len(self._own)
        self._set.update(keys)
        return len(self._set)


def _band_keys(sig) -> list[bytes]:
    """9-byte keys: band index byte + md5₆₄ of the band's perm chunk —
    the band byte makes the 16 band keyspaces disjoint."""
    return [bytes([b])
            + hashlib.md5(
                sig[b * _ROWS_PER_BAND:(b + 1) * _ROWS_PER_BAND].tobytes()
            ).digest()[:8]
            for b in range(_BANDS)]


def create_lsh_index(n_shards: int = 8,
                     verify_threshold: float | None = None) -> list:
    """N shard actors (caller owns the handles). ``verify_threshold``
    switches every shard to owner-signature mode."""
    return [LshIndexShard.remote(verify=verify_threshold is not None)
            for _ in range(n_shards)]


def incremental_neardup(ds: rd.Dataset, index: list, col: str = "text",
                        verify_threshold: float | None = None,
                        k: int = 3,
                        token_salt: bytes | str = b"") -> rd.Dataset:
    """Drop rows near-duplicate (MinHash-LSH band collision, optionally
    estimated-Jaccard ≥ ``verify_threshold``) of anything ever ingested
    into ``index``; first occurrence wins. Kept rows register their
    bands. NOTE: a dropped row may have claimed some still-unseen bands
    before its collision was known — those slots then point at a member
    of the same near-dup chain, which only widens the cluster the way
    connected-component labeling already does in the batch operator.

    Safe under Ray task retries (content-token memoization). Pass a
    distinct ``token_salt`` per INGEST JOB (job id, shard path): without
    it, re-ingesting byte-identical content from a LATER job replays the
    first job's memoized "all new" answers while the memo still holds
    them, and the duplicates leak instead of dropping. Retries within
    one job share the salt, so idempotence is unaffected."""
    if not index:
        raise ValueError("incremental_neardup needs at least one shard")
    import numpy as np

    from raydoc.functions.dedup import minhash_signature

    n = len(index)
    salt = token_salt.encode() if isinstance(token_salt, str) else token_salt

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.schema.names:
            return t
        sigs = [minhash_signature(v or "", k)
                for v in t.column(col).to_pylist()]
        keys = [_band_keys(s) for s in sigs]
        # route every (row, band) entry to its shard; ONE rpc per shard
        by_shard: dict[int, list[tuple[int, int]]] = {}
        for i, ks in enumerate(keys):
            for b, kk in enumerate(ks):
                by_shard.setdefault(
                    int.from_bytes(kk[1:3], "big") % n, []).append((i, b))
        token = hashlib.md5(
            salt + b"".join(kk for ks in keys for kk in ks)).digest()
        futures = {}
        for s, entries in by_shard.items():
            bk = [keys[i][b] for i, b in entries]
            sg = ([sigs[i].tobytes() for i, _ in entries]
                  if verify_threshold is not None else None)
            futures[s] = index[s].probe_then_add.remote(bk, sg, token)
        dup = [False] * t.num_rows
        for s, entries in by_shard.items():
            for (i, _b), ans in zip(entries, ray.get(futures[s])):
                if ans is None or ans is False:
                    continue
                if verify_threshold is None:
                    dup[i] = True
                else:
                    prior = np.frombuffer(ans, dtype=np.uint64)
                    est = float((prior == sigs[i]).mean())
                    if est >= verify_threshold:
                        dup[i] = True
        return t.filter(pa.array([not d for d in dup], pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")


def lsh_index_stats(index: list) -> dict:
    sizes = ray.get([sh.size.remote() for sh in index])
    return {"n_shards": len(index), "total_band_keys": sum(sizes),
            "shard_sizes": sizes}


def save_lsh_index(index: list, out_dir: str) -> None:
    """Persist each shard (parquet: band key + optional owner sig)."""
    import os

    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    for s, (keys, sigs) in enumerate(
            ray.get([sh.dump.remote() for sh in index])):
        cols = {"band_key": pa.array(keys, pa.binary())}
        if sigs is not None:
            cols["sig"] = pa.array(sigs, pa.binary())
        pq.write_table(pa.table(cols),
                       os.path.join(out_dir, f"lsh-shard-{s:04d}.parquet"))


def load_lsh_index(out_dir: str, default_shards: int = 8,
                   verify_threshold: float | None = None) -> list:
    """Recreate shard actors from a dump; an empty directory yields a
    fresh default-sized index (pre-created mount, first run)."""
    import glob
    import os

    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(out_dir, "lsh-shard-*.parquet")))
    if not files:
        return create_lsh_index(default_shards, verify_threshold)
    index = []
    for f in files:
        t = pq.read_table(f)
        verify = "sig" in t.schema.names
        sh = LshIndexShard.remote(verify=verify)
        ray.get(sh.restore.remote(
            t.column("band_key").to_pylist(),
            t.column("sig").to_pylist() if verify else None))
        index.append(sh)
    return index


def incremental_neardup_stats(sf_dir: str) -> pa.Table:
    """(n_docs, kept_first, kept_reingest, kept_mutated): the cross-job
    near-dedup index exercised end-to-end at the driver surface — pass 1
    ingests the documents corpus into a fresh 4-shard index; pass 2
    re-ingests the IDENTICAL corpus (every row must collide on all
    bands → kept_reingest counts leakage, 0 by construction); pass 3
    ingests a deterministically mutated copy (every doc gains one
    appended token — a paraphrase-grade near-dup that exact dedup would
    MISS; kept_mutated counts the ones whose mutation escaped every
    band, the documented 1-(1-J^r)^b envelope). Deterministic: the
    MinHash permutations are fixed module constants. Rows-only at the
    driver (actor state is not SQL-expressible); the retry-idempotence
    and save/load contracts are pinned by tests/test_lsh_index.py."""
    import pyarrow.compute as pc

    index = create_lsh_index(n_shards=4)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()
    kept_first = incremental_neardup(docs, index,
                                     token_salt=b"job-1").count()
    kept_reingest = incremental_neardup(docs, index,
                                        token_salt=b"job-2").count()

    def mutate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return t
        return t.set_column(
            t.schema.get_field_index("text"), "text",
            pc.binary_join_element_wise(
                pc.fill_null(pc.cast(t["text"], pa.string()), ""),
                " zzmutated", ""))

    kept_mutated = incremental_neardup(
        docs.map_batches(mutate, batch_format="pyarrow"), index,
        token_salt=b"job-3").count()
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "kept_first": pa.array([kept_first], pa.int64()),
        "kept_reingest": pa.array([kept_reingest], pa.int64()),
        "kept_mutated": pa.array([kept_mutated], pa.int64())})
