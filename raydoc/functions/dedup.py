"""Deduplication family over a text column (documents table).

- ``exact_dedup``            md5 content hash → min id per hash (partial-agg,
                             no row shuffle; SQL-oracle-checkable)
- ``minhash_lsh_clusters``   word-shingle MinHash → banded LSH buckets →
                             candidate pairs → signature-estimated Jaccard →
                             connected components (min-label)
- ``simhash_signatures`` / ``simhash_neardups``
                             64-bit SimHash + 4-band hamming blocking
- ``ngram_jaccard_pairs``    exact n-gram Jaccard verification of LSH
                             candidates
- ``embedding_neardups``     EXACT cosine ≥ τ pairs via distributed
                             block-pair matmul (object-store block refs)
- ``embedding_neardups_clustered``
                             approximate scale path: k-means buckets →
                             within-cluster pairs only

All per-batch kernels are vectorized numpy; shuffles move only hashes and
signatures, never document text. Candidate-pair sets are assumed small
relative to the corpus (standard LSH regime); the final union-find runs on
the driver over candidate pairs only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table

from raydoc.functions.agg import partial_groupby

_TOKEN = re.compile(r"\w+")

# 64 fixed odd multipliers for minhash permutations (seeded, stable)
_RNG = np.random.RandomState(0xC0FFEE)
_MH_A = (_RNG.randint(1, 2**31, size=64).astype(np.uint64) * 2 + 1)
_MH_B = _RNG.randint(0, 2**31, size=64).astype(np.uint64)
_PRIME = np.uint64((1 << 61) - 1)

_SIMHASH_BITS = 64


def _md5_64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")


def add_content_hash(ds: rd.Dataset, col: str = "text",
                     out: str = "content_hash") -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((v or "").encode()).hexdigest()
                  for v in t.column(col).to_pylist()]
        return t.append_column(out, pa.array(hashes, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup(sf_dir: str, id_col: str = "doc_id",
                col: str = "text") -> pa.Table:
    """Representative (min id) per distinct content hash."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=[id_col, col])
    hashed = add_content_hash(ds, col)
    out = partial_groupby(hashed.select_columns([id_col, "content_hash"]),
                          ["content_hash"], {id_col: (id_col, "min")})
    t = collect_table(out)
    return t.select([id_col]).sort_by(id_col)


# token → md5_64 memo (bounded; reset rather than evict — at corpus scale a
# worker sees a Zipfian vocabulary, so a full cache is still ~all hits)
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1_000_000

# fixed odd mixing constants for combining k consecutive token hashes into a
# shingle hash (uint64 wraparound arithmetic — deterministic everywhere)
_SHINGLE_MIX = (_RNG.randint(1, 2**31, size=8).astype(np.uint64) * 2 + 1)


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_CACHE_MAX:
        cache.clear()
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = _md5_64(t)
            cache[t] = h
        out[i] = h
    return out


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Unique hashes of word k-shingles: per-token md5 (memoized) combined
    with a vectorized k-window mix — no per-shingle hashlib calls."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = _token_hashes(toks)
    n = len(th) - k + 1
    v = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        v += th[j:j + n] * _SHINGLE_MIX[j]
    return np.unique(v)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash over word k-shingles (vectorized)."""
    sh = _shingles(text, k)
    # (perm, shingle) universal-hash matrix, min over shingles
    vals = (sh[None, :] * _MH_A[:, None] + _MH_B[:, None]) % _PRIME
    return vals.min(axis=1)


def minhash_band_rows(ds: rd.Dataset, id_col: str = "doc_id",
                      col: str = "text", bands: int = 16,
                      k: int = 3) -> rd.Dataset:
    """Explode each doc into (id, band, band_hash) rows — the LSH shuffle
    moves ONLY the 16-hex band digest per row, never the full 128-hex
    signature (which would multiply shuffle volume ×bands; the
    estimated-Jaccard filter instead recomputes signatures for the small
    candidate set in a second pass — see ``_candidate_signatures``)."""
    rows_per_band = 64 // bands

    def fn(t: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes, buckets = [], [], [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column(col).to_pylist()):
            sig = minhash_signature(text or "", k)
            for b in range(bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                band_hashes.append(bh)
                # coarse shuffle bucket: many (band, band_hash) groups per
                # bucket so the reduce stage processes blocks, not
                # per-bucket micro-groups (1021 is coprime to the bucket
                # count so the band term actually spreads — b*1024 % 256
                # would be a no-op)
                buckets.append((b * 1021 + int(bh[:4], 16)) % 256)
                band_ids.append(b)
                ids.append(doc_id)
        return pa.table({
            id_col: pa.array(ids),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
            "bucket": pa.array(buckets, pa.int32()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _block_pairs_fn(id_col: str):
    """Per-coarse-bucket reducer emitting candidate (a, b) pairs for every
    (band, band_hash) group inside the block; pairs within one reducer
    call are emitted once, but the SAME pair colliding in several bands
    reappears across buckets (deduped downstream)."""

    def block_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_pylist()
        bands = g.column("band").to_pylist()
        hashes = g.column("band_hash").to_pylist()
        groups: dict[tuple[int, str], list[int]] = {}
        for i, (b, h) in enumerate(zip(bands, hashes)):
            groups.setdefault((b, h), []).append(i)
        a_out, b_out = [], []
        for members in groups.values():
            if len(members) < 2:
                continue
            members.sort(key=lambda i: ids[i])
            seen = set()
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    if ids[i] == ids[j] or (ids[i], ids[j]) in seen:
                        continue
                    seen.add((ids[i], ids[j]))
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    return block_pairs


def _lsh_candidate_pairs(exploded: rd.Dataset,
                         id_col: str) -> set[tuple[int, int]]:
    """Candidate (a, b) pairs sharing any LSH band bucket, collected to a
    driver set. One reduce call per COARSE bucket (≈256 groups total
    instead of one per band-hash); inside, plain dict grouping over the
    block. Small-regime path — ``_lsh_candidate_pairs_ds`` is the
    cluster-resident variant."""
    pairs = exploded.groupby("bucket").map_groups(
        _block_pairs_fn(id_col), batch_format="pyarrow")
    t = collect_table(pairs)
    if t.num_rows == 0 or "a" not in t.schema.names:
        return set()        # zero collisions → fully-empty (schemaless) ds
    return set(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))


def _lsh_candidate_pairs_ds(exploded: rd.Dataset,
                            id_col: str) -> rd.Dataset:
    """Globally-deduped candidate (a, b) pair DATASET — never lands on the
    driver. Same per-coarse-bucket reduce as ``_lsh_candidate_pairs``,
    then one hashes-only exchange on a pair-hash bucket (a given (a, b)
    always lands in exactly one bucket, so block-local dedup there is
    global dedup)."""
    raw = exploded.groupby("bucket").map_groups(
        _block_pairs_fn(id_col), batch_format="pyarrow")

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.schema.names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "pbucket": pa.array([], pa.int32())})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        pb = ((a * 1000003 + b) % 256).astype(np.int32)
        return t.select(["a", "b"]).append_column(
            "pbucket", pa.array(pb, pa.int32()))

    def dedup_block(g: pa.Table) -> pa.Table:
        t = g.select(["a", "b"]).group_by(["a", "b"]).aggregate([])
        return t.select(["a", "b"])

    return raw.map_batches(add_pair_bucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(dedup_block, batch_format="pyarrow")


def _candidate_signatures(ds: rd.Dataset, cand_ids: set, id_col: str,
                          col: str, k: int) -> dict[int, np.ndarray]:
    """Recompute MinHash signatures for ONLY the candidate docs via a
    distributed semi-join filter (same shape as the n-gram verify's text
    semi-join): the corpus streams once, non-candidates drop in the
    workers, and the driver receives |candidates| signatures — bounded by
    the LSH regime's small candidate set, never corpus-sized."""
    import ray

    if not cand_ids:            # zero LSH collisions → nothing to verify
        return {}
    ids_ref = ray.put(frozenset(cand_ids))

    def sig_rows(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        out_ids, out_sigs = [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column(col).to_pylist()):
            if doc_id in wanted:
                out_ids.append(doc_id)
                out_sigs.append(minhash_signature(text or "", k)
                                .tobytes())
        return pa.table({id_col: pa.array(out_ids, pa.int64()),
                         "sig": pa.array(out_sigs, pa.binary())})

    t = collect_table(ds.map_batches(sig_rows, batch_format="pyarrow"))
    return {i: np.frombuffer(s, np.uint64)
            for i, s in zip(t.column(id_col).to_pylist(),
                            t.column("sig").to_pylist())}


def _minhash_verified_pairs(ds: rd.Dataset, threshold: float,
                            bands: int, k: int, id_col: str,
                            max_driver_pairs: int = 50_000) -> rd.Dataset:
    """Estimated-Jaccard-verified near-dup (a, b) pair Dataset, ADAPTIVE
    in the candidate-pair count (counted cluster-side, never assumed):

    - ≤ ``max_driver_pairs``: the standard LSH regime — pairs collect to
      the driver, signatures for candidate docs only come back via the
      broadcast-set semi-join (one corpus pass), and the filter runs
      driver-side in microseconds.
    - above it (dup-heavy web corpora, where the pair set must never land
      on a driver): signatures flow as a (id, sig) Dataset through a
      distributed semi-join against the pair-node ids, and the filter is
      two bucketed hash joins (pair ⋈ sig_a ⋈ sig_b) + a vectorized
      per-batch compare — every step cluster-resident.

    Both regimes produce the identical pair set (equality pinned by
    tests/test_minhash_distributed.py)."""
    from raydoc.functions.joins import bucket_hash_join, bucket_semi_join

    exploded = minhash_band_rows(ds, id_col=id_col, bands=bands, k=k)
    pairs = _lsh_candidate_pairs_ds(exploded, id_col).materialize()
    n_pairs = pairs.count()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if n_pairs == 0:
        return rd.from_arrow(empty)

    if n_pairs <= max_driver_pairs:
        t = collect_table(pairs)
        candidates = set(zip(t.column("a").to_pylist(),
                             t.column("b").to_pylist()))
        sigs = _candidate_signatures(
            ds, {x for p in candidates for x in p}, id_col, "text", k)
        keep = sorted((a, b) for a, b in candidates
                      if float((sigs[a] == sigs[b]).mean()) >= threshold)
        return rd.from_arrow(pa.table({
            "a": pa.array([p[0] for p in keep], pa.int64()),
            "b": pa.array([p[1] for p in keep], pa.int64())}))

    # distributed regime -------------------------------------------------
    def nodes_fn(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pa.concat_arrays(
            [t.column("a").combine_chunks(),
             t.column("b").combine_chunks()])})

    node_ids = pairs.map_batches(nodes_fn, batch_format="pyarrow")

    def sig_fn(t: pa.Table) -> pa.Table:
        out_ids, out_sigs = [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column("text").to_pylist()):
            out_ids.append(doc_id)
            out_sigs.append(minhash_signature(text or "", k).tobytes())
        return pa.table({id_col: pa.array(out_ids, pa.int64()),
                         "sig": pa.array(out_sigs, pa.binary())})

    sigs_ds = bucket_semi_join(ds, node_ids, id_col) \
        .map_batches(sig_fn, batch_format="pyarrow").materialize()

    def rename(to_key: str, sig_name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({to_key: t.column(id_col),
                             sig_name: t.column("sig")})
        return fn

    j = bucket_hash_join(
        pairs, sigs_ds.map_batches(rename("a", "sig_a"),
                                   batch_format="pyarrow"), key="a")
    j = bucket_hash_join(
        j, sigs_ds.map_batches(rename("b", "sig_b"),
                               batch_format="pyarrow"), key="b")

    n_perm = len(_MH_A)
    min_eq = int(np.ceil(threshold * n_perm))

    def jaccard_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        sa = np.frombuffer(b"".join(t.column("sig_a").to_pylist()),
                           np.uint64).reshape(-1, n_perm)
        sb = np.frombuffer(b"".join(t.column("sig_b").to_pylist()),
                           np.uint64).reshape(-1, n_perm)
        keep = (sa == sb).sum(axis=1) >= min_eq
        return t.select(["a", "b"]).filter(pa.array(keep))

    return j.map_batches(jaccard_filter, batch_format="pyarrow")


def _minhash_component_labels(ds: rd.Dataset, threshold: float,
                              bands: int, k: int, id_col: str,
                              max_driver_pairs: int = 50_000) -> dict[int, int]:
    """NON-TRIVIAL near-dup component labels (doc_id → min-id root,
    entries only where root ≠ doc_id): banded LSH candidate pairs →
    adaptive estimated-Jaccard verify (``_minhash_verified_pairs``) →
    the shared adaptive component labeler ``graph.label_components``
    (driver union-find below ``max_driver_pairs`` verified edges,
    distributed min-label propagation above — only the label MAP ever
    collects)."""
    from raydoc.functions.graph import label_components

    verified = _minhash_verified_pairs(ds, threshold, bands, k, id_col,
                                       max_driver_pairs=max_driver_pairs)
    labels = label_components(verified.materialize(),
                              max_driver_pairs=max_driver_pairs)
    return {x: r for x, r in labels.items() if r != x}


def minhash_lsh_clusters(sf_dir: str, threshold: float = 0.5,
                         bands: int = 16, k: int = 3,
                         id_col: str = "doc_id",
                         max_driver_pairs: int = 50_000) -> pa.Table:
    """(doc_id, cluster) where cluster = min doc id of the near-dup
    component; singletons cluster with themselves.

    Scale shape: ADAPTIVE in the candidate-pair count. Below
    ``max_driver_pairs`` the standard LSH small-candidate-set regime runs
    (pairs + union-find driver-side, microseconds); above it — the
    dup-heavy 100 TB web-corpus regime — the verify is a distributed
    semi-join + two bucketed hash joins and the labeling is distributed
    min-label propagation (``graph.label_components``), with only the
    non-trivial component map collecting. That map is broadcast back
    through one map_batches over the id column; the full id list is never
    materialized driver-side."""
    import ray

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])
    labels = _minhash_component_labels(ds, threshold, bands, k, id_col,
                                       max_driver_pairs=max_driver_pairs)
    labels_ref = ray.put(labels)

    def label_fn(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        ids = t.column(id_col).to_pylist()
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array([lab.get(i, i) for i in ids], pa.int64()),
        })

    out = collect_table(
        ds.select_columns([id_col]).map_batches(label_fn,
                                                batch_format="pyarrow"))
    return out.sort_by(id_col)


def neardup_dedup_corpus(sf_dir: str, threshold: float = 0.5,
                         bands: int = 16, k: int = 3,
                         id_col: str = "doc_id",
                         max_driver_pairs: int = 50_000) -> pa.Table:
    """(doc_id, n_dups): the END USE of near-dedup — the deduplicated
    corpus. One KEPT canonical document per MinHash/LSH near-dup
    component (the min-id member) with the component size it represents
    (1 for singletons). Feeding a training run = keep exactly these ids.

    Shape: identical to ``minhash_lsh_clusters`` (adaptive verify +
    adaptive component labeling — see there); the kept-set filter is the
    same broadcast-labels map pass — dropped docs filter OUT in the
    workers, and cluster sizes come from the (small) non-trivial
    component map alone."""
    import ray
    from collections import Counter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])
    labels = _minhash_component_labels(ds, threshold, bands, k, id_col,
                                       max_driver_pairs=max_driver_pairs)
    sizes = Counter(labels.values())          # non-trivial members per root
    labels_ref = ray.put(labels)
    sizes_ref = ray.put(dict(sizes))

    def keep_fn(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        sz = ray.get(sizes_ref)
        ids = [i for i in t.column(id_col).to_pylist()
               if lab.get(i, i) == i]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_dups": pa.array([1 + sz.get(i, 0) for i in ids],
                               pa.int64()),
        })

    out = collect_table(
        ds.select_columns([id_col]).map_batches(keep_fn,
                                                batch_format="pyarrow"))
    return out.sort_by(id_col)


def simhash64(text: str) -> int:
    toks = _TOKEN.findall(text.lower())
    if not toks:
        return 0
    hashes = _token_hashes(toks)
    bits = ((hashes[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    powers = np.uint64(1) << np.arange(_SIMHASH_BITS, dtype=np.uint64)
    return int(powers[votes > 0].sum())


def simhash_signatures(sf_dir: str, id_col: str = "doc_id") -> pa.Table:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])

    def fn(t: pa.Table) -> pa.Table:
        sigs = [f"{simhash64(v or ''):016x}"
                for v in t.column("text").to_pylist()]
        return pa.table({id_col: t.column(id_col),
                         "simhash": pa.array(sigs, pa.string())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by(id_col)


def simhash_neardups(sf_dir: str, max_hamming: int = 3,
                     id_col: str = "doc_id") -> pa.Table:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit bands
    (any pair within distance 3 shares at least one of 4 bands).

    Scale shape: signatures never touch the driver. Each doc explodes into
    4 (band, band_key) rows inside map_batches; one coarse-bucket shuffle
    co-locates equal band keys; pair generation + hamming check run
    per-block in the reduce. Only surviving pairs are collected (deduped —
    a close pair can share several bands)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids_o, band_o, key_o, sig_o, bucket_o = [], [], [], [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column("text").to_pylist()):
            v = simhash64(text or "")
            for b in range(4):
                key = (v >> (16 * b)) & 0xFFFF
                ids_o.append(doc_id)
                band_o.append(b)
                key_o.append(key)
                sig_o.append(v)
                bucket_o.append((b * 1021 + key) % 64)
        return pa.table({
            id_col: pa.array(ids_o, pa.int64()),
            "band": pa.array(band_o, pa.int32()),
            "band_key": pa.array(key_o, pa.int32()),
            "sig": pa.array(sig_o, pa.uint64()),
            "bucket": pa.array(bucket_o, pa.int32()),
        })

    def block_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_pylist()
        bands = g.column("band").to_pylist()
        keys = g.column("band_key").to_pylist()
        sigs = g.column("sig").to_pylist()
        groups: dict[tuple[int, int], list[int]] = {}
        for i, (b, k) in enumerate(zip(bands, keys)):
            groups.setdefault((b, k), []).append(i)
        a_out, b_out, d_out = [], [], []
        for members in groups.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    if ids[i] == ids[j]:
                        continue
                    d = bin(sigs[i] ^ sigs[j]).count("1")
                    if d <= max_hamming:
                        lo, hi = min(ids[i], ids[j]), max(ids[i], ids[j])
                        a_out.append(lo)
                        b_out.append(hi)
                        d_out.append(d)
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(d_out, pa.int32())})

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("bucket").map_groups(block_pairs,
                                           batch_format="pyarrow"))
    t = collect_table(pairs)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    if t.num_rows == 0:
        return empty
    # dedupe pairs found via multiple bands, then deterministic ordering
    df = t.to_pandas().drop_duplicates(subset=["a", "b"])
    df = df.sort_values(["a", "b"], ignore_index=True)
    return pa.table({"a": pa.array(df["a"], pa.int64()),
                     "b": pa.array(df["b"], pa.int64()),
                     "hamming": pa.array(df["hamming"], pa.int32())})


def ngram_containment_pairs(sf_dir: str, threshold: float = 0.5,
                            k: int = 3, id_col: str = "doc_id",
                            max_driver_pairs: int = 50_000) -> pa.Table:
    """(a, b, containment): exact word-k-gram MAX-CONTAINMENT
    |A∩B| / min(|A|, |B|) ≥ τ over the same LSH candidate pairs as
    ``ngram_jaccard_pairs`` — the subset-duplication detector (a short
    doc quoted whole inside a long one scores ~1.0 containment but low
    Jaccard, so a Jaccard-only dedup pass misses it; Broder's original
    resemblance/containment split). Same distributed shape: LSH
    proposes, a candidate-text semi-join fetches only candidate texts,
    exact shingle sets decide."""
    return ngram_jaccard_pairs(sf_dir, threshold=threshold, k=k,
                               id_col=id_col, metric="containment",
                               max_driver_pairs=max_driver_pairs)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.4, k: int = 3,
                        id_col: str = "doc_id",
                        metric: str = "jaccard",
                        max_driver_pairs: int = 50_000) -> pa.Table:
    """Exact word-k-gram Jaccard over LSH candidate pairs: LSH proposes,
    exact shingle sets (recomputed per pair inside the verify stage)
    decide. ``metric="containment"`` divides the intersection by
    min(|A|, |B|) instead of the union (see
    ``ngram_containment_pairs``); pairs where the smaller set is empty
    are skipped under either metric (no band rows → never candidates).

    ADAPTIVE like ``_minhash_verified_pairs``: the candidate-pair count
    is measured cluster-side. At or below ``max_driver_pairs`` the
    standard LSH small-candidate-set regime runs (pairs driver-side,
    candidate texts broadcast once — fastest when the contract holds);
    above it, texts reach the pairs through a distributed semi-join +
    two bucketed hash joins and nothing corpus-shaped ever lands on the
    driver (only the verified output table does — the function's return
    contract). Regime equality pinned in
    tests/test_minhash_distributed.py."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])
    exploded = minhash_band_rows(ds, id_col=id_col, bands=32, k=k)
    pairs_ds = _lsh_candidate_pairs_ds(exploded, id_col).materialize()
    score_col = "jaccard" if metric == "jaccard" else "containment"
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      score_col: pa.array([], pa.float64())})
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return empty

    import ray

    def score_rows(a_ids, b_ids, sh):
        a_out, b_out, j_out = [], [], []
        for a, b in zip(a_ids, b_ids):
            sa, sb = sh(a), sh(b)
            den = (min(len(sa), len(sb)) if metric == "containment"
                   else len(sa | sb))
            j = len(sa & sb) / den if den else 0.0
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(j, 6))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         score_col: pa.array(j_out, pa.float64())})

    if n_pairs <= max_driver_pairs:
        # small regime: candidate texts come back through ONE corpus scan
        # with a broadcast-set filter and are broadcast to the verify
        # stage; the full corpus text never lands on the driver.
        t = collect_table(pairs_ds)
        candidates = set(zip(t.column("a").to_pylist(),
                             t.column("b").to_pylist()))
        cand_ids = sorted({x for p in candidates for x in p})
        ids_ref = ray.put(frozenset(cand_ids))

        def keep_candidates(t: pa.Table) -> pa.Table:
            wanted = ray.get(ids_ref)
            mask = pa.array(
                [i in wanted for i in t.column(id_col).to_pylist()],
                pa.bool_())
            return t.filter(mask)

        small = collect_table(ds.map_batches(keep_candidates,
                                             batch_format="pyarrow"))
        texts_ref = ray.put(dict(zip(small.column(id_col).to_pylist(),
                                     small.column("text").to_pylist())))

        def verify(t: pa.Table) -> pa.Table:
            texts = ray.get(texts_ref)
            memo: dict[int, set] = {}

            def sh(i: int) -> set:
                s = memo.get(i)
                if s is None:
                    s = set(_shingles(texts.get(i) or "", k))
                    memo[i] = s
                return s

            return score_rows(t.column("a").to_pylist(),
                              t.column("b").to_pylist(), sh)

        out = collect_table(pairs_ds.map_batches(verify,
                                                 batch_format="pyarrow"))
    else:
        # distributed regime: pair ⋈ text_a ⋈ text_b, all cluster-resident
        from raydoc.functions.joins import (bucket_hash_join,
                                            bucket_semi_join)

        def nodes_fn(t: pa.Table) -> pa.Table:
            return pa.table({id_col: pa.concat_arrays(
                [t.column("a").combine_chunks(),
                 t.column("b").combine_chunks()])})

        node_ids = pairs_ds.map_batches(nodes_fn, batch_format="pyarrow")
        texts_ds = bucket_semi_join(ds, node_ids, id_col).materialize()

        def rename(to_key: str, text_name: str):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({to_key: t.column(id_col),
                                 text_name: t.column("text")})
            return fn

        j = bucket_hash_join(
            pairs_ds, texts_ds.map_batches(rename("a", "text_a"),
                                           batch_format="pyarrow"),
            key="a")
        j = bucket_hash_join(
            j, texts_ds.map_batches(rename("b", "text_b"),
                                    batch_format="pyarrow"), key="b")

        def verify_joined(t: pa.Table) -> pa.Table:
            texts: dict = {}
            for col_id, col_tx in (("a", "text_a"), ("b", "text_b")):
                for i, tx in zip(t.column(col_id).to_pylist(),
                                 t.column(col_tx).to_pylist()):
                    texts.setdefault(i, tx)
            memo: dict[int, set] = {}

            def sh(i: int) -> set:
                s = memo.get(i)
                if s is None:
                    s = set(_shingles(texts.get(i) or "", k))
                    memo[i] = s
                return s

            return score_rows(t.column("a").to_pylist(),
                              t.column("b").to_pylist(), sh)

        out = collect_table(j.map_batches(verify_joined,
                                          batch_format="pyarrow"))
    if out.num_rows == 0 or "a" not in out.schema.names:
        return empty
    return out.sort_by([("a", "ascending"), ("b", "ascending")])


def embedding_neardups(sf_dir: str, threshold: float = 0.4,
                       n_blocks: int = 8) -> pa.Table:
    """EXACT cosine ≥ τ pairs, distributed block-pair style: the corpus is
    split into ``n_blocks`` object-store blocks; each (i, j ≥ i) block pair
    is one task fetching exactly two blocks (zero-copy refs — the full
    matrix exists on no node, driver included). Exact all-pairs is O(n²)
    compute by definition; this shapes it as n_blocks·(n_blocks+1)/2
    independent tasks whose memory is 2 blocks each. Raise ``n_blocks``
    with corpus size; for approximate-at-scale use the LSH/IVF paths in
    functions/similarity.py."""
    import ray

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    refs = emb.repartition(n_blocks).to_arrow_refs()
    refs_ref = ray.put(refs)
    n = len(refs)
    tasks = rd.from_items([{"i": i, "j": j}
                           for i in range(n) for j in range(i, n)])

    def _unpack(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        if t.num_rows == 0:     # tiny corpus: repartition makes empty
            return (np.array([], dtype=np.int64),    # EMPTY-SCHEMA blocks
                    np.zeros((0, 1), dtype=np.float64))
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
        return ids, mat

    def pair_fn(t: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        a_out, b_out, s_out = [], [], []
        for i, j in zip(t["i"].to_pylist(), t["j"].to_pylist()):
            ids_i, mat_i = _unpack(ray.get(all_refs[i]))
            ids_j, mat_j = (ids_i, mat_i) if j == i else \
                _unpack(ray.get(all_refs[j]))
            if not len(ids_i) or not len(ids_j):
                continue
            sims = mat_i @ mat_j.T
            xs, ys = np.where(sims >= threshold)
            diagonal = (j == i)
            for x, y in zip(xs, ys):
                ia, ib = int(ids_i[x]), int(ids_j[y])
                if diagonal:
                    # each unordered pair appears as (x,y) AND (y,x) here —
                    # keep one orientation (also drops the self-pairs)
                    if ia >= ib:
                        continue
                elif ia > ib:
                    ia, ib = ib, ia
                a_out.append(ia)
                b_out.append(ib)
                s_out.append(round(float(sims[x, y]), 6))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "cosine": pa.array(s_out, pa.float64())})

    out = collect_table(tasks.map_batches(pair_fn, batch_format="pyarrow",
                                          batch_size=1))
    if out.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return out.sort_by([("a", "ascending"), ("b", "ascending")])


def embedding_neardups_clustered(sf_dir: str, threshold: float = 0.4,
                                 k: int = 8, iters: int = 5,
                                 seed: int = 7, n_sub: int = 4) -> pa.Table:
    """APPROXIMATE cosine ≥ τ pairs, clustered: k-means buckets the corpus,
    then pairs are generated WITHIN each cluster only. Misses cross-cluster
    pairs by design (recall grows as k shrinks; k=1 degenerates to exact).
    The exact twin is ``embedding_neardups``; the recall property test
    compares the two.

    Scale shape: cluster assignment is recomputed in the map stage from the
    BROADCAST (k × d) centroids (similarity.kmeans_centroids — no per-id
    label map ever exists on the driver or in the object store), and each
    cluster is split into ``n_sub`` sub-blocks by vec_id: every vector
    rides to the n_sub (sub_i, sub_j) pair-groups it participates in
    (i ≤ j), so one group does an O((c/n_sub)²) matmul instead of O(c²) on
    a whole dominant cluster — the within-cluster version of
    ``embedding_neardups``'s block-pair pattern, as a shuffle. Each
    qualifying pair meets exactly once (in the single group holding its
    sub-block combination), so no dedup pass is needed. Raise ``n_sub``
    with corpus size."""
    import pandas as pd

    import ray

    from raydoc.functions.similarity import (_normalize, assign_clusters_fn,
                                             kmeans_centroids)

    cents = kmeans_centroids(sf_dir, k=k, iters=iters, seed=seed)
    cents_ref = ray.put(cents)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    tagged = emb.map_batches(
        assign_clusters_fn(cents_ref, extra_cols=("embedding",)),
        batch_format="pyarrow")
    m = n_sub

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        clusters = np.asarray(t.column("cluster").to_pylist(), dtype=np.int64)
        subs = ids % m
        # row r joins every pair-group (i, j), i ≤ j, with i == sub or
        # j == sub → exactly m groups per row
        take_ix, gks, gsubs = [], [], []
        for r in range(len(ids)):
            s, c = int(subs[r]), int(clusters[r])
            for o in range(m):
                i, j = (o, s) if o < s else (s, o)
                take_ix.append(r)
                gks.append((c * m + i) * m + j)
                gsubs.append(s)
        out = t.select(["vec_id", "embedding"]).take(
            pa.array(take_ix, pa.int64()))
        return (out.append_column("gk", pa.array(gks, pa.int64()))
                   .append_column("sub", pa.array(gsubs, pa.int32())))

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        gk = int(g["gk"].iloc[0])
        i, j = (gk // m) % m, gk % m
        ids = g["vec_id"].to_numpy()
        subs = g["sub"].to_numpy()
        mat = _normalize(np.stack(g["embedding"].to_numpy())
                         .astype(np.float64))
        if i == j:
            sims = mat @ mat.T
            xs, ys = np.where(sims >= threshold)
            rows = [(int(ids[x]), int(ids[y]), round(float(sims[x, y]), 6))
                    for x, y in zip(xs, ys) if ids[x] < ids[y]]
        else:
            ai = np.where(subs == i)[0]
            bj = np.where(subs == j)[0]
            if not len(ai) or not len(bj):
                rows = []
            else:
                sims = mat[ai] @ mat[bj].T
                xs, ys = np.where(sims >= threshold)
                rows = [(*sorted((int(ids[ai[x]]), int(ids[bj[y]]))),
                         round(float(sims[x, y]), 6))
                        for x, y in zip(xs, ys)]
        return pd.DataFrame(rows, columns=["a", "b", "cosine"]) if rows \
            else pd.DataFrame({"a": [], "b": [], "cosine": []})

    out = (tagged.map_batches(explode, batch_format="pyarrow")
           .groupby("gk").map_groups(group_pairs, batch_format="pandas"))
    df = out.to_pandas()
    if df.empty:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    df = df.sort_values(["a", "b"], ignore_index=True)
    return pa.table({"a": pa.array(df["a"], pa.int64()),
                     "b": pa.array(df["b"], pa.int64()),
                     "cosine": pa.array(df["cosine"], pa.float64())})


def paragraph_dedup_global(sf_dir: str,
                           num_buckets: int | None = None) -> pa.Table:
    """(doc_id, para_idx) of the FIRST occurrence (lowest doc_id, then
    para_idx) of every distinct paragraph across the WHOLE corpus —
    global paragraph-level exact dedup, the CCNet/FineWeb line-dedup
    step at paragraph granularity (vs ``paragraph_dedup_stats``, which
    is doc-local).

    Scale shape: docs explode to (md5(paragraph), doc_id, para_idx) rows
    with a batch-local combiner (one candidate row per hash per batch),
    then one hash-bucket shuffle and a per-bucket vectorized min — only
    32-byte hash rows ever cross the wire; paragraph text never leaves
    the map stage. Output is one row per distinct paragraph: collected
    here for the oracle check, but at corpus scale the survivors stream
    straight to ``write_parquet`` (keep-set join back to the docs)."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, hs = [], [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            for i, p in enumerate((txt or "").split("\n\n")):
                ids.append(d)
                idxs.append(i)
                hs.append(hashlib.md5(p.encode()).hexdigest())
        df = pd.DataFrame({"h": hs, "doc_id": ids, "para_idx": idxs})
        # batch-local combiner: min (doc_id, para_idx) per hash
        df = df.sort_values(["h", "doc_id", "para_idx"],
                            ignore_index=True).drop_duplicates("h")
        return pa.table({
            "h": pa.array(df["h"], pa.string()),
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "para_idx": pa.array(df["para_idx"], pa.int64()),
            "bucket": pa.array(
                [int(x[:4], 16) & mask for x in df["h"]], pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id", "para_idx"],
                          ignore_index=True).drop_duplicates("h")
        return g[["doc_id", "para_idx"]]

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    return collect_table(out).sort_by(
        [("doc_id", "ascending"), ("para_idx", "ascending")])


# --- Bloom-filter incremental dedup ------------------------------------------

_BLOOM_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                         0x165667B19E3779F9, 0x27D4EB2F165667C5,
                         0xD6E8FEB86659FD93], dtype=np.uint64)


def _bloom_positions(hashes64: np.ndarray, n_bits: int) -> np.ndarray:
    """(n, k) bit positions for 64-bit content hashes: k salted
    multiplicative scrambles, mod a power-of-two bit count."""
    h = hashes64[:, None] * _BLOOM_SALTS[None, :]
    h ^= h >> np.uint64(29)
    return (h & np.uint64(n_bits - 1)).astype(np.int64)


def bloom_build(ds: rd.Dataset, col: str = "text",
                n_bits: int = 1 << 20) -> bytes:
    """OR-fold a Bloom filter of md5-64 content hashes over a Dataset.

    Per-batch partials are ``n_bits/8``-byte numpy bitmaps OR-merged in
    worker-side tree-fold levels (the HLL/CMS fold shape) — the driver
    ORs a handful of blobs no matter how many batches streamed. The
    result is the broadcastable seen-set for ZERO-shuffle incremental
    dedup: a new shard filters against ``ray.put(bloom)`` locally, where
    the sharded-actor dedup index (state/dedup_index.py) would cost an
    RPC per digest batch. False-positive rate ≈ (1-e^(-kn/m))^k — size
    ``n_bits`` ≥ ~10 bits/doc for <1% FP; false negatives: never."""
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        hs = np.array([_md5_64(v or "")
                       for v in t.column(col).to_pylist()], dtype=np.uint64)
        if len(hs):
            pos = _bloom_positions(hs, n_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_bits // 8, dtype=np.uint8)
        for blob in t.column("bloom").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    for _ in range(2):
        parts = parts.map_batches(fold, batch_format="pyarrow",
                                  batch_size=64)
    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for blob in collect_table(parts).column("bloom").to_pylist():
        acc |= np.frombuffer(blob, dtype=np.uint8)
    return acc.tobytes()


def bloom_filter_novel(ds: rd.Dataset, bloom: bytes, col: str = "text",
                       n_bits: int | None = None) -> rd.Dataset:
    """Keep only rows whose content hash is NOT in ``bloom`` (possibly-seen
    rows drop; no false negatives ⇒ every true duplicate of the seen set
    is removed). The filter broadcasts ONCE via ``ray.put`` and each task
    tests its batch vectorized — no shuffle, no driver pass."""
    import ray as _ray
    n_bits = n_bits or len(bloom) * 8
    bloom_ref = _ray.put(np.frombuffer(bloom, dtype=np.uint8))

    def fn(t: pa.Table) -> pa.Table:
        bits = _ray.get(bloom_ref)
        hs = np.array([_md5_64(v or "")
                       for v in t.column(col).to_pylist()], dtype=np.uint64)
        if not len(hs):
            return t
        pos = _bloom_positions(hs, n_bits)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return t.filter(pa.array(~hit.all(axis=1)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _splitmix64(keys: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: int64 keys → well-mixed uint64
    content hashes (the no-hashlib path for integer join keys)."""
    v = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def bloom_build_ints(ds: rd.Dataset, col: str,
                     n_bits: int = 1 << 20) -> bytes:
    """``bloom_build`` for an int64 KEY column (splitmix64 instead of
    per-row md5 — fully vectorized): the bloom-filter JOIN-PUSHDOWN
    build side. Same worker-side OR-fold tree; the driver merges a
    handful of bitmaps regardless of build-side size."""
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        if t.num_rows and col in t.schema.names:
            ks = t.column(col).to_numpy(zero_copy_only=False)
            pos = _bloom_positions(_splitmix64(ks), n_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_bits // 8, dtype=np.uint8)
        for blob in t.column("bloom").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    for _ in range(2):
        parts = parts.map_batches(fold, batch_format="pyarrow",
                                  batch_size=64)
    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for blob in collect_table(parts).column("bloom").to_pylist():
        acc |= np.frombuffer(blob, dtype=np.uint8)
    return acc.tobytes()


def bloom_filter_member_ints(ds: rd.Dataset, bloom: bytes, col: str,
                             n_bits: int | None = None) -> rd.Dataset:
    """Keep only rows whose int64 ``col`` is POSSIBLY in ``bloom`` (the
    probe side of bloom-join pushdown: false positives pass — an exact
    verify join downstream removes them; true members always pass, so
    the pushdown never changes the join result). Broadcast once via
    ``ray.put``; each task tests its batch vectorized — no shuffle."""
    import ray as _ray
    n_bits = n_bits or len(bloom) * 8
    bloom_ref = _ray.put(np.frombuffer(bloom, dtype=np.uint8))

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.schema.names:
            return t
        bits = _ray.get(bloom_ref)
        ks = t.column(col).to_numpy(zero_copy_only=False)
        pos = _bloom_positions(_splitmix64(ks), n_bits)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return t.filter(pa.array(hit.all(axis=1)))

    return ds.map_batches(fn, batch_format="pyarrow")


def bloom_novel_docs(sf_dir: str, n_bits: int = 1 << 20) -> pa.Table:
    """(doc_id,) of documents NOT already covered by the "historical"
    corpus slice (doc_id % 10 < 3): the cross-shipment incremental-dedup
    query shaped as build-bloom-once, broadcast, filter-new-shard.
    Approximate by design (FPs drop a few novel docs; never the reverse)
    ⇒ rows-only driver check + FP/no-false-negative property tests."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    import pyarrow.compute as pc

    def _mod10(col):
        # pyarrow has no mod kernel; doc_id >= 0 so truncating divide works
        return pc.subtract(col, pc.multiply(pc.divide(col, 10), 10))

    seen = docs.map_batches(
        lambda t: t.filter(pc.less(_mod10(t["doc_id"]), 3)),
        batch_format="pyarrow")
    new = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(_mod10(t["doc_id"]), 3)),
        batch_format="pyarrow")
    bloom = bloom_build(seen, col="text", n_bits=n_bits)
    novel = bloom_filter_novel(new, bloom, col="text", n_bits=n_bits)
    out = collect_table(novel.select_columns(["doc_id"]))
    return out.sort_by("doc_id")



def dedup_conversations(sf_dir: str, turns_per_conv: int = 6) -> pa.Table:
    """(n_convs, n_unique, n_dup_convs, kept_checksum): corpus-level
    exact dedup of WHOLE conversations — two transcript sessions are
    duplicates iff their ordered turn texts are identical (the
    session-level twin of ``dedup_exact``; identical chat sessions are
    a real contamination source in conversational training data). The
    derived corpus is duplicate-free by construction, so duplicates are
    injected deterministically (every doc with doc_id % 7 == 0 gains a
    second copy of its conversation under conv_id ``dup-<doc_id>`` —
    the pii_by_source injection discipline), making the counts
    non-vacuous and exactly predictable.

    Shape: turns shuffle ONCE on a coarse conv-hash bucket (whole
    conversations co-located — the extraction exchange); each bucket
    folds every conversation to ONE (fp, conv_id) row, fp = md5 over
    the ordered turn texts joined with \\x1f; the per-conv stream
    (1/turns_per_conv the size) then folds per fingerprint with a
    combiner groupby (keep = MIN conv_id — deterministic canonical
    pick), and the kept set reduces to counts plus an order-independent
    Σ md5₆₄(kept conv_id) checksum carried as 16-bit limb partials —
    nothing O(conversations) lands on the driver."""
    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.sources.transcripts import transcripts_from_documents

    import pyarrow.parquet as _pq

    docs = _pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    base = transcripts_from_documents(docs, turns_per_conv=turns_per_conv)
    base = base.select(["conv_id", "turn_idx", "text"])
    dup_ids = [d for d in docs.column("doc_id").to_pylist() if d % 7 == 0]
    dup_mask = pa.array(
        [c in {f"doc-{d}" for d in dup_ids}
         for c in base.column("conv_id").to_pylist()], pa.bool_())
    dups = base.filter(dup_mask)
    dups = dups.set_column(
        0, "conv_id",
        pa.array(["dup-" + c[len("doc-"):] for c in
                  dups.column("conv_id").to_pylist()], pa.string()))
    corpus = pa.concat_tables([base, dups])

    nb = reduce_bucket_count()
    ds = rd.from_arrow(corpus)

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "conv_id" not in t.schema.names:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int32()),
                             "text": pa.array([], pa.string())})
        b = [int(hashlib.md5(c.encode()).hexdigest()[:8], 16) % nb
             for c in t.column("conv_id").to_pylist()]
        return pa.table({"bucket": pa.array(b, pa.int32()),
                         "conv_id": t["conv_id"],
                         "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                         "text": pc.cast(t["text"], pa.string())})

    def fingerprint(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        out_fp, out_cid = [], []
        for cid, grp in g.groupby("conv_id", sort=False):
            fp = hashlib.md5(
                "\x1f".join(grp["text"].fillna("")).encode()).hexdigest()
            out_fp.append(fp)
            out_cid.append(cid)
        return pd.DataFrame({"fp": out_fp, "conv_id": out_cid})

    convs = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fingerprint, batch_format="pandas")

    per_fp = partial_groupby(convs, ["fp"],
                             {"kept": ("conv_id", "min"),
                              "n_copies": ("conv_id", "count")})

    def summarize(t: pa.Table) -> pa.Table:
        n_fp = t.num_rows
        copies = sum(t.column("n_copies").to_pylist()) if n_fp else 0
        s = [0, 0, 0, 0]
        for c in (t.column("kept").to_pylist() if n_fp else []):
            h = int(hashlib.md5(c.encode()).hexdigest()[:16], 16)
            for i in range(4):
                s[i] += (h >> (16 * i)) & 0xFFFF
        return pa.table({"one": pa.array([1], pa.int64()),
                         "n_convs": pa.array([copies], pa.int64()),
                         "n_unique": pa.array([n_fp], pa.int64()),
                         **{f"s{i}": pa.array([s[i]], pa.int64())
                            for i in range(4)}})

    spec = {"n_convs": ("n_convs", "sum"), "n_unique": ("n_unique", "sum")}
    for i in range(4):
        spec[f"s{i}"] = (f"s{i}", "sum")
    g = collect_table(partial_groupby(
        per_fp.map_batches(summarize, batch_format="pyarrow"),
        ["one"], spec))
    n_convs = int(g.column("n_convs")[0].as_py())
    n_unique = int(g.column("n_unique")[0].as_py())
    total = (int(g.column("s0")[0].as_py())
             + (int(g.column("s1")[0].as_py()) << 16)
             + (int(g.column("s2")[0].as_py()) << 32)
             + (int(g.column("s3")[0].as_py()) << 48)) % (1 << 64)
    return pa.table({
        "n_convs": pa.array([n_convs], pa.int64()),
        "n_unique": pa.array([n_unique], pa.int64()),
        "n_dup_convs": pa.array([n_convs - n_unique], pa.int64()),
        "kept_checksum": pa.array([format(total, "016x")], pa.string())})


# Gear table for content-defined chunking: 256 stable 64-bit values
# derived from md5 so every worker/process regenerates them identically.
_GEAR = np.array([int.from_bytes(hashlib.md5(bytes([b])).digest()[:8],
                                 "big") for b in range(256)],
                 dtype=np.uint64)
_GEAR_WINDOW = 64  # (h << 1) + gear[b] forgets bytes older than 64 shifts


def _cdc_boundaries(data: np.ndarray, mask: np.uint64) -> np.ndarray:
    """Positions i where the gear rolling hash hits the boundary mask
    (cut AFTER byte i). The recurrence h = (h << 1) + gear[b] (mod 2^64)
    only ever sees the last 64 bytes, so it vectorizes as 64 shifted
    adds over the whole byte array — no Python loop over bytes."""
    n = len(data)
    g = _GEAR[data]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(min(_GEAR_WINDOW, n)):
        # gear[b_{i-j}] << j contributes to h_i
        h[j:] += g[:n - j] << np.uint64(j)
    return np.nonzero((h & mask) == 0)[0]


def cdc_chunk_stats(sf_dir: str, avg_bits: int = 6) -> pa.Table:
    """One-row corpus report (total_chunks, distinct_chunks,
    total_bytes, distinct_bytes, dup_byte_pct): content-defined
    chunking dedup — every document is split at gear-rolling-hash
    boundaries (expected chunk ~2^avg_bits bytes), chunks are keyed by
    md5, and the corpus-level duplicate mass is measured at CHUNK
    granularity. This is the storage-dedup / near-identical-long-doc
    screen that whole-document hashing misses: insert one sentence into
    a 100-page doc and every chunk except the edited one still
    deduplicates (the CDC shift-invariance property — pinned by the
    property tests).

    Scale shape: chunking + hashing is one map_batches pass (the
    rolling hash vectorizes as 64 shifted adds — no per-byte Python);
    only (digest16, nbytes) rows cross the wire into a combiner
    groupby; the final count/sum partials fold to one row. No oracle:
    the boundary function is a rolling hash DuckDB cannot express —
    invariance and mass-conservation property tests pin it instead."""
    mask = np.uint64((1 << avg_bits) - 1)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def chunk(t: pa.Table) -> pa.Table:
        digs, sizes = [], []
        for txt in t.column("text").to_pylist():
            raw = (txt or "").encode("utf-8", "surrogatepass")
            if not raw:
                continue
            arr = np.frombuffer(raw, dtype=np.uint8)
            cutpos = _cdc_boundaries(arr, mask)
            prev = 0
            for cp in cutpos:
                end = int(cp) + 1
                if end < len(raw):  # trailing remainder merges below
                    digs.append(hashlib.md5(raw[prev:end]).digest())
                    sizes.append(end - prev)
                    prev = end
            digs.append(hashlib.md5(raw[prev:]).digest())
            sizes.append(len(raw) - prev)
        return pa.table({"dig": pa.array(digs, pa.binary(16)),
                         "nbytes": pa.array(sizes, pa.int64())})

    per_chunk = partial_groupby(
        ds.map_batches(chunk, batch_format="pyarrow"),
        ["dig"], {"n": ("nbytes", "count"), "nb": ("nbytes", "min")})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.schema.names:
            z = pa.array([0], pa.int64())
            return pa.table({"total_chunks": z, "distinct_chunks": z,
                             "total_bytes": z, "distinct_bytes": z})
        n = t.column("n").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        return pa.table({
            "total_chunks": pa.array([int(n.sum())], pa.int64()),
            "distinct_chunks": pa.array([len(n)], pa.int64()),
            "total_bytes": pa.array([int((n * nb).sum())], pa.int64()),
            "distinct_bytes": pa.array([int(nb.sum())], pa.int64())})

    parts = collect_table(per_chunk.map_batches(fold,
                                                batch_format="pyarrow"))
    tot_c = int(pa.compute.sum(parts["total_chunks"]).as_py() or 0)
    dis_c = int(pa.compute.sum(parts["distinct_chunks"]).as_py() or 0)
    tot_b = int(pa.compute.sum(parts["total_bytes"]).as_py() or 0)
    dis_b = int(pa.compute.sum(parts["distinct_bytes"]).as_py() or 0)
    dup_pct = 0 if tot_b == 0 else (tot_b - dis_b) * 100 // tot_b
    return pa.table({
        "total_chunks": pa.array([tot_c], pa.int64()),
        "distinct_chunks": pa.array([dis_c], pa.int64()),
        "total_bytes": pa.array([tot_b], pa.int64()),
        "distinct_bytes": pa.array([dis_b], pa.int64()),
        "dup_byte_pct": pa.array([dup_pct], pa.int64())})


def dedup_cluster_histogram(sf_dir: str) -> pa.Table:
    """(cluster_size, n_clusters, n_docs): the exact-duplicate cluster
    SIZE DISTRIBUTION — how much of the corpus sits in 2×, 3×, …
    duplicated groups. The monitoring view over ``exact_dedup``: a fat
    tail here means one template is stamping the corpus (and the
    effective epoch count of that content is silently multiplied).

    Shape: md5 partials + combiner counts per digest (the exact_dedup
    exchange), then a second tiny combiner over cluster sizes. Oracle:
    GROUP BY md5 -> GROUP BY count."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def digest(t: pa.Table) -> pa.Table:
        ds_ = [hashlib.md5(v.encode()).hexdigest()
               for v in t.column("text").to_pylist() if v is not None]
        return pa.table({"d": pa.array(ds_, pa.string())})

    per_digest = partial_groupby(
        ds.map_batches(digest, batch_format="pyarrow"),
        ["d"], {"n": ("d", "count")})

    def sizes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.schema.names:
            return pa.table({"cluster_size": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64()),
                             "docs": pa.array([], pa.int64())})
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"cluster_size": pa.array(n.astype(np.int64)),
                         "one": pa.array(np.ones(len(n), np.int64)),
                         "docs": pa.array(n.astype(np.int64))})

    t = collect_table(partial_groupby(
        per_digest.map_batches(sizes, batch_format="pyarrow"),
        ["cluster_size"], {"n_clusters": ("one", "sum"),
                           "n_docs": ("docs", "sum")}))
    if t.num_rows == 0:
        return pa.table({"cluster_size": pa.array([], pa.int64()),
                         "n_clusters": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64())})
    import pyarrow.compute as pc
    return pa.table({
        "cluster_size": pc.cast(t["cluster_size"], pa.int64()),
        "n_clusters": pc.cast(t["n_clusters"], pa.int64()),
        "n_docs": pc.cast(t["n_docs"], pa.int64())}).sort_by(
        "cluster_size")
