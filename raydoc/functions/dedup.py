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
- ``embedding_neardups``     cosine ≥ τ pairs against a broadcast matrix
                             (brute force; LSH-bucketed path for scale in
                             functions/similarity.py)

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
    t = pa.Table.from_pylist(out.take_all())
    return t.select([id_col]).sort_by(id_col)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    return np.unique(np.array(
        [_md5_64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)],
        dtype=np.uint64))


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash over word k-shingles (vectorized)."""
    sh = _shingles(text, k)
    # (perm, shingle) universal-hash matrix, min over shingles
    vals = (sh[None, :] * _MH_A[:, None] + _MH_B[:, None]) % _PRIME
    return vals.min(axis=1)


def minhash_band_rows(ds: rd.Dataset, id_col: str = "doc_id",
                      col: str = "text", bands: int = 16,
                      k: int = 3) -> rd.Dataset:
    """Explode each doc into (band, band_hash, id, signature-hex) rows."""
    rows_per_band = 64 // bands

    def fn(t: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(t.column(id_col).to_pylist(),
                                t.column(col).to_pylist()):
            sig = minhash_signature(text or "", k)
            sig_hex = sig.tobytes().hex()
            for b in range(bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                band_hashes.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
                band_ids.append(b)
                ids.append(doc_id)
                sigs.append(sig_hex)
        return pa.table({
            id_col: pa.array(ids),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
            "sig": pa.array(sigs, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_clusters(sf_dir: str, threshold: float = 0.5,
                         bands: int = 16, k: int = 3,
                         id_col: str = "doc_id") -> pa.Table:
    """(doc_id, cluster) where cluster = min doc id of the near-dup
    component; singletons cluster with themselves."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])
    exploded = minhash_band_rows(ds, id_col=id_col, bands=bands, k=k)

    import pandas as pd

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_j": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = [np.frombuffer(bytes.fromhex(s), dtype=np.uint64)
                for s in g["sig"]]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    j_out.append(est)
        return pd.DataFrame({"a": a_out, "b": b_out, "est_j": j_out})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")
    pair_rows = {(r["a"], r["b"]) for r in pairs.take_all()}

    # union-find over the (small) candidate pair set
    all_ids = ds.select_columns([id_col]).take_all()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(pair_rows):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    ids = sorted(r[id_col] for r in all_ids)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "cluster": pa.array([find(i) for i in ids], pa.int64()),
    })


def simhash64(text: str) -> int:
    toks = _TOKEN.findall(text.lower())
    if not toks:
        return 0
    hashes = np.array([_md5_64(t) for t in toks], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = 0
    for i, v in enumerate(votes):
        if v > 0:
            out |= 1 << i
    return out


def simhash_signatures(sf_dir: str, id_col: str = "doc_id") -> pa.Table:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])

    def fn(t: pa.Table) -> pa.Table:
        sigs = [f"{simhash64(v or ''):016x}"
                for v in t.column("text").to_pylist()]
        return pa.table({id_col: t.column(id_col),
                         "simhash": pa.array(sigs, pa.string())})

    rows = ds.map_batches(fn, batch_format="pyarrow").take_all()
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r[id_col]))


def simhash_neardups(sf_dir: str, max_hamming: int = 3,
                     id_col: str = "doc_id") -> pa.Table:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit bands
    (any pair within distance 3 shares at least one of 4 bands)."""
    sigs = simhash_signatures(sf_dir, id_col)
    ids = sigs[id_col].to_pylist()
    vals = [int(s, 16) for s in sigs["simhash"].to_pylist()]
    buckets: dict[tuple[int, int], list[int]] = {}
    for idx, v in enumerate(vals):
        for b in range(4):
            buckets.setdefault((b, (v >> (16 * b)) & 0xFFFF), []).append(idx)
    seen: set[tuple[int, int]] = set()
    a_out, b_out, d_out = [], [], []
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                key = (min(ids[x], ids[y]), max(ids[x], ids[y]))
                if key in seen:
                    continue
                seen.add(key)
                d = bin(vals[x] ^ vals[y]).count("1")
                if d <= max_hamming:
                    a_out.append(key[0])
                    b_out.append(key[1])
                    d_out.append(d)
    order = np.argsort(np.array(a_out) * 10**9 + np.array(b_out)) if a_out else []
    return pa.table({
        "a": pa.array([a_out[i] for i in order], pa.int64()),
        "b": pa.array([b_out[i] for i in order], pa.int64()),
        "hamming": pa.array([d_out[i] for i in order], pa.int32()),
    })


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.4, k: int = 3,
                        id_col: str = "doc_id") -> pa.Table:
    """Exact word-k-gram Jaccard over LSH candidate pairs: LSH proposes,
    exact shingle sets (recomputed per pair inside the verify stage) decide."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[id_col, "text"])
    exploded = minhash_band_rows(ds, id_col=id_col, bands=32, k=k)

    import pandas as pd

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ids = sorted(g[id_col].unique().tolist())
        return pd.DataFrame(
            [(ids[i], ids[j]) for i in range(len(ids))
             for j in range(i + 1, len(ids))], columns=["a", "b"])

    candidates = {(r["a"], r["b"]) for r in exploded.groupby(
        ["band", "band_hash"]).map_groups(bucket_pairs,
                                          batch_format="pandas").take_all()}
    if not candidates:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    texts = {r[id_col]: r["text"] for r in ds.take_all()}
    rows = []
    for a, b in sorted(candidates):
        sa, sb = set(_shingles(texts[a] or "", k)), set(_shingles(texts[b] or "", k))
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 0.0
        if j >= threshold:
            rows.append({"a": a, "b": b, "jaccard": round(j, 6)})
    if not rows:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    return pa.Table.from_pylist(rows)


def embedding_neardups(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """Cosine ≥ τ pairs: per-batch numpy matmul against the broadcast
    normalized matrix (the all-pairs small-corpus path; LSH-bucketed
    variant in functions/similarity.py scales this out)."""
    import ray

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    full = pa.Table.from_pylist(emb.take_all())
    ids = np.array(full["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(full["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    ref = ray.put((ids, mat))

    def fn(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        q_ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
        sims = q @ all_mat.T
        a_out, b_out, s_out = [], [], []
        for row, qid in enumerate(q_ids):
            hits = np.where(sims[row] >= threshold)[0]
            for h in hits:
                if all_ids[h] > qid:
                    a_out.append(qid)
                    b_out.append(int(all_ids[h]))
                    s_out.append(round(float(sims[row, h]), 6))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "cosine": pa.array(s_out, pa.float64())})

    rows = emb.map_batches(fn, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["a"], r["b"]))
    if not rows:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return pa.Table.from_pylist(rows)
