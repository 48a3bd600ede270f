"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: the exact baseline — per-batch numpy matmul of the
  (broadcast, normalized) query matrix against each batch of vectors,
  per-batch top-k pruning so only ``queries × k`` candidate rows per batch
  leave the stage, final exact top-k merge.
- ``lsh_topk``: the scale path — signed-random-projection LSH: vectors land
  in hyperplane-sign buckets; queries probe their own bucket (+ optional
  multi-probe by flipping low-margin bits). Recall < 1 by design; the
  bucket shuffle moves (bucket, id, vector) once, queries are broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)


def _read_query_vectors(sf_dir: str,
                        query_ids: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side read of ONLY the query rows via a parquet predicate
    (row-group pushdown) — never materializes the corpus. Returns
    (ids sorted ascending, L2-normalized matrix)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", sorted(set(query_ids)))])
    t = t.sort_by("vec_id")
    q_ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    q = _normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    return q_ids, q


def _batch_candidates(ref, k: int, exclude_self: bool):
    def fn(t: pa.Table) -> pa.Table:
        q_ids, q = ray.get(ref)
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = _normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
        sims = q @ mat.T                                   # (Q, B)
        kk = min(k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for row, qid in enumerate(q_ids):
            s = sims[row]
            idx = np.argpartition(-s, kk - 1)[:kk]
            for h in idx:
                if exclude_self and ids[h] == qid:
                    continue
                out_q.append(int(qid))
                out_v.append(int(ids[h]))
                out_s.append(float(s[h]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})
    return fn


def _final_topk(df: pd.DataFrame, k: int) -> pa.Table:
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         "vec_id": pa.array([], pa.int64())})
    # multi-table LSH proposes the same (query, vec) from several tables
    # (identical cosine) — dedup before ranking so top-k slots aren't
    # wasted on copies
    df = df.drop_duplicates(["query_id", "vec_id"])
    df = df.sort_values(["query_id", "cosine", "vec_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True),
        preserve_index=False)


def brute_force_topk(sf_dir: str, query_ids: list[int] | None = None,
                     k: int = 10, exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k; ties broken by ascending vec_id in both engines."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    query_ids = query_ids if query_ids is not None else [0, 1, 2, 3, 4]
    q_ids, q = _read_query_vectors(sf_dir, query_ids)
    ref = ray.put((q_ids, q))
    cands = ds.map_batches(_batch_candidates(ref, k + 1, exclude_self),
                           batch_format="pyarrow").to_pandas()
    return _final_topk(cands, k)


def _probe_sets(margins: np.ndarray, n_probes: int) -> list[int]:
    """Margin-aware multi-probe sequence (Lv et al., VLDB 2007): the
    XOR masks of the ``n_probes`` most promising perturbations — subsets
    of size ≤2 of the lowest-|margin| planes, ordered by total flipped
    margin (a true neighbor most plausibly sits on the other side of the
    planes the query is closest to). Mask 0 (the home bucket) included."""
    order = np.argsort(np.abs(margins))
    m = min(len(order), 8)                  # perturb within the 8 closest
    cand: list[tuple[float, int]] = [(0.0, 0)]
    for i in range(m):
        ci = float(abs(margins[order[i]]))
        cand.append((ci, 1 << int(order[i])))
        for j in range(i + 1, m):
            cand.append((ci + float(abs(margins[order[j]])),
                         (1 << int(order[i])) | (1 << int(order[j]))))
    cand.sort()
    return [mask for _, mask in cand[:n_probes + 1]]


def lsh_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
             n_planes: int = 8, seed: int = 7,
             multiprobe: int = 12, n_tables: int = 8,
             sub_buckets: int = 4) -> pa.Table:
    """Approximate top-k via signed-random-projection buckets, with the
    two standard recall levers COMPOSED: ``n_tables`` independent hash
    tables (recall 1-(1-p)^L) × margin-aware MULTI-PROBE inside each
    table (each query probes its home bucket plus the ``multiprobe``
    most-promising perturbed buckets — subsets of its lowest-margin
    planes). Exact re-rank within probed buckets. The earlier
    single-table / 2-probe default measured 8% recall@10 on the bench
    embeddings (weakly structured, near-neighbor cosine ≈ 0.35 — the
    regime where one table is hopeless); this default measures ≥60%
    (floor pinned in tests/test_overlap_mmr.py) at ~L·(probes/2^planes)
    ≈ 40% candidate mass. For strongly clustered corpora lower
    ``multiprobe``/``n_tables``; for exact-ish needs use IVF/PQ (better
    recall/compute here — see ``ann_recall_report``).

    Scale shape: the corpus explodes ×``n_tables`` through ONE exchange
    (bucket key = table × bucket × vec_id-salt); a probe group is a
    SUB-bucket (``sub_buckets`` per bucket), so a hot bucket splits
    across tasks and per-query candidates merge (deduped across tables)
    in the final exact top-k. Results identical for any sub_buckets."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    query_ids = query_ids if query_ids is not None else [0, 1, 2, 3, 4]
    # queries come from a tiny predicate-pushdown read; their buckets are
    # computed driver-side with the same planes the corpus stage uses
    q_ids, q = _read_query_vectors(sf_dir, query_ids)
    rng = np.random.RandomState(seed)
    dim = q.shape[1]
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)
    S = sub_buckets
    L = n_tables
    pow2 = 1 << np.arange(n_planes)

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        out_ids, out_bk, out_row = [], [], []
        for tbl in range(L):
            signs = (mat @ pl[tbl].T) > 0
            buckets = (signs * pow2).sum(axis=1).astype(np.int64)
            gk = ((tbl << n_planes) | buckets) * S + (ids % S)
            out_ids.append(ids)
            out_bk.append(gk)
            out_row.append(np.arange(len(ids)))
        rows = np.concatenate(out_row)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_ids)),
             t.column("embedding").take(pa.array(rows)),
             pa.array(np.concatenate(out_bk))],
            names=["vec_id", "embedding", "bucket"])

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    by_bucket: dict[int, list[int]] = {}
    for tbl in range(L):
        q_proj = q @ planes[tbl].T               # (Q, n_planes) margins
        q_buckets = ((q_proj > 0) * pow2).sum(axis=1)
        for qi in range(len(q)):
            home = int(q_buckets[qi])
            for mask in _probe_sets(q_proj[qi], multiprobe):
                pb = (tbl << n_planes) | (home ^ mask)
                lst = by_bucket.setdefault(pb, [])
                if not lst or lst[-1] != qi:
                    lst.append(qi)
    q_by_bucket_ref = ray.put({
        b: (q_ids[rows], q[rows]) for b, rows in by_bucket.items()})

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        qmap = ray.get(q_by_bucket_ref)
        bucket = int(group["bucket"].iloc[0]) // S   # sub-bucket → bucket
        if bucket not in qmap:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        q_ids, q = qmap[bucket]
        ids = group["vec_id"].to_numpy()
        mat = _normalize(np.stack(group["embedding"].to_numpy()).astype(np.float64))
        sims = q @ mat.T
        rows = []
        for row, qid in enumerate(q_ids):
            for h in np.argsort(-sims[row])[:k + 1]:
                if ids[h] != qid:
                    rows.append({"query_id": int(qid), "vec_id": int(ids[h]),
                                 "cosine": float(sims[row, h])})
        return pd.DataFrame(rows) if rows else pd.DataFrame(
            {"query_id": [], "vec_id": [], "cosine": []})

    cands = bucketed.groupby("bucket").map_groups(
        probe, batch_format="pandas").to_pandas()
    return _final_topk(cands, k)


def _train_centroids(sample: np.ndarray, n_lists: int, iters: int,
                     seed: int) -> np.ndarray:
    """Seeded mini k-means (spherical: centroids re-normalized each round)
    on a driver-side sample — the IVF coarse quantizer."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample)
    cents = sample[rng.choice(len(sample), size=min(n_lists, len(sample)),
                              replace=False)]
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
             n_lists: int = 16, nprobe: int = 4, seed: int = 7,
             train_sample: int = 2048, iters: int = 10,
             sub_buckets: int = 4) -> pa.Table:
    """IVF approximate top-k: a coarse k-means quantizer partitions vectors
    into inverted lists; each query probes its ``nprobe`` nearest lists.

    Scale path: the quantizer trains on a driver-side sample (tiny), the
    assignment is one vectorized map over the corpus, the probe stage
    shuffles each vector ONCE (by list id × vec_id-salt — a probe group is
    a SUB-list of ~|list|/``sub_buckets`` vectors, so no single task holds
    a whole n/n_lists inverted list; per-query candidates merge in the
    final exact top-k, results identical for any ``sub_buckets``) and
    queries broadcast. Recall grows with nprobe (nprobe = n_lists ⇒ exact
    brute force)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    sample_rows = ds.take(train_sample)
    sample = np.array([np.asarray(r["embedding"], dtype=np.float64)
                       for r in sample_rows])
    cents = _train_centroids(sample, n_lists, iters, seed)
    cents_ref = ray.put(cents)
    S = sub_buckets

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        lists = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return t.append_column("list_id", pa.array(lists * S + (ids % S)))

    listed = ds.map_batches(assign, batch_format="pyarrow")

    query_ids = query_ids if query_ids is not None else [0, 1, 2, 3, 4]
    q_ids, q = _read_query_vectors(sf_dir, query_ids)
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    q_by_list: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for li in probes[qi]:
            q_by_list.setdefault(int(li), []).append(qi)
    q_by_list_ref = ray.put({
        li: (q_ids[rows], q[rows]) for li, rows in q_by_list.items()})

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        qmap = ray.get(q_by_list_ref)
        li = int(group["list_id"].iloc[0]) // S      # sub-list → list
        if li not in qmap:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        gq_ids, gq = qmap[li]
        ids = group["vec_id"].to_numpy()
        mat = _normalize(np.stack(group["embedding"].to_numpy()).astype(np.float64))
        sims = gq @ mat.T
        rows = []
        for row, qid in enumerate(gq_ids):
            for h in np.argsort(-sims[row])[:k + 1]:
                if ids[h] != qid:
                    rows.append({"query_id": int(qid), "vec_id": int(ids[h]),
                                 "cosine": float(sims[row, h])})
        return pd.DataFrame(rows) if rows else pd.DataFrame(
            {"query_id": [], "vec_id": [], "cosine": []})

    cands = listed.groupby("list_id").map_groups(
        probe, batch_format="pandas").to_pandas()
    return _final_topk(cands, k)


def kmeans_centroids(sf_dir: str, k: int = 8, iters: int = 10,
                     seed: int = 7) -> np.ndarray:
    """Distributed Lloyd's k-means fit → the (k × d) centroid matrix.

    Scale shape per iteration: centroids broadcast via ``ray.put``; each
    batch emits ONE (k×d sums, k counts) partial — rows never leave their
    batch; partials merge in WORKER-side tree-fold levels (sum is
    associative) so the driver folds a handful of blobs, not one per
    batch. Deterministic: seeded init from the first rows, fixed iteration
    count, ties break to the lowest centroid index."""
    # iterations re-scan the same table: materialize once (object-store
    # resident, spills at scale) instead of re-decoding parquet per round
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    init_rows = ds.take(max(k * 4, 64))
    rng = np.random.RandomState(seed)
    init = _normalize(np.array([np.asarray(r["embedding"], dtype=np.float64)
                                for r in init_rows]))
    cents = init[rng.choice(len(init), size=min(k, len(init)),
                            replace=False)]
    shape = cents.shape

    def fold(t: pa.Table) -> pa.Table:
        sums = np.zeros(shape, dtype=np.float64)
        counts = np.zeros(shape[0], dtype=np.int64)
        for sb, cb in zip(t.column("sums").to_pylist(),
                          t.column("counts").to_pylist()):
            sums += np.frombuffer(sb, dtype=np.float64).reshape(shape)
            counts += np.frombuffer(cb, dtype=np.int64)
        return pa.table({"sums": pa.array([sums.tobytes()], pa.binary()),
                         "counts": pa.array([counts.tobytes()], pa.binary())})

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            mat = _normalize(np.array(t["embedding"].to_pylist(),
                                      dtype=np.float64))
            assign = (mat @ c.T).argmax(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, mat)
            np.add.at(counts, assign, 1)
            return pa.table({"sums": pa.array([sums.tobytes()], pa.binary()),
                             "counts": pa.array([counts.tobytes()],
                                                pa.binary())})

        parts_ds = ds.map_batches(partial, batch_format="pyarrow")
        # two fold levels: 1M batches → 245 → 4 partials reach the driver
        for _ in range(2):
            parts_ds = parts_ds.map_batches(fold, batch_format="pyarrow",
                                            batch_size=64)
        parts = parts_ds.to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for sb, cb in zip(parts["sums"], parts["counts"]):
            sums += np.frombuffer(sb, dtype=np.float64).reshape(cents.shape)
            counts += np.frombuffer(cb, dtype=np.int64)
        nz = counts > 0
        cents[nz] = _normalize(sums[nz] / counts[nz, None])
    return cents


def assign_clusters_fn(cents_ref, extra_cols: tuple[str, ...] = ()):
    """Batch fn: append ``cluster`` = argmax-cosine centroid (broadcast
    centroids — NOT a per-id label map; assignment is recomputed anywhere
    it's needed, so no O(n) state ever exists on the driver)."""
    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(np.array(t["embedding"].to_pylist(),
                                  dtype=np.float64))
        assign = (mat @ c.T).argmax(axis=1).astype(np.int64)
        cols = {"vec_id": t["vec_id"], "cluster": pa.array(assign)}
        for name in extra_cols:
            cols[name] = t[name]
        return pa.table(cols)
    return label


def embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 10,
                     seed: int = 7) -> pa.Table:
    """(vec_id, cluster): distributed Lloyd's k-means over the embedding
    column — the corpus-bucketing / semantic-dedup workhorse. Fit via
    ``kmeans_centroids`` (tree-folded partials), then one streamed
    labeling pass from the broadcast centroids."""
    from raydoc.functions._collect import collect_table

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cents = kmeans_centroids(sf_dir, k=k, iters=iters, seed=seed)
    ref = ray.put(cents)
    out = collect_table(ds.map_batches(assign_clusters_fn(ref),
                                       batch_format="pyarrow"))
    return out.sort_by("vec_id")


def pca_components(sf_dir: str, k: int = 2) -> tuple:
    """(mean d-vector, k×d components, eigenvalues): fit PCA over the
    embedding column. Per-batch partials are (count, Σx d-vector, XᵀX
    d×d) — a few KB regardless of corpus size — tree-folded in workers
    (two map levels), then ONE small eigendecomposition on the driver
    (d×d; d ≪ n always for embeddings). The distributed-moments shape —
    the corpus streams once, nothing row-sized leaves the workers.

    Sign convention: each component's largest-|coordinate| entry is made
    positive, so results are stable across runs and block orders."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t.column("embedding").to_pylist()]) \
            if t.num_rows else np.zeros((0, 1))
        d = X.shape[1]
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([X.sum(axis=0).tobytes()],
                                       pa.binary()),
                         "xtx": pa.array([(X.T @ X).tobytes()],
                                         pa.binary()),
                         "d": pa.array([d], pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        rows = [r for r in rows if r["n"] > 0]
        if not rows:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([b""], pa.binary()),
                             "xtx": pa.array([b""], pa.binary()),
                             "d": pa.array([0], pa.int64())})
        d = rows[0]["d"]
        n = sum(r["n"] for r in rows)
        s = np.zeros(d)
        xtx = np.zeros((d, d))
        for r in rows:
            s += np.frombuffer(r["s"], dtype=np.float64)
            xtx += np.frombuffer(r["xtx"],
                                 dtype=np.float64).reshape(d, d)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "s": pa.array([s.tobytes()], pa.binary()),
                         "xtx": pa.array([xtx.tobytes()], pa.binary()),
                         "d": pa.array([d], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    for _ in range(2):
        parts = parts.map_batches(fold, batch_format="pyarrow",
                                  batch_size=64)
    from raydoc.functions._collect import collect_table
    final = fold(collect_table(parts)).to_pylist()[0]
    n, d = final["n"], final["d"]
    mean = np.frombuffer(final["s"], dtype=np.float64) / n
    xtx = np.frombuffer(final["xtx"], dtype=np.float64).reshape(d, d)
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # k×d
    for i in range(comps.shape[0]):             # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def embedding_pca(sf_dir: str, k: int = 2) -> pa.Table:
    """(vec_id, pc1..pck): embeddings projected onto the top-k principal
    components — the visualization / decorrelation / whitening front-end.
    Fit via ``pca_components`` (tree-folded moment partials), then one
    streamed projection pass from the broadcast (mean, components).
    Float outputs ⇒ rows-only driver check; numerics pinned by the
    equal-to-local-numpy property test."""
    from raydoc.functions._collect import collect_table

    mean, comps, _ = pca_components(sf_dir, k=k)
    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t.column("embedding").to_pylist()])
        Y = (X - m) @ c.T
        cols = {"vec_id": t["vec_id"]}
        for i in range(c.shape[0]):
            cols[f"pc{i + 1}"] = pa.array(Y[:, i], pa.float64())
        return pa.table(cols)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return collect_table(ds.map_batches(project,
                                        batch_format="pyarrow")) \
        .sort_by("vec_id")


# --- Product quantization (PQ) --------------------------------------------

def _train_pq_codebooks(sample: np.ndarray, m: int, n_codes: int,
                        iters: int, seed: int) -> np.ndarray:
    """(m, n_codes, d/m) per-subspace L2 k-means codebooks on a
    driver-side sample — the PQ trainer."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cents = sub[rng.choice(n, size=min(n_codes, n), replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = sub[a == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents[rng.choice(len(cents), size=n_codes)] \
            if len(cents) < n_codes else cents
    return books


def pq_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
            m: int = 8, n_codes: int = 16, seed: int = 7,
            train_sample: int = 2048, iters: int = 10,
            rerank: int = 5) -> pa.Table:
    """Approximate top-k by PRODUCT QUANTIZATION with exact re-rank: the
    compressed-index ANN regime for corpora whose float vectors don't
    fit cluster memory.

    - Train: ``m`` per-subspace codebooks on a driver sample (tiny).
    - Encode: ONE vectorized map turns each corpus vector into ``m``
      uint8 codes (d=64, m=8 ⇒ 32× compression at float32 parity); only
      (vec_id, codes) flow downstream — the floats are read once and
      never shuffled or retained.
    - Search (ADC): each query broadcasts an (m × n_codes) inner-product
      lookup table; per batch the candidate score is a pure table-gather
      sum over codes (no float matmul), keeping per-batch top-R.
    - Re-rank: per-BATCH top-R candidates (R = rerank·k+1) collect with
      their ADC scores and cut to a GLOBAL per-query top-R on the
      driver; only those ≤ Q·R ids are re-read by parquet predicate
      pushdown and scored EXACTLY — final ranks use true cosine (code
      precision affects recall only, never returned similarities).

    Approximate by construction ⇒ rows-only driver check + a
    recall-vs-brute-force property test, like the LSH/IVF members."""
    if n_codes > 256:
        raise ValueError(f"n_codes={n_codes} exceeds the uint8 code "
                         f"width (max 256)")
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    sample_rows = ds.take(train_sample)
    sample = _normalize(np.array(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in sample_rows]))
    books = _train_pq_codebooks(sample, m, n_codes, iters, seed)
    books_ref = ray.put(books)
    dsub = books.shape[2]

    def encode(t: pa.Table) -> pa.Table:
        bk = ray.get(books_ref)
        mat = _normalize(np.array(t["embedding"].to_pylist(),
                                  dtype=np.float64))
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - bk[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": t["vec_id"],
            "codes": pa.array([codes[i].tobytes()
                               for i in range(len(mat))], pa.binary())})

    encoded = ds.map_batches(encode, batch_format="pyarrow")

    query_ids = query_ids if query_ids is not None else [0, 1, 2, 3, 4]
    q_ids, q = _read_query_vectors(sf_dir, query_ids)
    # (Q, m, n_codes) inner-product LUTs: sim(q, x) ≈ Σ_j q_j · book[j][code_j]
    luts = np.einsum("qjd,jcd->qjc", q.reshape(len(q), m, dsub), books)
    lut_ref = ray.put((q_ids, luts))
    R = max(rerank * k + 1, k + 1)

    def adc(t: pa.Table) -> pa.Table:
        gq_ids, gl = ray.get(lut_ref)
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        codes = np.frombuffer(b"".join(t["codes"].to_pylist()),
                              dtype=np.uint8).reshape(-1, m)
        # (Q, B) approx sims: gather per subspace, sum
        sims = np.zeros((len(gq_ids), len(ids)))
        for j in range(m):
            sims += gl[:, j, codes[:, j]]
        kk = min(R, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for row, qid in enumerate(gq_ids):
            idx = np.argpartition(-sims[row], kk - 1)[:kk]
            keep = idx[ids[idx] != qid]
            out_q.extend([int(qid)] * len(keep))
            out_v.extend(int(v) for v in ids[keep])
            out_s.extend(float(s) for s in sims[row, keep])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "adc": pa.array(out_s, pa.float64())})

    cands = encoded.map_batches(adc, batch_format="pyarrow").to_pandas()
    # global per-query top-R cut (the driver sees batch-top-R rows; the
    # RE-RANK pool is bounded at Q·R regardless of block count)
    cands = (cands.sort_values(["query_id", "adc", "vec_id"],
                               ascending=[True, False, True])
             .groupby("query_id", sort=False).head(R))
    # exact re-rank of the bounded candidate pool (predicate-pushdown read)
    import pyarrow.parquet as pq_
    pool_ids = sorted(set(cands["vec_id"]))
    pool = pq_.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "in", pool_ids)])
    pid = np.array(pool["vec_id"].to_pylist(), dtype=np.int64)
    pmat = _normalize(np.array(pool["embedding"].to_pylist(),
                               dtype=np.float64))
    lookup = {int(v): i for i, v in enumerate(pid)}
    rows = {"query_id": [], "vec_id": [], "cosine": []}
    for qi, qid in enumerate(q_ids):
        cvs = sorted(set(cands.loc[cands["query_id"] == qid, "vec_id"]))
        if not cvs:
            continue
        mat = pmat[[lookup[v] for v in cvs]]
        sims = mat @ q[qi]
        rows["query_id"].extend([int(qid)] * len(cvs))
        rows["vec_id"].extend(cvs)
        rows["cosine"].extend(float(s) for s in sims)
    import pandas as pd
    return _final_topk(pd.DataFrame(rows), k)


# --- Distributed logistic regression ---------------------------------------

def logreg_fit(sf_dir: str, n_classes: int = 10, iters: int = 25,
               lr: float = 8.0, l2: float = 1e-4) -> np.ndarray:
    """One-vs-rest multinomial logistic regression over the embeddings —
    the supervised member of the distributed-ML family (k-means, PCA):
    the (n_classes × d+1) weight matrix broadcasts each iteration; every
    batch emits ONE gradient partial (Xᵀ(σ(XWᵀ)−Y), n); partials merge
    in worker tree-fold levels (associative sums) so the driver folds a
    handful of blobs per iteration regardless of batch count —
    full-batch gradient descent, deterministic given the fixed iteration
    count (the quality classifier training loop of a data pipeline)."""
    # epochs re-scan the same table: materialize once (object-store
    # resident, spills to disk at scale) instead of re-decoding parquet
    # every iteration — Ray's iterative-ML caching pattern
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"]).materialize()
    first = ds.take(1)[0]
    d = len(first["embedding"]) + 1          # +bias
    w = np.zeros((n_classes, d), dtype=np.float64)
    shape = w.shape

    def fold(t: pa.Table) -> pa.Table:
        g = np.zeros(shape, dtype=np.float64)
        n = 0
        for gb, nb in zip(t.column("g").to_pylist(),
                          t.column("n").to_pylist()):
            g += np.frombuffer(gb, dtype=np.float64).reshape(shape)
            n += nb
        return pa.table({"g": pa.array([g.tobytes()], pa.binary()),
                         "n": pa.array([n], pa.int64())})

    for _ in range(iters):
        ref = ray.put(w)

        def partial(t: pa.Table) -> pa.Table:
            wt = ray.get(ref)
            x = _normalize(np.array(t["embedding"].to_pylist(),
                                    dtype=np.float64))
            x = np.hstack([x, np.ones((len(x), 1))])
            y = np.array(t["label"].to_pylist(), dtype=np.int64)
            yh = np.zeros((len(x), n_classes))
            yh[np.arange(len(x)), y] = 1.0
            p = 1.0 / (1.0 + np.exp(-(x @ wt.T)))
            g = (p - yh).T @ x
            return pa.table({"g": pa.array([g.tobytes()], pa.binary()),
                             "n": pa.array([len(x)], pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow")
        for _ in range(2):
            parts = parts.map_batches(fold, batch_format="pyarrow",
                                      batch_size=64)
        g = np.zeros(shape, dtype=np.float64)
        n = 0
        pt = parts.to_pandas()
        for gb, nb in zip(pt["g"], pt["n"]):
            g += np.frombuffer(gb, dtype=np.float64).reshape(shape)
            n += int(nb)
        w -= lr * (g / max(n, 1) + l2 * w)
    return w


def embedding_logreg(sf_dir: str, n_classes: int = 10,
                     iters: int = 25) -> pa.Table:
    """(vec_id, label, pred): train the distributed one-vs-rest logistic
    classifier, then ONE broadcast scoring pass over the corpus (weights
    via ray.put — no per-id state on the driver). Rows-only (float
    training) + accuracy/determinism property tests."""
    w = logreg_fit(sf_dir, n_classes=n_classes, iters=iters)
    w_ref = ray.put(w)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def score(t: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        x = _normalize(np.array(t["embedding"].to_pylist(),
                                dtype=np.float64))
        x = np.hstack([x, np.ones((len(x), 1))])
        pred = (x @ wt.T).argmax(axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "label": t["label"].cast(pa.int64()),
                         "pred": pa.array(pred)})

    from raydoc.functions._collect import collect_table
    return collect_table(
        ds.map_batches(score, batch_format="pyarrow")).sort_by("vec_id")


def _quant_block(t: "pa.Table", scale: int):
    """(ids, q, row_norms) for one embedding block, integer-quantized
    floor(f64(x)·scale) — shared by knn_graph / semantic_dedup /
    semantic_clusters so all three see identical int64 distances."""
    if t.num_rows == 0 or "vec_id" not in t.column_names:
        # repartition(n) of a tiny corpus yields genuinely empty blocks
        # — and Ray hands them over with an EMPTY schema, so guard
        # before any column access
        return (np.zeros(0, np.int64), np.zeros((0, 0), np.int64),
                np.zeros(0, np.int64))
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(mat * float(scale)).astype(np.int64)
    return ids, q, np.einsum("ij,ij->i", q, q)


@ray.remote
def _quant_block_task(block: "pa.Table", scale: int):
    return _quant_block(block, scale)


def _quantized_block_refs(sf_dir: str, n_blocks: int, scale: int):
    """Shared block-pair harness for knn_graph / semantic_dedup /
    semantic_clusters: each embedding block quantizes ONCE (one Ray task
    per block, result object-store-resident) instead of once per pair
    task, and the (i, j >= i) pair task list builds in one place.
    Returns (refs_ref, tasks_ds)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    block_refs = emb.repartition(n_blocks).to_arrow_refs()
    qrefs = [_quant_block_task.remote(r, scale) for r in block_refs]
    refs_ref = ray.put(qrefs)
    n = len(qrefs)
    tasks = rd.from_items([{"i": i, "j": j}
                           for i in range(n) for j in range(i, n)])
    return refs_ref, tasks


def knn_graph(sf_dir: str, k: int = 5, n_blocks: int = 8,
              scale: int = 1024) -> pa.Table:
    """(vec_id, neighbor_id, nn_rank, d2): the EXACT k-nearest-neighbor
    graph over the whole embedding table — the SemDeDup / graph-dedup
    building block (every corpus vector gets its k closest others).
    Distances are squared L2 over integer-quantized components
    (``floor(float64(x) · scale)`` per dimension), so every distance is
    an exact int64 and the DuckDB twin hashes identically — no float
    summation-order hazards. Ties break by (d2, neighbor_id).

    Shape — block-pair tasks like ``embedding_neardups``: the corpus
    splits into ``n_blocks`` object-store blocks; each (i, j ≥ i) pair is
    one task holding exactly two blocks, emitting per-row LOCAL top-k
    candidates in BOTH directions (intermediate volume O(n·k·n_blocks),
    never O(n²) rows); one coarse-bucket exchange merges each vector's
    candidates to the global top-k. Local selection uses the same
    (d2, neighbor_id) lexicographic order as the merge, so tied
    candidates cannot be dropped locally. Raise ``n_blocks`` with corpus
    size (memory per task = 2 blocks)."""
    refs_ref, tasks = _quantized_block_refs(sf_dir, n_blocks, scale)

    from raydoc.functions._buckets import reduce_bucket_count
    nb = reduce_bucket_count()
    sent = np.iinfo(np.int64).max

    def _local_topk(ids_a, d2m, ids_b):
        """Per row of ``d2m``: the first min(k, cols) candidate columns in
        (d2, neighbor_id) order. Returns candidate triples."""
        kk = min(k, d2m.shape[1])
        order = np.lexsort((np.broadcast_to(ids_b, d2m.shape), d2m),
                           axis=1)[:, :kk]
        rows = np.repeat(ids_a, kk)
        cols = ids_b[order].ravel()
        d2 = np.take_along_axis(d2m, order, axis=1).ravel()
        keep = d2 != sent
        return rows[keep], cols[keep], d2[keep]

    def pair_fn(t: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        va, vb, dd = [], [], []
        for i, j in zip(t["i"].to_pylist(), t["j"].to_pylist()):
            ids_i, q_i, n_i = ray.get(all_refs[i])
            ids_j, q_j, n_j = (ids_i, q_i, n_i) if j == i else \
                ray.get(all_refs[j])
            if not len(ids_i) or not len(ids_j):
                continue
            d2m = n_i[:, None] + n_j[None, :] - 2 * (q_i @ q_j.T)
            if j == i:
                np.fill_diagonal(d2m, sent)
            r, c, d = _local_topk(ids_i, d2m, ids_j)
            va.append(r); vb.append(c); dd.append(d)
            if j != i:
                r, c, d = _local_topk(ids_j, d2m.T, ids_i)
                va.append(r); vb.append(c); dd.append(d)
        if not va:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        rows = np.concatenate(va)
        return pa.table({
            "vec_id": pa.array(rows),
            "neighbor_id": pa.array(np.concatenate(vb)),
            "d2": pa.array(np.concatenate(dd)),
            "bucket": pa.array(
                ((rows.astype(np.uint64)
                  * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32))
                .astype(np.int64).astype(np.int32)
                & np.int32(nb - 1))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vec_id", "d2", "neighbor_id"],
                          kind="mergesort", ignore_index=True)
        g["nn_rank"] = g.groupby("vec_id").cumcount() + 1
        g = g[g["nn_rank"] <= k]
        return g[["vec_id", "neighbor_id", "nn_rank", "d2"]]

    cand = tasks.map_batches(pair_fn, batch_format="pyarrow", batch_size=1)
    out = cand.groupby("bucket").map_groups(merge, batch_format="pandas")
    from raydoc.functions._collect import collect_table
    t = collect_table(out)
    return pa.table({
        "vec_id": t["vec_id"].cast(pa.int64()),
        "neighbor_id": t["neighbor_id"].cast(pa.int64()),
        "nn_rank": t["nn_rank"].cast(pa.int64()),
        "d2": t["d2"].cast(pa.int64()),
    }).sort_by([("vec_id", "ascending"), ("nn_rank", "ascending")])


def semantic_dedup(sf_dir: str, tau: int = 1_400_000, n_blocks: int = 8,
                   scale: int = 1024) -> pa.Table:
    """(vec_id): the corpus AFTER SemDeDup-style semantic deduplication —
    a vector is dropped when ANY other vector sits within integer
    squared-L2 distance ``tau`` of it and has a smaller id (keep-first,
    exact — not the usual within-cluster approximation). Same integer
    quantization as ``knn_graph`` so the SQL twin hashes identically.

    Shape: block-pair tasks (2 blocks resident per task) emit the
    task-deduped DROPPED ids only — O(close pairs), never O(n²) rows;
    one adaptive anti semi-join (``bucket_semi_join``) marks survivors
    without the corpus ever leaving the workers."""
    refs_ref, tasks = _quantized_block_refs(sf_dir, n_blocks, scale)

    def pair_fn(t: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        dropped = []
        for i, j in zip(t["i"].to_pylist(), t["j"].to_pylist()):
            ids_i, q_i, n_i = ray.get(all_refs[i])
            ids_j, q_j, n_j = (ids_i, q_i, n_i) if j == i else \
                ray.get(all_refs[j])
            if not len(ids_i) or not len(ids_j):
                continue
            d2m = n_i[:, None] + n_j[None, :] - 2 * (q_i @ q_j.T)
            xs, ys = np.where(d2m <= tau)
            ia, ib = ids_i[xs], ids_j[ys]
            neq = ia != ib
            if neq.any():
                dropped.append(np.unique(np.maximum(ia[neq], ib[neq])))
        out = (np.unique(np.concatenate(dropped)) if dropped
               else np.array([], dtype=np.int64))
        return pa.table({"vec_id": pa.array(out, pa.int64())})

    dropped_ds = tasks.map_batches(pair_fn, batch_format="pyarrow",
                                   batch_size=1)
    ids = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id"])
    from raydoc.functions._collect import collect_table
    from raydoc.functions.joins import bucket_semi_join
    kept = bucket_semi_join(ids, dropped_ds, "vec_id", anti=True)
    return collect_table(kept).sort_by("vec_id")


def label_knn_accuracy(sf_dir: str, k: int = 1, n_blocks: int = 8,
                       scale: int = 1024) -> pa.Table:
    """(label, n_vecs, n_correct): leave-one-out k-NN label agreement
    over the embedding table — the standard embedding-quality probe
    (does vector geometry predict the label column). A vector counts
    correct when a STRICT MAJORITY of its k nearest others (excluding
    itself) carries its own label; k=1 is plain LOO-1NN accuracy.

    Exactness: neighbors come from ``knn_graph`` (integer-quantized
    squared L2, ties by (d2, neighbor_id) — no float summation-order
    hazards), so the DuckDB twin hashes identically. Scale shape: the
    block-pair kNN does the heavy lifting; the label join + per-label
    fold run over the already-small (n·k) neighbor table. At 10⁹+
    vectors swap ``knn_graph`` for the ANN paths (IVF/PQ) — same fold,
    approximate neighbors (documented complement, like
    embedding_neardups vs its clustered variant)."""
    from raydoc.functions._collect import collect_table

    nn = knn_graph(sf_dir, k=k, n_blocks=n_blocks, scale=scale)
    labels = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "label"])
    lab = collect_table(labels).to_pandas()
    lab["label"] = lab["label"].astype("int64")
    df = nn.to_pandas()[["vec_id", "neighbor_id"]]
    df = df.merge(lab.rename(columns={"label": "la"}), on="vec_id")
    df = df.merge(lab.rename(columns={"vec_id": "neighbor_id",
                                      "label": "lb"}), on="neighbor_id")
    per_vec = df.assign(hit=(df["la"] == df["lb"]).astype("int64")) \
        .groupby("vec_id", sort=True).agg(la=("la", "max"),
                                          same=("hit", "sum"))
    per_vec["correct"] = (per_vec["same"] * 2 > k).astype("int64")
    out = per_vec.groupby("la", sort=True).agg(
        n_vecs=("correct", "size"), n_correct=("correct", "sum"))
    return pa.table({
        "label": pa.array(out.index.to_numpy(), pa.int64()),
        "n_vecs": pa.array(out["n_vecs"].to_numpy(), pa.int64()),
        "n_correct": pa.array(out["n_correct"].to_numpy(), pa.int64())})


def label_distance_matrix(sf_dir: str, n_blocks: int = 8,
                          scale: int = 1024) -> pa.Table:
    """(label_a, label_b, n_pairs, sum_d2, mean_d2): exact pairwise
    separation audit of the embedding space by label — for every
    unordered label pair, the count and total (and floor-mean) of
    integer-quantized squared L2 distances over ALL cross-vector pairs.
    Diagonal rows (label_a = label_b) are intra-class spread; a healthy
    labeled embedding shows diagonal means ≪ off-diagonal means (the
    centroid-free cousin of a silhouette score, exact enough to hash
    against a DuckDB cross-join twin — no float summation hazards).

    Shape: the same (i, j ≥ i) block-pair harness as ``knn_graph``
    (each task holds exactly two quantized blocks; intra-block tasks
    take the vec_id-ordered upper triangle so every unordered vector
    pair counts exactly once), labels broadcast as a small map, and a
    combiner groupby folds the ≤ |labels|² partial rows per task."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    refs_ref, tasks = _quantized_block_refs(sf_dir, n_blocks, scale)
    lab_t = collect_table(rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]))
    lab_ref = ray.put(dict(zip(lab_t.column("vec_id").to_pylist(),
                               (int(v) for v in
                                lab_t.column("label").to_pylist()))))

    def pair_fn(t: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        lab = ray.get(lab_ref)
        acc: dict[tuple[int, int], list[int]] = {}
        for i, j in zip(t["i"].to_pylist(), t["j"].to_pylist()):
            ids_i, q_i, n_i = ray.get(all_refs[i])
            ids_j, q_j, n_j = (ids_i, q_i, n_i) if j == i else \
                ray.get(all_refs[j])
            if not len(ids_i) or not len(ids_j):
                continue
            d2m = n_i[:, None] + n_j[None, :] - 2 * (q_i @ q_j.T)
            valid = (ids_i[:, None] < ids_j[None, :]) if j == i else \
                np.ones(d2m.shape, dtype=bool)
            la = np.array([lab[int(x)] for x in ids_i], dtype=np.int64)
            lb = np.array([lab[int(x)] for x in ids_j], dtype=np.int64)
            lmin = np.minimum(la[:, None], lb[None, :])
            lmax = np.maximum(la[:, None], lb[None, :])
            for p in np.unique(la.tolist() + lb.tolist()):
                for q in np.unique(la.tolist() + lb.tolist()):
                    if q < p:
                        continue
                    m = valid & (lmin == p) & (lmax == q)
                    cnt = int(m.sum())
                    if not cnt:
                        continue
                    s = acc.setdefault((int(p), int(q)), [0, 0])
                    s[0] += cnt
                    s[1] += int(d2m[m].sum())
        keys = sorted(acc)
        return pa.table({
            "label_a": pa.array([k[0] for k in keys], pa.int64()),
            "label_b": pa.array([k[1] for k in keys], pa.int64()),
            "n": pa.array([acc[k][0] for k in keys], pa.int64()),
            "s": pa.array([acc[k][1] for k in keys], pa.int64())})

    g = collect_table(partial_groupby(
        tasks.map_batches(pair_fn, batch_format="pyarrow", batch_size=4),
        ["label_a", "label_b"],
        {"n_pairs": ("n", "sum"), "sum_d2": ("s", "sum")}))
    empty = pa.table({"label_a": pa.array([], pa.int64()),
                      "label_b": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64()),
                      "sum_d2": pa.array([], pa.int64()),
                      "mean_d2": pa.array([], pa.int64())})
    if g.num_rows == 0 or "label_a" not in g.schema.names:
        return empty
    g = g.sort_by([("label_a", "ascending"), ("label_b", "ascending")])
    n = g.column("n_pairs").to_pylist()
    s = g.column("sum_d2").to_pylist()
    return pa.table({
        "label_a": g.column("label_a"),
        "label_b": g.column("label_b"),
        "n_pairs": pa.array(n, pa.int64()),
        "sum_d2": pa.array(s, pa.int64()),
        "mean_d2": pa.array([sv // nv if nv else 0
                             for nv, sv in zip(n, s)], pa.int64())})


def label_centroids(sf_dir: str, scale: int = 1024) -> pa.Table:
    """(label, dim, sum_q, n_vecs): the exact distributed vector
    aggregate — per label, the element-wise SUM of integer-quantized
    embedding components plus the vector count (callers divide for the
    centroid; integer sums keep the SQL twin hash-exact and are
    order-insensitive at any batch count). Per-batch numpy partials
    aggregate labels×dims BEFORE any exchange, so the combiner group-by
    moves O(labels · d) rows per batch, never O(rows · d)."""
    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        labels = np.array(t["label"].to_pylist(), dtype=np.int64)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(mat * float(scale)).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        k, d = len(uniq), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    k)),
            "sum_q": pa.array(sums.ravel()),
            "n_vecs": pa.array(np.repeat(counts, d))})

    out = partial_groupby(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], {"sum_q": ("sum_q", "sum"),
                           "n_vecs": ("n_vecs", "sum")})
    t = collect_table(out)
    return pa.table({
        "label": t["label"].cast(pa.int64()),
        "dim": t["dim"].cast(pa.int64()),
        "sum_q": t["sum_q"].cast(pa.int64()),
        "n_vecs": t["n_vecs"].cast(pa.int64()),
    }).sort_by([("label", "ascending"), ("dim", "ascending")])


def semantic_clusters(sf_dir: str, tau: int = 1_400_000,
                      n_blocks: int = 8, scale: int = 1024,
                      max_driver_pairs: int = 50_000) -> pa.Table:
    """(vec_id, cluster): connected components over the EXACT τ-close
    pair graph (same integer-quantized squared-L2 as ``knn_graph``) —
    semantic duplicate CLUSTERS rather than ``semantic_dedup``'s
    keep-first survivors; cluster label = component-minimum vec_id,
    τ-isolated vectors are their own singleton.

    Shape: block-pair tasks emit the τ-close (a < b) pairs (O(close
    pairs)); the same adaptive regime as ``graph.neardup_components``
    labels them (driver union-find below ``max_driver_pairs`` — a
    distributed barrier per round is absurd for a few thousand edges —
    else the distributed min-label ``connected_components``), and only
    the non-trivial component map broadcasts into the tag pass."""
    refs_ref, tasks = _quantized_block_refs(sf_dir, n_blocks, scale)

    def pair_fn(t: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        aa, bb = [], []
        for i, j in zip(t["i"].to_pylist(), t["j"].to_pylist()):
            ids_i, q_i, n_i = ray.get(all_refs[i])
            ids_j, q_j, n_j = (ids_i, q_i, n_i) if j == i else \
                ray.get(all_refs[j])
            if not len(ids_i) or not len(ids_j):
                continue
            d2m = n_i[:, None] + n_j[None, :] - 2 * (q_i @ q_j.T)
            xs, ys = np.where(d2m <= tau)
            ia, ib = ids_i[xs], ids_j[ys]
            keep = ia != ib
            ia, ib = ia[keep], ib[keep]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            if not len(lo):
                continue
            # in-block pairs appear (x,y) AND (y,x); dedup per task —
            # 2-column unique, safe at any vec_id magnitude
            u = np.unique(np.stack([lo, hi], axis=1), axis=0)
            aa.append(u[:, 0])
            bb.append(u[:, 1])
        if not aa:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(aa)),
                         "b": pa.array(np.concatenate(bb))})

    from raydoc.functions._collect import collect_table
    from raydoc.functions.graph import label_components
    pairs_ds = tasks.map_batches(pair_fn, batch_format="pyarrow",
                                 batch_size=1).materialize()
    lab = label_components(pairs_ds, max_driver_pairs=max_driver_pairs)
    lab_ref = ray.put(lab)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id"])

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(lab_ref)
        ids = t.column("vec_id").to_pylist()
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array([m.get(i, i) for i in ids],
                                             pa.int64())})

    return collect_table(
        emb.map_batches(tag, batch_format="pyarrow")).sort_by("vec_id")


def rrf_fusion(sf_dir: str, top_k: int = 20, k_rrf: int = 60) -> pa.Table:
    """(rank, doc_id, rrf): reciprocal-rank fusion of two retrieval
    channels — the BM25 lexical top-``top_k`` (textstats.bm25_search)
    and the exact cosine top-``top_k`` for query vector 0
    (brute_force_topk; vec_id ≡ doc_id in this corpus) — the hybrid
    lexical+dense retrieval composition behind RAG candidate
    generation. ``rrf = Σ 1/(k_rrf + rank)`` with each term ONE exact
    double division and the two channels summed in fixed order
    (lexical first), so the fused score hashes identically to the SQL
    twin. Docs absent from both channels are omitted; doc 0 can only
    enter via BM25 (the dense channel excludes self, both engines).

    Scale shape: both inner rankings are the already-distributed
    operators (corpus tokenize pass / per-batch matmul with pruned
    query read); the fusion itself touches ≤ 2·top_k rows on the
    driver."""
    from raydoc.functions.textstats import bm25_search

    lex = bm25_search(sf_dir, top_k=top_k)
    den = brute_force_topk(sf_dir, query_ids=[0], k=top_k)
    bm = dict(zip(lex.column("doc_id").to_pylist(),
                  lex.column("rank").to_pylist()))
    em = dict(zip(den.column("vec_id").to_pylist(),
                  den.column("rank").to_pylist()))
    ids = sorted(set(bm) | set(em))
    rrf = [(1.0 / np.float64(k_rrf + bm[d]) if d in bm else 0.0)
           + (1.0 / np.float64(k_rrf + em[d]) if d in em else 0.0)
           for d in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "rrf": pa.array(rrf, pa.float64())})
    t = t.sort_by([("rrf", "descending"), ("doc_id", "ascending")]) \
        .slice(0, top_k)
    return pa.table({"rank": pa.array(range(1, t.num_rows + 1), pa.int64()),
                     "doc_id": t.column("doc_id"),
                     "rrf": t.column("rrf")})


def mmr_diverse_topk(sf_dir: str, query_ids: list[int] | None = None,
                     k: int = 10, m: int = 100,
                     lam: float = 0.7) -> pa.Table:
    """(query_id, rank, vec_id, mmr_score, cosine): diversity-aware
    top-k via MAXIMAL MARGINAL RELEVANCE (Carbonell & Goldstein 1998) —
    pick argmax λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s), k times.
    The diversity-sampling primitive for training-data curation (plain
    top-k returns near-duplicates of one mode; MMR spreads the picks).

    Scale shape — candidate generation is the distributed part: the
    corpus streams through the same per-batch matmul + local-prune as
    ``brute_force_topk`` (top-``m`` per query leaves each block); the
    greedy re-rank is inherently sequential, so it runs on the driver
    over only the m×d candidate matrix (parquet predicate-pushdown
    read of candidate ids — the corpus never lands on the driver).
    Exact-MMR caveat (documented): an item outside the sim-top-``m``
    can in principle enter a full-corpus MMR; ``m ≫ k`` (default 10×)
    makes the prefilter regime standard practice. Ties break by
    ascending vec_id; output is deterministic."""
    query_ids = query_ids if query_ids is not None else [0]
    q_ids, q = _read_query_vectors(sf_dir, query_ids)
    ref = ray.put((q_ids, q))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cands = ds.map_batches(_batch_candidates(ref, m, True),
                           batch_format="pyarrow").to_pandas()
    out = {"query_id": [], "rank": [], "vec_id": [], "mmr_score": [],
           "cosine": []}
    for row, qid in enumerate(q_ids):
        sub = cands[cands["query_id"] == qid] \
            .sort_values(["cosine", "vec_id"], ascending=[False, True]) \
            .head(m)
        ids = sub["vec_id"].to_numpy()
        # _read_query_vectors returns ascending vec_id; work in that order
        ids_sorted, c = _read_query_vectors(
            sf_dir, sorted(int(v) for v in ids))
        rel = (q[row] @ c.T)                       # (m,) recomputed exact
        simmat = c @ c.T                           # (m, m) candidates only
        selected: list[int] = []
        free = np.ones(len(ids_sorted), dtype=bool)
        for r in range(min(k, len(ids_sorted))):
            if selected:
                redundancy = simmat[:, selected].max(axis=1)
            else:
                redundancy = np.zeros(len(ids_sorted))
            score = lam * rel - (1.0 - lam) * redundancy
            score[~free] = -np.inf
            # lowest index at the max = smallest vec_id on exact ties
            best = int(np.flatnonzero(score == score.max())[0])
            selected.append(best)
            free[best] = False
            out["query_id"].append(int(qid))
            out["rank"].append(r + 1)
            out["vec_id"].append(int(ids_sorted[best]))
            out["mmr_score"].append(float(score[best]))
            out["cosine"].append(float(rel[best]))
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "rank": pa.array(out["rank"], pa.int32()),
                     "vec_id": pa.array(out["vec_id"], pa.int64()),
                     "mmr_score": pa.array(out["mmr_score"], pa.float64()),
                     "cosine": pa.array(out["cosine"], pa.float64())})


def als_fit(sf_dir: str, rank: int = 2, iters: int = 4,
            reg: float = 0.1, num_buckets: int | None = None):
    """Distributed ALS matrix factorization over the implicit
    user × event_type interaction matrix (rating = ln(1+count)) — the
    factorization member of the distributed-ML family (k-means, PCA,
    logreg). Returns (item_types, item_factors (m×rank), rmse_history).

    Scale shape: the rating matrix reduces ONCE to per-(user, item)
    counts inside coarse user-hash buckets and materializes; every
    iteration then broadcasts the m×rank item-factor matrix (tiny),
    maps over the bucketed ratings with NO exchange — each bucket
    solves its users' rank×rank normal equations locally (user factors
    never leave the task) and emits one partial blob of per-item Gram
    sums (m·rank² + m·rank floats) plus an SSE partial — and the blobs
    tree-fold worker-side (the logreg/CMS fold discipline) so the
    driver solves m tiny systems per iteration regardless of corpus
    size. User factors are recomputable from the broadcast item
    factors, so nothing O(users) ever lands on the driver."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    nb = num_buckets or reduce_bucket_count()
    mask = nb - 1

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"user_id": t["user_id"],
                      "event_type": t["event_type"],
                      "n": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["user_id", "event_type", "n"])

    ratings = partial_groupby(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["user_id", "event_type"], {"n": ("n", "sum")})

    # item vocabulary: tiny (event types); fixed sorted order
    items = sorted(collect_table(
        ds.map_batches(
            lambda t: pa.table(
                {"event_type": pc.unique(t["event_type"])})
            if t.num_rows and "event_type" in t.schema.names
            else pa.table({"event_type": pa.array([], pa.string())}),
            batch_format="pyarrow")).column(
        "event_type").unique().to_pylist())
    m = len(items)
    item_idx = {it: i for i, it in enumerate(items)}

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "user_id": pa.array([], pa.int64()),
                             "item": pa.array([], pa.int32()),
                             "r": pa.array([], pa.float64())})
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()),
            "user_id": t["user_id"],
            "item": pa.array([item_idx[e] for e in
                              t["event_type"].to_pylist()], pa.int32()),
            "r": pc.ln(pc.add(pc.cast(t["n"], pa.float64()), 1.0))})

    rmat = ratings.map_batches(bucketize,
                               batch_format="pyarrow").materialize()

    # deterministic item-factor init from md5 of (item name, k)
    f = np.array([[int(hashlib.md5(f"{it}:{k}".encode()).hexdigest()[:8],
                       16) / 0xFFFFFFFF
                   for k in range(rank)] for it in items], np.float64)

    def fold(t: pa.Table) -> pa.Table:
        g = np.zeros(m * rank * rank + m * rank + 2, np.float64)
        for b in t.column("blob").to_pylist():
            g += np.frombuffer(b, np.float64)
        return pa.table({"blob": pa.array([g.tobytes()], pa.binary())})

    rmse_hist = []
    eye = np.eye(rank)
    for _ in range(iters):
        ref = ray.put(f)

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            fi = ray.get(ref)
            gram = np.zeros((m, rank, rank))
            rhs = np.zeros((m, rank))
            sse, cnt = 0.0, 0
            items_a = g["item"].to_numpy()
            r_a = g["r"].to_numpy()
            order = np.argsort(g["user_id"].to_numpy(), kind="stable")
            items_a, r_a = items_a[order], r_a[order]
            uids = g["user_id"].to_numpy()[order]
            starts = np.concatenate(
                ([0], np.nonzero(np.diff(uids))[0] + 1, [len(uids)]))
            for s, e in zip(starts[:-1], starts[1:]):
                obs, rv = items_a[s:e], r_a[s:e]
                fo = fi[obs]
                xu = np.linalg.solve(fo.T @ fo + reg * eye, fo.T @ rv)
                err = fo @ xu - rv
                sse += float(err @ err)
                cnt += len(rv)
                np.add.at(gram, obs, np.outer(xu, xu))
                np.add.at(rhs, obs, xu[None, :] * rv[:, None])
            blob = np.concatenate(
                [gram.ravel(), rhs.ravel(), [sse, float(cnt)]])
            return pd.DataFrame({"blob": [blob.tobytes()]})

        parts = rmat.groupby("bucket").map_groups(per_bucket,
                                                  batch_format="pandas")
        for _ in range(2):
            parts = parts.map_batches(fold, batch_format="pyarrow",
                                      batch_size=64)
        total = np.zeros(m * rank * rank + m * rank + 2, np.float64)
        for b in collect_table(parts).column("blob").to_pylist():
            total += np.frombuffer(b, np.float64)
        gram = total[:m * rank * rank].reshape(m, rank, rank)
        rhs = total[m * rank * rank:m * rank * rank + m * rank] \
            .reshape(m, rank)
        sse, cnt = total[-2], total[-1]
        rmse_hist.append(float(np.sqrt(sse / max(cnt, 1.0))))
        f = np.stack([np.linalg.solve(gram[i] + reg * eye, rhs[i])
                      for i in range(m)])
    return items, f, rmse_hist


def als_item_factors(sf_dir: str, rank: int = 2,
                     iters: int = 4) -> pa.Table:
    """(event_type, f0..f{rank-1}): the converged ALS item-factor
    matrix — rows-only (float training; determinism + rmse-decrease +
    local-equivalence property tests)."""
    items, f, _ = als_fit(sf_dir, rank=rank, iters=iters)
    cols = {"event_type": pa.array(items, pa.string())}
    for k in range(rank):
        cols[f"f{k}"] = pa.array(f[:, k], pa.float64())
    return pa.table(cols)


def ann_recall_report(sf_dir: str, k: int = 10) -> pa.Table:
    """(method, n_queries, k, hits, possible, recall_pct): the ANN
    quality dashboard — recall@k of every approximate index (LSH, IVF,
    PQ) against the exact brute-force top-k on the SAME queries. The
    number an embedding-retrieval pipeline alarms on when a re-trained
    index or a new corpus shard silently degrades candidate quality.
    Integer recall_pct = hits*100 // possible keeps the row exact.

    Rows-only (no SQL can run the index internals); the recall floors
    are pinned by the existing per-method property tests — this query
    turns them into a monitorable report."""
    truth = brute_force_topk(sf_dir, k=k).to_pandas()
    want: dict = {}
    for q, grp in truth.groupby("query_id"):
        want[q] = set(grp["vec_id"])
    methods = [("lsh", lsh_topk), ("ivf", ivf_topk), ("pq", pq_topk)]
    rows = []
    for name, fn in methods:
        got = fn(sf_dir, k=k).to_pandas()
        hits = 0
        for q, grp in got.groupby("query_id"):
            hits += len(set(grp["vec_id"]) & want.get(q, set()))
        possible = sum(len(v) for v in want.values())
        pct = hits * 100 // possible if possible else 0
        rows.append((name, len(want), k, hits, possible, pct))
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "n_queries": pa.array([r[1] for r in rows], pa.int64()),
        "k": pa.array([r[2] for r in rows], pa.int64()),
        "hits": pa.array([r[3] for r in rows], pa.int64()),
        "possible": pa.array([r[4] for r in rows], pa.int64()),
        "recall_pct": pa.array([r[5] for r in rows], pa.int64())})
