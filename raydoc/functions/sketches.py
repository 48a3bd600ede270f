"""Distinct-count: exact (oracle-checkable) and HyperLogLog sketch.

The sketch is the scale path for cardinality over 10¹²-row tables: each
batch folds its values into a fixed 2^p-register numpy array (a partial
aggregate a few KB in size), register arrays merge with elementwise max
(associative + commutative ⇒ combiner-friendly, any shuffle topology), and
the final estimate runs on the driver. No row ever leaves its batch.

HLL per Flajolet et al. 2007: register j = max leading-zero rank of the
hashed suffix; estimate = α·m²/Σ2^(−M[j]) with the standard small-range
(linear counting) correction. p=12 ⇒ ~1.6% typical error.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

P = 12
M = 1 << P                     # 4096 registers
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values: list) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in values), dtype=np.uint64, count=len(values))


def hll_partial(values: list) -> np.ndarray:
    """Fold a batch of values into a fresh 2^p register array."""
    regs = np.zeros(M, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    suffix = h << np.uint64(P)  # drop the index bits (wraps, fine)
    # rank = leading zeros of the 64-bit suffix + 1 (s==0 ⇒ 64-P+1),
    # vectorized binary-search clz (float log2 would mis-round near powers
    # of two for 64-bit values)
    ranks = _clz64(suffix) + np.uint8(1)
    ranks[suffix == 0] = 64 - P + 1
    np.maximum.at(regs, idx, ranks)
    return regs


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 maps to 64)."""
    zero = x == 0
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        x[m] <<= np.uint64(s)
    n[zero] = 64
    return n


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)     # linear counting small-range fix
    return float(est)


def distinct_users_exact(sf_dir: str) -> pa.Table:
    """Exact COUNT(DISTINCT user_id) via per-batch set partials → driver
    union (distinct values ≪ rows; SQL-oracle-checkable)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = pc.unique(t.column("user_id"))
        return pa.table({"user_id": u})

    from raydoc.functions._collect import collect_table
    t = collect_table(ds.map_batches(partial, batch_format="pyarrow"))
    n = len(set(t.column("user_id").to_pylist()))
    return pa.table({"n_users": pa.array([n], pa.int64())})


def distinct_users_hll(sf_dir: str) -> pa.Table:
    """HLL sketch of distinct user_id: per-batch register partials shuffle
    as 4 KB blobs, merged by max — the 10¹²-row cardinality path."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(t.column("user_id").to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(M, dtype=np.uint8)
    for blob in parts["regs"]:
        regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
    return pa.table({"n_users_estimate": pa.array([round(hll_estimate(regs))],
                                                  pa.int64())})
