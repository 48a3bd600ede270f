"""Cluster-size-derived shuffle bucket counts.

Round-1 hard-coded ``user_id & 63`` capped reduce parallelism at 64 tasks
regardless of cluster size. Coarse-bucket reduces now size their bucket
count from the cluster: ``max(floor, factor × CPUs)`` rounded up to a power
of two (so Arrow-side bucketing can stay a ``bit_wise_and``). Bucket count
never changes results — only the shuffle granularity (verified by the
equality-at-two-bucket-counts test).
"""

from __future__ import annotations


def reduce_bucket_count(factor: int = 4, floor: int = 64,
                        cap: int = 4096) -> int:
    """Power-of-two bucket count ≈ ``factor`` × cluster CPUs (≥ floor)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n = max(floor, factor * cpus)
    p = 1
    while p < n:
        p <<= 1
    return min(p, cap)
