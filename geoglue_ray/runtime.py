"""Session-aware resource sizing helpers."""

from __future__ import annotations


def pool_size(requested: int, reserve: int = 1) -> int:
    """Clamp a fixed actor-pool size to the session's CPU budget.

    A fixed pool larger than the cluster's CPUs never finishes scheduling
    (observed deadlock in a 4-CPU test session asking for 8 actors);
    ``reserve`` keeps headroom for shuffle/reduce tasks.
    """
    import ray

    if not ray.is_initialized():
        return requested
    total = int(ray.cluster_resources().get("CPU", requested))
    return max(1, min(requested, total - reserve))
