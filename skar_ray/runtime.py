"""Cluster-aware runtime sizing helpers.

Actor-pool stages must scale with the cluster, not a hard-coded cap —
a ``concurrency=(1, 4)`` pool starves 28 of 32 cores locally and
whole nodes on a real cluster.  ``pool_size()`` reads the connected
cluster's CPU count (works identically under ``ray.init(num_cpus=N)``
locally and on a multi-node cluster where resources sum over nodes).
"""

from __future__ import annotations


def pool_size(min_actors: int = 1, cpus_per_actor: float = 1.0) -> tuple[int, int]:
    """(min, max) autoscaling bounds for ``map_batches(Cls, concurrency=...)``."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (min_actors, max(8, int(cpus / max(cpus_per_actor, 0.0625))))
