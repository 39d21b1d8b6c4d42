"""Cluster-aware runtime sizing helpers.

Actor-pool stages must scale with the cluster, not a hard-coded cap —
a ``concurrency=(1, 4)`` pool starves 28 of 32 cores locally and
whole nodes on a real cluster.  ``pool_size()`` reads the connected
cluster's CPU count (works identically under ``ray.init(num_cpus=N)``
locally and on a multi-node cluster where resources sum over nodes).
"""

from __future__ import annotations


def pool_size(min_actors: int | None = None, cpus_per_actor: float = 1.0) -> tuple[int, int]:
    """(min, max) autoscaling bounds for ``map_batches(Cls, concurrency=...)``.

    The default FLOOR is cpus/8 (≥2): Ray's autoscaler ramps from the
    minimum one actor at a time, which dominates the wall time of
    second-scale stages (measured ~2× on a 10 s decode).  Stages that
    know their work-set size up front should pass an explicit floor of
    ``min(n_items, cpus)`` instead.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if min_actors is None:
        min_actors = max(2, cpus // 8)
    return (min_actors, max(8, int(cpus / max(cpus_per_actor, 0.0625))))
