"""Engine-wide Ray Data context defaults."""

from __future__ import annotations

import os

__all__ = ["ensure_hash_shuffle"]


def _cluster_cpus() -> int | None:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or (
                os.cpu_count() or 8
            )
    except Exception:
        pass
    return None  # unknown until ray.init — do not guess


def ensure_hash_shuffle() -> None:
    """Switch the current DataContext to hash-based shuffling, sized to the
    cluster.

    Our wide operations are all key-based groupbys (domain, (band, bucket),
    content hash); none needs a global sort. Ray's default sort-based
    shuffle costs tens of seconds of fixed latency per exchange at any
    cluster size. The stock hash-shuffle defaults assume a big cluster
    (200 partitions / up to 64 aggregator actors) and strangle small CPU
    counts — size both to the actual cluster so aggregators never crowd
    out the compute actor pools. Safe to call repeatedly and before
    ray.init(); silently a no-op on Ray versions without the strategy.
    """
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        cpus = _cluster_cpus()
        if cpus is None or cpus < 8:
            # cluster size unknown (pre-init) or tiny: stay on the default
            # sort shuffle — mis-sized hash aggregators can deadlock, and
            # on <8 CPUs the aggregator actors contend with compute pools
            return
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
        ctx.default_hash_shuffle_parallelism = max(16, cpus * 2)
        # aggregator actors must not reserve whole CPUs away from the
        # profile/discovery pools
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
    except Exception:
        pass
