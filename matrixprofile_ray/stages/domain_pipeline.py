"""Fused per-domain pipeline: ONE shuffle for all retention tiers.

The naive topology (groupby per tier + groupby per series assembly) costs
8 all-to-all exchanges; Ray's aggregate has seconds of fixed latency each.
This stage does it with ONE:

    pages → map_batches(partial_rollup raw)     in-batch combine
          → groupby(domain).map_groups(DomainPipeline)   THE shuffle
          → series rows for every tier (raw/1h/1d/7d)

Inside one domain group everything is trivial pandas/numpy: merge raw
partials, cascade coarser tiers by integer re-bucketing (continuous
aggregates — exact, moments carried), gap-fill each tier, emit one dense
series row per (domain, tier).

Partitioning assumptions (documented per north rule):
- one domain's RAW bucket partials fit in a worker heap — bounded by
  span/5min rows (~16k/56d), NOT by page count, thanks to the in-batch
  partial combine;
- heavy-tailed domains are therefore NOT a skew problem for this stage
  (the combiner equalizes), only for the combiner's groupby input, which
  Ray hash-partitions on (domain, bucket) — already salted by bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from matrixprofile_ray.stages.gapfill import DEFAULT_MAX_BUCKETS, assemble_series
from matrixprofile_ray.stages.rollup import TIERS

__all__ = ["DomainPipeline"]

_AGGS = {
    "count": "sum",
    "bytes": "sum",
    "sum_len": "sum",
    "sum_sq_len": "sum",
    "min_len": "min",
    "max_len": "max",
}


class DomainPipeline:
    """map_groups callable: raw partial rows of ONE domain → series rows
    for every requested tier."""

    def __init__(
        self,
        tiers=("raw", "1h", "1d", "7d"),
        value_col: str = "count",
        add_noise: bool = True,
        max_buckets: int = DEFAULT_MAX_BUCKETS,
    ):
        self.tiers = tuple(tiers)
        self.value_col = value_col
        self.add_noise = add_noise
        self.max_buckets = max_buckets

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        domain = group["domain"].iloc[0]
        # merge the raw partials (multiple rows per bucket across batches)
        raw = (
            group.groupby("bucket_ts", sort=True)
            .agg(_AGGS)
            .reset_index()
        )
        out = []
        prev_tier, prev = "raw", raw
        for tier in ("raw", "1h", "1d", "7d"):
            if TIERS[tier] < TIERS[prev_tier]:
                continue
            if tier == prev_tier:
                buckets = prev
            else:
                rb = prev.copy()
                rb["bucket_ts"] = (
                    rb["bucket_ts"] // TIERS[tier]
                ) * TIERS[tier]
                buckets = (
                    rb.groupby("bucket_ts", sort=True).agg(_AGGS).reset_index()
                )
                prev_tier, prev = tier, buckets
            if tier not in self.tiers:
                continue
            g = buckets.copy()
            g["domain"] = domain
            out.append(
                assemble_series(
                    g,
                    TIERS[tier],
                    tier,
                    value_col=self.value_col,
                    add_noise=self.add_noise,
                    max_buckets=self.max_buckets,
                )
            )
        if not out:
            return pd.DataFrame()
        return pd.concat(out, ignore_index=True)
