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

    def _domain_rows(self, domain, group: pd.DataFrame) -> list[dict]:
        from matrixprofile_ray.stages.gapfill import assemble_series_row

        # merge the raw partials (multiple rows per bucket across batches)
        raw = (
            group.groupby("bucket_ts", sort=True)
            .agg(_AGGS)
            .reset_index()
        )
        rows = []
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
            rows.append(assemble_series_row(
                domain,
                buckets["bucket_ts"].to_numpy(dtype=np.int64),
                buckets[self.value_col].to_numpy(dtype=np.float64),
                TIERS[tier],
                tier,
                add_noise=self.add_noise,
                max_buckets=self.max_buckets,
            ))
        return rows

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        rows = self._domain_rows(group["domain"].iloc[0], group)
        if not rows:
            return pd.DataFrame()
        return pd.DataFrame(rows)

    def process_partition(self, part: pd.DataFrame) -> pd.DataFrame:
        """All domains of one hash partition in ONE call (see
        util.partitioned_group_map): avoids Ray's per-group overhead and
        builds a single output frame per partition instead of one-row
        frames per (domain, tier)."""
        rows: list[dict] = []
        for domain, group in part.groupby("domain", sort=False):
            rows.extend(self._domain_rows(domain, group))
        if not rows:
            return pd.DataFrame({
                "domain": pd.Series(dtype="object"),
                "tier": pd.Series(dtype="object"),
                "start_ts": pd.Series(dtype="int64"),
                "bucket_us": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "n_gaps": pd.Series(dtype="int64"),
                "truncated": pd.Series(dtype="bool"),
                "values": pd.Series(dtype="object"),
            })
        return pd.DataFrame(rows)
