"""Tumbling-window rollup into retention tiers (raw/1h/1d/7d).

The shuffle-minimizing shape (ray_guide "Aggregation at scale"):

1. ``partial_rollup`` — inside ``map_batches`` (pyarrow, zero-copy): project
   domain + bucket, then a *within-batch* Arrow ``group_by`` producing one
   partial row per (domain, bucket) per batch. This collapses the corpus by
   orders of magnitude before anything moves.
2. ``Dataset.groupby(['domain','bucket_ts']).aggregate(Sum/Min/Max)`` over
   the partials — the only all-to-all exchange, over pre-shrunk rows.
3. ``finalize_rollup`` — derive mean/std from the merged moments.

Tier cascade: 1d is rolled up from the 1h table, 7d from 1d (partial+final
again, cheap) — the "continuous aggregate" pattern; counts and moments stay
exact because we carry sum/sum_sq/min/max/count, never averages.

Reference parity: the per-bucket stats match reference
algorithms/statistics.py:15-90 global stats per bucket; numerically checked
against DuckDB in the driver's oracle gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from matrixprofile_ray.stages.extract import add_domain

__all__ = [
    "TIERS",
    "partial_rollup",
    "merge_rollup_partials",
    "finalize_rollup",
    "rollup_tier",
    "cascade_partial",
]

# tier → bucket width in microseconds; "raw" is the finest persisted grain
TIERS = {
    "raw": 300_000_000,  # 5 min
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
    "7d": 604_800_000_000,
}

_PARTIAL_COLS = ["count", "bytes", "sum_len", "sum_sq_len", "min_len", "max_len"]


def partial_rollup(batch: pa.Table, bucket_us: int) -> pa.Table:
    """Per-batch combiner: one partial row per (domain, bucket) in the batch."""
    batch = add_domain(batch)
    ts = pc.cast(batch["warc_ts"], pa.int64())
    bucket = pc.multiply(pc.divide(ts, bucket_us), bucket_us)
    length = pc.cast(pc.utf8_length(batch["text"]), pa.float64())
    tbl = pa.table(
        {
            "domain": batch["domain"],
            "bucket_ts": bucket,
            "nbytes": pc.cast(pc.binary_length(batch["html"]), pa.int64()),
            "len": length,
            "len_sq": pc.multiply(length, length),
        }
    )
    agg = tbl.group_by(["domain", "bucket_ts"]).aggregate(
        [
            ("len", "count"),
            ("nbytes", "sum"),
            ("len", "sum"),
            ("len_sq", "sum"),
            ("len", "min"),
            ("len", "max"),
        ]
    )
    return agg.rename_columns(["domain", "bucket_ts"] + _PARTIAL_COLS)


def merge_rollup_partials(partials_ds):
    """Merge partial rows per (domain, bucket): one partition-cardinality
    shuffle + a pandas fold per partition (Ray's built-in Sum/Min/Max
    aggregate is ~3× slower and pays per-group overhead at corpus-scale
    domain counts)."""
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    def fold(part: "pd.DataFrame") -> "pd.DataFrame":
        return part.groupby(["domain", "bucket_ts"], as_index=False).agg(
            count=("count", "sum"),
            bytes=("bytes", "sum"),
            sum_len=("sum_len", "sum"),
            sum_sq_len=("sum_sq_len", "sum"),
            min_len=("min_len", "min"),
            max_len=("max_len", "max"),
        )

    return partitioned_group_map(partials_ds, ["domain", "bucket_ts"], fold)


def finalize_rollup(batch: pa.Table, tier: str) -> pa.Table:
    """Derive mean/std from merged moments and tag the tier."""
    count = np.asarray(batch["count"], dtype="d")
    s = np.asarray(batch["sum_len"], dtype="d")
    s2 = np.asarray(batch["sum_sq_len"], dtype="d")
    mean = s / count
    var = np.maximum(s2 / count - mean * mean, 0.0)
    out = batch.append_column("mean_len", pa.array(mean, pa.float64()))
    out = out.append_column("std_len", pa.array(np.sqrt(var), pa.float64()))
    out = out.append_column("tier", pa.array([tier] * batch.num_rows, pa.string()))
    return out


def cascade_partial(batch: pa.Table, bucket_us: int) -> pa.Table:
    """Re-bucket an already-rolled-up tier to a coarser one (within-batch)."""
    bucket = pc.multiply(pc.divide(batch["bucket_ts"], bucket_us), bucket_us)
    tbl = batch.select(["domain"] + _PARTIAL_COLS).add_column(
        1, "bucket_ts", bucket
    )
    agg = tbl.group_by(["domain", "bucket_ts"]).aggregate(
        [
            ("count", "sum"),
            ("bytes", "sum"),
            ("sum_len", "sum"),
            ("sum_sq_len", "sum"),
            ("min_len", "min"),
            ("max_len", "max"),
        ]
    )
    return agg.rename_columns(["domain", "bucket_ts"] + _PARTIAL_COLS)


def rollup_tier(pages_ds, tier: str):
    """pages Dataset → finalized bucket table for one tier."""
    bucket_us = TIERS[tier]
    partials = pages_ds.map_batches(
        lambda b: partial_rollup(b, bucket_us),
        batch_format="pyarrow",
    )
    merged = merge_rollup_partials(partials)
    return merged.map_batches(
        lambda b: finalize_rollup(b, tier), batch_format="pyarrow"
    )


def cascade_tier(bucket_ds, tier: str):
    """Finer bucket table → coarser tier (partial + final + finalize)."""
    bucket_us = TIERS[tier]
    partials = bucket_ds.map_batches(
        lambda b: cascade_partial(b, bucket_us),
        batch_format="pyarrow",
    )
    merged = merge_rollup_partials(partials)
    return merged.map_batches(
        lambda b: finalize_rollup(b, tier), batch_format="pyarrow"
    )
