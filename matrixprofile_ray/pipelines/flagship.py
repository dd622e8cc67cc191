"""The flagship pipeline: pages → rollup tiers → gap-filled series →
Gorilla payloads → matrix profiles → discoveries.

Every stage is a lazy Dataset transform; nothing materializes the full
input. Execution topology per tier:

    read/generate pages
      └─ map_batches(partial_rollup)          stateless combiner, pyarrow
         └─ groupby(domain, bucket).aggregate  the ONE wide shuffle
            └─ map_batches(finalize)
               ├─ write buckets (tier=raw)
               ├─ cascade → 1h → 1d → 7d       partial+final, tiny inputs
               └─ groupby(domain).map_groups(SeriesAssembler)
                  ├─ map_batches(encode_series)    → series_gorilla sink
                  └─ map_batches(ProfileStage)     actor pool
                     └─ map_batches(DiscoveryStage) actor pool → discoveries

The cascade means the corpus is scanned ONCE; coarser tiers derive from the
finest rollup, not from pages.
"""

from __future__ import annotations

from matrixprofile_ray.stages.discovery import DiscoveryStage
from matrixprofile_ray.stages.encode import encode_series
from matrixprofile_ray.stages.gapfill import SeriesAssembler
from matrixprofile_ray.stages.profile import ProfileStage
from matrixprofile_ray.stages.rollup import TIERS, cascade_tier, rollup_tier

__all__ = ["bucket_tiers", "series_for_tier", "flagship"]

_CASCADE = ["raw", "1h", "1d", "7d"]


def bucket_tiers(pages_ds, tiers=("raw", "1h", "1d", "7d")) -> dict:
    """All requested tiers as Datasets; one corpus scan + cascaded rollups."""
    out = {}
    base = rollup_tier(pages_ds, "raw")
    if len(tiers) > 1:
        # the cascade re-reads the raw tier a few times; it is tiny compared
        # to pages, but pinning it avoids recomputing the wide shuffle
        base = base.materialize()
    out["raw"] = base
    prev = base
    for tier in _CASCADE[1:]:
        if tier not in tiers and all(
            t not in tiers for t in _CASCADE[_CASCADE.index(tier):]
        ):
            break
        nxt = cascade_tier(prev, tier)
        if tier in tiers:
            out[tier] = nxt
        prev = nxt.materialize() if tier != _CASCADE[-1] else nxt
    return {t: out[t] for t in tiers if t in out}


def series_for_tier(bucket_ds, tier: str, value_col: str = "count",
                    concurrency=None):
    """Bucket table → gap-filled dense series (one row per domain)."""
    assembler = SeriesAssembler(TIERS[tier], tier, value_col=value_col)

    def assemble_group(group):
        return assembler(group)

    return bucket_ds.groupby("domain").map_groups(
        assemble_group, batch_format="pandas"
    )


def flagship(
    pages_ds,
    window: int = 32,
    algorithm: str = "mpx",
    tiers=("raw", "1h", "1d", "7d"),
    out_dir: str | None = None,
    profile_concurrency: int = 8,
    materialize_series: bool = True,
):
    """Run the full pipeline; returns dict of result Datasets.

    When ``out_dir`` is set, buckets / series_gorilla / profiles /
    discoveries are also written as partitioned parquet (one directory per
    stage and tier — the resumable layout).
    """
    results = {"buckets": {}, "series": {}, "gorilla": {}, "profiles": {},
               "discoveries": {}}
    tier_tables = bucket_tiers(pages_ds, tiers=tiers)

    for tier, bucket_ds in tier_tables.items():
        results["buckets"][tier] = bucket_ds
        series = series_for_tier(bucket_ds, tier)
        if materialize_series:
            # one dense row per (domain, tier) — tiny relative to pages; at
            # 100 TB the equivalent is write_parquet + read of the series
            # table so downstream consumers never rescan the corpus
            series = series.materialize()
        results["series"][tier] = series
        results["gorilla"][tier] = series.map_batches(
            encode_series, batch_format="pandas"
        )
        profiles = series.map_batches(
            ProfileStage,
            fn_constructor_kwargs={"window": window, "algorithm": algorithm},
            batch_format="pandas",
            batch_size=4,  # heavy rows: small batches keep the pool balanced
            concurrency=profile_concurrency,
        )
        results["profiles"][tier] = profiles
        results["discoveries"][tier] = profiles.map_batches(
            DiscoveryStage,
            batch_format="pandas",
            batch_size=4,
            concurrency=profile_concurrency,
        )

    if out_dir:
        import os

        for stage in ("buckets", "discoveries"):
            for tier, ds in results[stage].items():
                path = os.path.join(out_dir, stage, f"tier={tier}")
                os.makedirs(path, exist_ok=True)
                ds.write_parquet(path)
    return results
