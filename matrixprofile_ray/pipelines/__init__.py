from matrixprofile_ray.pipelines.flagship import (
    bucket_tiers,
    flagship,
    series_for_tier,
)

__all__ = ["bucket_tiers", "flagship", "series_for_tier"]
