from matrixprofile_ray.sources.datasets import (
    fetch_available,
    get_csv_indices,
    load,
    to_series_dataset,
)
from matrixprofile_ray.sources.pages import (
    PAGES_SCHEMA,
    generate_pages,
    pages_dataset,
    pages_parquet,
)

__all__ = [
    "PAGES_SCHEMA",
    "generate_pages",
    "pages_dataset",
    "pages_parquet",
    "fetch_available",
    "get_csv_indices",
    "load",
    "to_series_dataset",
]
