from matrixprofile_ray.sources.pages import (
    PAGES_SCHEMA,
    generate_pages,
    pages_dataset,
    pages_parquet,
)

__all__ = ["PAGES_SCHEMA", "generate_pages", "pages_dataset", "pages_parquet"]
