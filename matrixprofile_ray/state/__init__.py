from matrixprofile_ray.state.lineage import (
    LineageWriter,
    completed_partitions,
    filter_completed,
    lineage_record,
)

__all__ = [
    "LineageWriter",
    "completed_partitions",
    "filter_completed",
    "lineage_record",
]
