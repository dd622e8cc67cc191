"""Lineage + checkpoint-resume for partition-scoped parquet outputs.

North-rule requirement: every partition emits lineage + metrics records so
a killed job resumes by skipping finished partitions. Layout:

    <out>/<stage>/tier=<tier>/           one parquet dir per (stage, tier)
    <out>/_lineage/<stage>-<partition_id>.json   one record per partition

The resume path is the reference's PMP-reuse pattern (skimp.py:195-206)
generalized: an anti-join of requested partition ids against completed
lineage records, done driver-side on the (tiny) id set and pushed into the
read as a filter — no shuffle.
"""

from __future__ import annotations

import json
import os
import time

__all__ = [
    "lineage_record",
    "LineageWriter",
    "completed_partitions",
    "filter_completed",
]


def lineage_record(
    partition_id: str,
    stage: str,
    input_rows: int,
    output_rows: int,
    wall_s: float,
    status: str = "done",
    epoch: int = 0,
) -> dict:
    return {
        "partition_id": partition_id,
        "stage": stage,
        "input_rows": int(input_rows),
        "output_rows": int(output_rows),
        "wall_s": float(wall_s),
        "checkpoint_epoch": int(epoch),
        "status": status,
        "ts": time.time(),
    }


class LineageWriter:
    """Writes one JSON lineage record per completed (stage, partition)."""

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def write(self, record: dict) -> None:
        name = f"{record['stage']}-{record['partition_id']}.json"
        tmp = os.path.join(self.dir, "." + name + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(record, fh)
        os.replace(tmp, os.path.join(self.dir, name))  # atomic publish

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as fh:
                    out.append(json.load(fh))
        return out


def completed_partitions(out_dir: str, stage: str) -> set[str]:
    writer = LineageWriter(out_dir)
    return {
        r["partition_id"]
        for r in writer.records()
        if r["stage"] == stage and r["status"] == "done"
    }


def filter_completed(partition_ids: list[str], out_dir: str, stage: str) -> list[str]:
    """Anti-join requested partitions against completed lineage records."""
    done = completed_partitions(out_dir, stage)
    return [p for p in partition_ids if p not in done]
