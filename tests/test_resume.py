"""Checkpoint-resume: a killed run resumes by skipping completed shards and
produces identical outputs to an uninterrupted run."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from matrixprofile_ray.pipelines.runner import run_resumable, shard_of
from matrixprofile_ray.sources.pages import pages_dataset
from matrixprofile_ray.state.lineage import (
    LineageWriter,
    completed_partitions,
    filter_completed,
)

N_PAGES = 3000
SHARDS = 4


def _discoveries(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "discoveries", "**", "*.parquet"),
                             recursive=True))
    import pyarrow.parquet as pq

    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return df.sort_values(["domain", "tier", "kind", "rank"]).reset_index(drop=True)


class TestLineage:
    def test_filter_completed(self, tmp_path):
        w = LineageWriter(str(tmp_path))
        w.write({"partition_id": "3", "stage": "s", "input_rows": 1,
                 "output_rows": 1, "wall_s": 0.1, "checkpoint_epoch": 0,
                 "status": "done", "ts": 0})
        assert completed_partitions(str(tmp_path), "s") == {"3"}
        assert filter_completed(["1", "3", "5"], str(tmp_path), "s") == ["1", "5"]

    def test_atomic_publish(self, tmp_path):
        w = LineageWriter(str(tmp_path))
        w.write({"partition_id": "x", "stage": "s", "input_rows": 0,
                 "output_rows": 0, "wall_s": 0, "checkpoint_epoch": 0,
                 "status": "done", "ts": 0})
        # no tmp leftovers
        assert not [f for f in os.listdir(w.dir) if f.startswith(".")]


class TestResume:
    def test_kill_and_resume_identical(self, ray_session, tmp_path):
        base = str(tmp_path / "full")
        # uninterrupted reference run
        run_resumable(pages_dataset(N_PAGES), base, tiers=("1d",),
                      window=8, shards=SHARDS, profile_concurrency=2)
        want = _discoveries(base)
        assert len(want) > 0

        # interrupted run: simulate a crash after 2 shards by deleting their
        # outputs + lineage
        crashed = str(tmp_path / "crashed")
        run_resumable(pages_dataset(N_PAGES), crashed, tiers=("1d",),
                      window=8, shards=SHARDS, profile_concurrency=2)
        for k in (2, 3):
            for stage in ("discoveries", "profiles", "gorilla"):
                shutil.rmtree(os.path.join(crashed, stage, f"shard={k}"),
                              ignore_errors=True)
            rec = os.path.join(crashed, "_lineage", f"discoveries-{k}.json")
            if os.path.exists(rec):
                os.remove(rec)

        # resume: must only re-run the two missing shards
        written = run_resumable(pages_dataset(N_PAGES), crashed, tiers=("1d",),
                                window=8, shards=SHARDS, profile_concurrency=2)
        redone = {r["partition_id"] for r in written}
        assert redone <= {"2", "3"}
        got = _discoveries(crashed)
        pd.testing.assert_frame_equal(
            got.drop(columns=["neighbors"]), want.drop(columns=["neighbors"])
        )
        for a, b in zip(got["neighbors"], want["neighbors"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dirty_crash_mid_write_no_duplication(self, ray_session, tmp_path):
        """A kill MID-WRITE leaves partial parquet files WITHOUT a lineage
        record; Ray's write_parquet appends by default, so resume must wipe
        the stale partials before re-running (advisor round 1: the
        clean-crash-only test missed row duplication on resume)."""
        base = str(tmp_path / "full")
        run_resumable(pages_dataset(N_PAGES), base, tiers=("1d",),
                      window=8, shards=SHARDS, profile_concurrency=2)
        want = _discoveries(base)

        crashed = str(tmp_path / "dirty")
        run_resumable(pages_dataset(N_PAGES), crashed, tiers=("1d",),
                      window=8, shards=SHARDS, profile_concurrency=2)
        # simulate mid-write kill of shard 1: lineage record gone, but the
        # parquet output files SURVIVE (partial write)
        os.remove(os.path.join(crashed, "_lineage", "discoveries-1.json"))

        written = run_resumable(pages_dataset(N_PAGES), crashed, tiers=("1d",),
                                window=8, shards=SHARDS, profile_concurrency=2)
        assert {r["partition_id"] for r in written} == {"1"}
        got = _discoveries(crashed)
        # duplicated rows would fail the frame comparison
        pd.testing.assert_frame_equal(
            got.drop(columns=["neighbors"]), want.drop(columns=["neighbors"])
        )

    def test_shard_deterministic(self):
        assert shard_of("domain0001.example", 16) == shard_of(
            "domain0001.example", 16
        )
        # all shards used for the synthetic domain universe
        shards = {shard_of(f"domain{i:04d}.example", 8) for i in range(200)}
        assert shards == set(range(8))
