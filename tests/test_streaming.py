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
