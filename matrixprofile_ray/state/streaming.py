"""Streaming per-key matrix-profile maintenance (STAMPI as an engine stage).

Ray Data's map_batches cannot guarantee that successive micro-batches of the
same KEY reach the same worker, and STAMPI state is inherently a shared
mutable index per key — this is the one place the engine drops to raw Ray
actors (allowed as last resort per the design brief; everything batch-shaped
stays in Dataset pipelines).

Topology: ``StreamingProfiler`` owns N ``_ProfileShard`` actors; every
update() hash-routes its rows by key (same crc32-based routing as the
resumable runner's shards, deterministic across runs) and appends values
IN TIMESTAMP ORDER to each key's incremental STAMPI state
(core/stampi.py — exact: equals a batch recompute of the concatenated
series, see tests). snapshot() returns current profiles.

Scale notes: state per key is O(series length); shard count spreads keys
across the cluster; routing is a driver-side split of each micro-batch
(one ray.remote call per shard per batch — batch-sized, not row-sized).
Late/out-of-order data WITHIN a micro-batch is sorted before appending;
across micro-batches the caller owns ordering (the rollup path's
late-data answer is tier re-run via lineage, pipelines/runner.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

__all__ = ["StreamingProfiler"]


def _make_shard_cls():
    import ray

    @ray.remote(num_cpus=1)
    class _ProfileShard:
        def __init__(self, window: int):
            import matrixprofile_ray.core as core

            self._core = core
            self.window = window
            self.states: dict = {}
            self.counts: dict = {}

        def update(self, keys, values) -> int:
            core = self._core
            df = pd.DataFrame({"k": keys, "v": values})
            for k, g in df.groupby("k", sort=False):
                vals = g["v"].to_numpy(dtype="d")
                state = self.states.get(k)
                if state is None:
                    state = core.stampi_init(vals, self.window)
                else:
                    for x in vals:
                        state = core.stampi_append(state, x)
                self.states[k] = state
                self.counts[k] = self.counts.get(k, 0) + len(vals)
            return len(df)

        def snapshot(self) -> list[dict]:
            out = []
            for k, state in self.states.items():
                out.append({
                    "key": k,
                    "n": int(len(state["ts"])),
                    "w": self.window,
                    "mp": np.asarray(state["mp"], dtype="d"),
                    "pi": np.asarray(state["pi"], dtype=np.int64),
                })
            return out

    return _ProfileShard


class StreamingProfiler:
    """Sharded incremental matrix profiles over a keyed value stream."""

    def __init__(self, window: int, num_shards: int = 4):
        shard_cls = _make_shard_cls()
        self.window = window
        self.num_shards = num_shards
        self.shards = [shard_cls.remote(window) for _ in range(num_shards)]

    def _route(self, key) -> int:
        return zlib.crc32(str(key).encode()) % self.num_shards

    def update(self, batch: pd.DataFrame, key_col: str = "key",
               value_col: str = "value", ts_col: str | None = None) -> int:
        """Append one micro-batch; rows sorted by ts within the batch."""
        if ts_col is not None:
            batch = batch.sort_values(ts_col, kind="stable")
        keys = batch[key_col].to_numpy()
        vals = batch[value_col].to_numpy(dtype="d")
        shard_of = np.array([self._route(k) for k in keys])
        import ray

        refs = []
        for s in range(self.num_shards):
            mask = shard_of == s
            if mask.any():
                refs.append(self.shards[s].update.remote(
                    keys[mask].tolist(), vals[mask]
                ))
        return int(sum(ray.get(refs)))

    def snapshot(self) -> pd.DataFrame:
        """Current profiles for every key (small: one row per key)."""
        import ray

        rows = [r for part in ray.get(
            [s.snapshot.remote() for s in self.shards]
        ) for r in part]
        return pd.DataFrame(rows)

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)
        self.shards = []
