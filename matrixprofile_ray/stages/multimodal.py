"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque Arrow ``binary`` columns with typed metadata. The
Ray-side plumbing — schema, actor-pool stage shape, batch sizing, output
layout — is real and tested; the actual codecs are STUBBED because no
image/audio libraries exist in this environment:

- ``DecodeStage(fake=True)`` produces a deterministic fake decode (shape +
  checksum-seeded feature vector) so pipelines are testable end-to-end.
- ``DecodeStage(fake=False)`` raises ``NotImplementedError`` at decode
  time, marking exactly where a real libjpeg/ffmpeg hook plugs in.

Large payloads ⇒ small ``batch_size`` (a 4 MB image × 256-row batch would
blow a 1 GB heap); callers should pass ``batch_size≤32`` for real media.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "attach_fake_media", "DecodeStage", "frame_sample"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),          # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def attach_fake_media(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Deterministic fake media rows derived from a text table (test rig)."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    payloads = [t.encode() * 3 for t in texts]
    kinds = ["image" if i % 3 else "audio" for i in ids]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(
            ["image/jpeg" if k == "image" else "audio/wav" for k in kinds],
            pa.string(),
        ),
        "width": pa.array([64 if k == "image" else -1 for k in kinds], pa.int32()),
        "height": pa.array([64 if k == "image" else -1 for k in kinds], pa.int32()),
        "duration_ms": pa.array(
            [-1 if k == "image" else 1000 for k in kinds], pa.int32()
        ),
    })


class DecodeStage:
    """Actor-pool decode / feature-extract over binary media columns.

    Stateful setup (a real impl loads codec contexts / models here) runs
    once per actor; ``__call__`` handles one small batch of payloads.
    Output: media_id, kind, n_bytes, feature (list<float>, dim ``dim``).
    """

    def __init__(self, dim: int = 16, fake: bool = True):
        self.dim = dim
        self.fake = fake
        # a real implementation would do: self.codec = load_codec(...)

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires an image/audio library; "
                "this environment ships none — plug libjpeg/ffmpeg here"
            )
        # deterministic fake: feature vector seeded by payload checksum
        seed = zlib.crc32(payload)
        rng = np.random.default_rng(seed)
        return rng.normal(size=self.dim)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [
            np.round(self._decode(p, k), 6)
            for p, k in zip(batch["payload"], batch["kind"])
        ]
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "kind": batch["kind"].to_numpy(),
            "n_bytes": np.array([len(p) for p in batch["payload"]], dtype=np.int64),
            "feature": feats,
        })


def frame_sample(batch: pd.DataFrame, every_ms: int = 250) -> pd.DataFrame:
    """Video rows → one output row per sampled frame timestamp (flat_map
    shape). Frame payload decode is stubbed; the row explosion + metadata
    math is the real plumbing."""
    dur = batch["duration_ms"].to_numpy()
    media = batch["media_id"].to_numpy()
    counts = np.where(dur > 0, -(-dur // every_ms), 0).astype(np.int64)
    frame_idx = np.concatenate(
        [np.arange(c) for c in counts]
    ) if counts.sum() else np.empty(0, dtype=np.int64)
    return pd.DataFrame({
        "media_id": np.repeat(media, counts),
        "frame_ts_ms": frame_idx * every_ms,
        "frame_idx": frame_idx,
    })
