"""Gorilla encode/decode stages for the series tables.

Stateless ``map_batches`` transforms: each series row's values become a
Gorilla XOR payload and its (implicit, dense) timestamps a delta-of-delta
payload. Dense grids delta-of-delta to ~0 bits/point; constant/slow-moving
rollup values XOR-compress heavily. Round-trip is bit-exact (FIXTURES F5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from matrixprofile_ray.core.gorilla import (
    gorilla_decode_floats,
    gorilla_encode_floats,
    timestamps_decode,
    timestamps_encode,
)

__all__ = ["encode_series", "decode_series"]


def encode_series(batch: pd.DataFrame, key_col: str = "domain") -> pd.DataFrame:
    """series rows → series_gorilla rows (binary payload columns)."""
    values_enc, ts_enc, raw_bytes, enc_bytes = [], [], [], []
    for i in range(len(batch)):
        values = np.asarray(batch["values"].iloc[i], dtype="d")
        start = int(batch["start_ts"].iloc[i])
        step = int(batch["bucket_us"].iloc[i])
        ts = start + step * np.arange(len(values), dtype=np.int64)
        v = gorilla_encode_floats(values)
        t = timestamps_encode(ts)
        values_enc.append(v)
        ts_enc.append(t)
        raw_bytes.append(16 * len(values))
        enc_bytes.append(len(v) + len(t))
    return pd.DataFrame(
        {
            key_col: batch[key_col],
            "tier": batch["tier"],
            "start_ts": batch["start_ts"],
            "bucket_us": batch["bucket_us"],
            "n": batch["n"],
            "values_xor": values_enc,
            "ts_dod": ts_enc,
            "raw_bytes": raw_bytes,
            "enc_bytes": enc_bytes,
        }
    )


def decode_series(batch: pd.DataFrame, key_col: str = "domain") -> pd.DataFrame:
    """series_gorilla rows → series rows (values/ts lists restored)."""
    out_values, out_ts = [], []
    for i in range(len(batch)):
        out_values.append(gorilla_decode_floats(batch["values_xor"].iloc[i]))
        out_ts.append(timestamps_decode(batch["ts_dod"].iloc[i]))
    return pd.DataFrame(
        {
            key_col: batch[key_col],
            "tier": batch["tier"],
            "start_ts": batch["start_ts"],
            "bucket_us": batch["bucket_us"],
            "n": batch["n"],
            "values": out_values,
            "ts": out_ts,
        }
    )
