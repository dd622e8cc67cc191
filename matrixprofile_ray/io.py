"""Profile serialization: JSON round-trips + disk helpers.

Parity target: reference io/__io.py:57-246 (to_json/from_json,
to_disk/from_disk with extension inference). Three formats: json
(single-profile interchange), parquet (engine-native columnar), and the
reference's binary ``mpf`` (wire-compatible hand-rolled proto3 codec,
matrixprofile_ray/mpf.py — a reference user's .mpf files load here and
vice versa). Bulk pipeline state lives in Parquet tables
(pipelines/runner.py layout) with Gorilla binary payloads (core/gorilla.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["to_json", "from_json", "to_disk", "from_disk", "SUPPORTED_FORMATS"]

SUPPORTED_FORMATS = ("json", "parquet", "mpf")

_INT_ARRAY_KEYS = {"pi", "pib", "lpi", "rpi", "pmpi", "discords", "regimes"}


def _encode(obj):
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    return obj


def to_json(profile: dict) -> str:
    """Profile dict → JSON string (ndarrays become lists)."""
    return json.dumps(_encode(profile))


def _decode(key, value):
    if isinstance(value, dict):
        return {k: _decode(k, v) for k, v in value.items()}
    if isinstance(value, list):
        if value and isinstance(value[0], list):
            arr = np.array(value)
            return arr.astype(np.int64) if key in _INT_ARRAY_KEYS else arr
        if value and isinstance(value[0], (int, float)):
            arr = np.array(value)
            if key in _INT_ARRAY_KEYS:
                return arr.astype(np.int64)
            return arr.astype("d")
        return [_decode(key, v) for v in value]
    return value


def from_json(payload: str) -> dict:
    """JSON string → profile dict with ndarray dtypes restored
    (float64 value arrays, int64 index arrays — reference io/__io.py:57-106)."""
    raw = json.loads(payload)
    return {k: _decode(k, v) for k, v in raw.items()}


def to_disk(profile: dict, file_path: str, format: str = "json") -> None:
    if format not in SUPPORTED_FORMATS:
        raise ValueError(
            "format supplied is not supported! Valid formats: "
            + ", ".join(SUPPORTED_FORMATS)
        )
    if format == "json":
        path = file_path if file_path.endswith(".json") else file_path + ".json"
        with open(path, "w") as fh:
            fh.write(to_json(profile))
        return
    if format == "mpf":
        from matrixprofile_ray.mpf import to_mpf_file

        to_mpf_file(profile, file_path)
        return
    # parquet: single-profile table (list columns), the engine-native format
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = file_path if file_path.endswith(".parquet") else file_path + ".parquet"
    cols = {}
    for key in ("mp", "pi", "lmp", "lpi", "rmp", "rpi"):
        if profile.get(key) is not None:
            typ = pa.list_(pa.int64() if key in _INT_ARRAY_KEYS else pa.float64())
            cols[key] = pa.array([np.asarray(profile[key]).tolist()], typ)
    for key in ("w", "ez", "join", "sample_pct", "metric", "algorithm"):
        if key in profile and profile[key] is not None:
            cols[key] = pa.array([profile[key]])
    pq.write_table(pa.table(cols), path)


def from_disk(file_path: str) -> dict:
    """Load a profile, inferring format from the extension."""
    ext = os.path.splitext(file_path)[1].lower()
    if ext == ".json":
        with open(file_path) as fh:
            return from_json(fh.read())
    if ext == ".mpf":
        from matrixprofile_ray.mpf import from_mpf_file

        return from_mpf_file(file_path)
    if ext == ".parquet":
        import pyarrow.parquet as pq

        tbl = pq.read_table(file_path)
        row = tbl.to_pylist()[0]
        out = {}
        for k, v in row.items():
            if isinstance(v, list):
                arr = np.array(v)
                out[k] = arr.astype(np.int64) if k in _INT_ARRAY_KEYS else arr.astype("d")
            else:
                out[k] = v
        return out
    raise ValueError(f"cannot infer format from extension: {file_path}")
