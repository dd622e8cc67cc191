"""Annotation vectors + corrected matrix profile (CMP).

Parity target: reference transform.py:15-285. The AV registry is the user
extension point: ``apply_av(..., av='custom', custom_av=...)`` accepts any
array; built-ins are vectorized ports of the reference loops.
"""

from __future__ import annotations

import numpy as np

from matrixprofile_ray.core.moving import moving_std, rolling_window

__all__ = [
    "apply_av",
    "make_default_av",
    "make_complexity_av",
    "make_meanstd_av",
    "make_clipping_av",
    "empty_mp",
]


def make_default_av(ts: np.ndarray, window: int) -> np.ndarray:
    return np.ones(len(ts) - window + 1)


def make_complexity_av(ts: np.ndarray, window: int) -> np.ndarray:
    ts = np.asarray(ts, dtype="d")
    diffs = np.diff(ts) ** 2
    # sum of squared diffs inside each window, via cumsum
    cs = np.concatenate([[0.0], np.cumsum(diffs)])
    ce = cs[window - 1 :] - cs[: len(cs) - window + 1]
    av = np.sqrt(ce[: len(ts) - window + 1])
    max_val, min_val = np.max(av), np.min(av)
    if max_val == 0:
        return np.zeros(len(av))
    return (av - min_val) / max_val


def make_meanstd_av(ts: np.ndarray, window: int) -> np.ndarray:
    std = moving_std(np.asarray(ts, dtype="d"), window)
    return (std < np.mean(std)).astype("d")


def make_clipping_av(ts: np.ndarray, window: int) -> np.ndarray:
    ts = np.asarray(ts, dtype="d")
    clipped = (ts == np.max(ts)) | (ts == np.min(ts))
    av = np.sum(rolling_window(clipped.astype("d"), window), axis=1)
    av -= np.min(av)
    max_val = np.max(av)
    if max_val == 0:
        return np.zeros(len(av))
    return 1 - av / max_val


_BUILTIN_AVS = {
    "default": make_default_av,
    "complexity": make_complexity_av,
    "meanstd": make_meanstd_av,
    "clipping": make_clipping_av,
}


def apply_av(
    mp: np.ndarray,
    ts: np.ndarray,
    window: int,
    av: str = "default",
    custom_av: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Compute (cmp, av_vector): cmp = mp + (1 - av) * max(mp)."""
    if av == "custom":
        if custom_av is None:
            raise ValueError("apply_av expects custom_av to be array-like")
        temp_av = np.asarray(custom_av, dtype="d")
    elif av in _BUILTIN_AVS:
        temp_av = _BUILTIN_AVS[av](ts, window)
    else:
        raise ValueError("av parameter is invalid")

    mp = np.asarray(mp, dtype="d")
    if len(temp_av) != len(mp):
        raise ValueError("Lengths of annotation vector and mp are different")
    if (temp_av < 0.0).any() or (temp_av > 1.0).any():
        raise ValueError("Annotation vector values must be between 0 and 1")

    cmp_ = mp + (1 - temp_av) * np.max(mp)
    return cmp_, temp_av


def empty_mp() -> dict:
    """Empty profile template (reference utils.py:15-42)."""
    return {
        "mp": None,
        "pi": None,
        "rmp": None,
        "rpi": None,
        "lmp": None,
        "lpi": None,
        "metric": None,
        "w": None,
        "ez": None,
        "join": None,
        "sample_pct": None,
        "algorithm": None,
        "class": "MatrixProfile",
    }
