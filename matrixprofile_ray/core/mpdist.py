"""MPDist: matrix-profile-based distance between two series.

Parity targets: reference algorithms/mpdist.py:20-184 — the k-th order
statistic of the concatenated AB/BA join profiles (k from the 5% threshold),
the MASS distance matrix, and the sliding MPDist vector used by snippets.
"""

from __future__ import annotations

import numpy as np

from matrixprofile_ray.core.mass2 import mass2
from matrixprofile_ray.core.moving import moving_min
from matrixprofile_ray.core.mpx import mpx_ab

__all__ = ["mpdist", "mass_distance_matrix", "calculate_mpdist", "mpdist_vector"]


def mpdist(ts: np.ndarray, ts_b: np.ndarray, w: int, threshold: float = 0.05) -> float:
    """Scalar MPDist between two series."""
    ts = np.asarray(ts, dtype="d")
    ts_b = np.asarray(ts_b, dtype="d")
    if ts.ndim != 1 or ts_b.ndim != 1:
        raise ValueError("ts and ts_b must be one dimensional!")
    if not isinstance(threshold, float) or threshold <= 0 or threshold >= 1:
        raise ValueError("threshold must be a float greater than 0 and less than 1")

    mp, _, mpb, _ = mpx_ab(ts, ts_b, w)
    mp_abba = np.append(mp, mpb)
    abba_sorted = np.sort(mp_abba[np.isfinite(mp_abba)])
    if len(abba_sorted) == 0:
        return np.inf
    upper_idx = int(np.ceil(threshold * (len(ts) + len(ts_b)))) - 1
    return float(abba_sorted[min(len(abba_sorted) - 1, upper_idx)])


def mass_distance_matrix(ts: np.ndarray, query: np.ndarray, w: int) -> np.ndarray:
    """Row i = MASS distance profile of query[i:i+w] over ts."""
    subseq_num = len(query) - w + 1
    return np.array(
        [np.real(mass2(ts, query[i : i + w])) for i in range(subseq_num)]
    )


def calculate_mpdist(profile: np.ndarray, threshold: float, data_length: int) -> float:
    """Threshold-percentile pick from a concatenated join profile."""
    dist_loc = int(np.ceil(threshold * data_length))
    clean = np.sort(profile)
    clean = clean[np.isfinite(clean)]
    if len(clean) < 1:
        return np.inf
    if len(clean) > dist_loc:
        return float(clean[dist_loc])
    return float(np.max(clean))


def mpdist_vector(ts: np.ndarray, ts_b: np.ndarray, w: int) -> np.ndarray:
    """Sliding MPDist of ``ts_b`` against every offset of ``ts``."""
    matrix = mass_distance_matrix(ts, ts_b, w)
    rows = matrix.shape[0]

    all_right_hist = matrix.min(axis=0)
    mass_minimums = np.array([moving_min(row, window=rows) for row in matrix])

    mpdist_length = len(ts) - len(ts_b) + 1
    right_hist_length = len(ts_b) - w + 1
    out = np.empty(mpdist_length)
    for i in range(mpdist_length):
        right_hist = all_right_hist[i : right_hist_length + i]
        left_hist = mass_minimums[:, i]
        profile = np.append(left_hist, right_hist)
        out[i] = calculate_mpdist(profile, 0.05, 2 * len(ts_b))
    return out
