"""SKIMP (Pan-MatrixProfile) and maximum_subsequence window search.

Parity targets: reference algorithms/skimp.py:46-94 (binary_split),
:97-243 (skimp) and :246-384 (maximum_subsequence). The sequential
window-loop here serves single-series use and tests; the distributed path
fans (series × window) rows out through a Ray Data stage instead
(see matrixprofile_ray.stages.profile).
"""

from __future__ import annotations

import math

import numpy as np

from matrixprofile_ray.core.mathutil import pearson_to_euclidean
from matrixprofile_ray.core.mpx import mpx

__all__ = ["binary_split", "skimp", "maximum_subsequence", "pick_mp"]


class NoSolutionPossible(Exception):
    pass


def binary_split(n: int) -> list[int]:
    """Breadth-first binary-split visit order of range(n)."""
    if n < 2:
        return [0]
    order = [0]
    intervals = [(1, n - 1)]
    while intervals:
        lo, hi = intervals.pop(0)
        mid = (lo + hi) // 2
        order.append(mid)
        if lo == hi:
            continue
        if lo != mid:
            intervals.append((lo, mid - 1))
        if hi != mid:
            intervals.append((mid + 1, hi))
    return order


def skimp(
    ts: np.ndarray,
    windows=None,
    cross_correlation: bool = False,
    pmp_obj: dict | None = None,
    sample_pct: float = 0.1,
) -> dict:
    """Pan-MatrixProfile over many windows in binary-split (BFS) order."""
    ts = np.asarray(ts, dtype="d")
    n = len(ts)
    if windows is None:
        windows = range(8, int(math.floor(n / 2)) + 1)
        # windows given explicitly ⇒ all are computed (sample_pct ignored)
    if not isinstance(cross_correlation, bool):
        raise ValueError("cross_correlation must be a boolean!")
    if not isinstance(sample_pct, (int, float)) or sample_pct > 1 or sample_pct < 0:
        raise ValueError("sample_pct must be a decimal between 0 and 1")

    split_index = binary_split(len(windows))
    pmp = np.full((len(split_index), n), np.inf)
    pmpi = np.full((len(split_index), n), -1, dtype=np.int64)

    last_index = len(split_index)
    if sample_pct < 1:
        last_index = min(len(split_index), int(np.floor(len(split_index) * sample_pct)))

    windows = np.array(windows)
    existing = pmp_obj.get("windows") if isinstance(pmp_obj, dict) else None

    for i in range(last_index):
        row = split_index[i]
        window_size = int(windows[row])

        if existing is not None:
            w_idx = np.flatnonzero(np.asarray(existing) == window_size)
            if len(w_idx) == 1:
                pmp[row, :] = pmp_obj["pmp"][w_idx[0], :]
                pmpi[row, :] = pmp_obj["pmpi"][w_idx[0], :]
                continue

        mp, pi = mpx(ts, window_size, cross_correlation=cross_correlation)
        pmp[row, : len(mp)] = mp
        pmpi[row, : len(pi)] = pi

    metric = "pearson" if cross_correlation else "euclidean"
    return {
        "pmp": pmp,
        "pmpi": pmpi,
        "windows": windows,
        "sample_pct": sample_pct,
        "metric": metric,
        "algorithm": "skimp",
        "class": "PMP",
    }


def maximum_subsequence(
    ts: np.ndarray,
    threshold: float = 0.95,
    refine_stepsize: float = 0.05,
    include_pmp: bool = False,
    lower_window: int = 8,
):
    """Largest window whose best Pearson correlation stays above threshold.

    Doubling search from ``lower_window`` then refinement in
    ``refine_stepsize`` increments; sequentially dependent, so it stays a
    per-series kernel.
    """
    ts = np.asarray(ts, dtype="d")
    n = len(ts)
    windows = []
    pearson = []
    pmp_rows = []
    pmpi_rows = []
    max_window = int(np.floor(n / 2))
    window_size = lower_window

    def _row(mp, pi, w):
        mp = pearson_to_euclidean(mp, w)
        pad = n - mp.shape[0]
        return (
            np.append(mp, np.full(pad, np.inf)),
            np.append(pi.astype("d"), np.full(pad, np.nan)),
        )

    while window_size <= max_window:
        mp, pi = mpx(ts, window_size, cross_correlation=True)
        corr_max = float(np.max(mp[~np.isinf(mp)]))
        windows.append(window_size)
        pearson.append(corr_max)
        if include_pmp:
            r, ri = _row(mp, pi, window_size)
            pmp_rows.append(r)
            pmpi_rows.append(ri)
        if corr_max < threshold:
            break
        window_size *= 2

    windows = np.array(windows)
    pearson = np.array(pearson)
    mask = pearson > threshold
    windows = windows[mask]
    if len(windows) < 1:
        raise NoSolutionPossible(
            "Given the threshold {:.2f}, no window was found. Please try "
            "increasing your threshold.".format(threshold)
        )
    window_size = int(windows[-1])

    if include_pmp:
        pmp_rows = [r for r, m in zip(pmp_rows, mask) if m]
        pmpi_rows = [r for r, m in zip(pmpi_rows, mask) if m]

    test_windows = np.append(
        np.arange(refine_stepsize, 1, step=refine_stepsize) + 1, 2
    )
    test_windows = np.floor(test_windows * window_size).astype("int")
    test_windows[test_windows % 2 == 1] += 1

    windows = list(windows)
    for window_size in test_windows:
        window_size = int(window_size)
        mp, pi = mpx(ts, window_size, cross_correlation=True)
        corr_max = float(np.max(mp[~np.isinf(mp)]))
        windows.append(window_size)
        if include_pmp:
            r, ri = _row(mp, pi, window_size)
            pmp_rows.append(r)
            pmpi_rows.append(ri)
        if corr_max < threshold:
            break

    if include_pmp:
        return {
            "upper_window": window_size,
            "windows": np.array(windows),
            "pmp": np.vstack(pmp_rows),
            "pmpi": np.vstack(pmpi_rows),
        }
    return window_size


def pick_mp(pmp_profile: dict, window: int) -> dict:
    """Extract one window's MP row from a PMP (reference utils.py:45-100)."""
    windows = np.asarray(pmp_profile["windows"])
    loc = np.flatnonzero(windows == window)
    if len(loc) != 1:
        raise ValueError("window %d is not in the PMP" % window)
    row = int(loc[0])
    mp = pmp_profile["pmp"][row]
    n = np.sum(np.isfinite(mp) | np.isinf(mp))
    plen = None
    return {
        "mp": mp[: len(mp) - window + 1],
        "pi": pmp_profile["pmpi"][row][: len(mp) - window + 1],
        "w": window,
        "metric": pmp_profile.get("metric", "euclidean"),
        "algorithm": "skimp.pick_mp",
    }
