"""Series preprocessing: windowed imputation + constant-window noise.

Parity target: reference preprocess.py:91-270. ``impute_missing`` is the
gap-fill semantics for the rollup pipeline (north rule): NaN/Inf buckets are
filled from the window statistic in a forward (or backward) sweep, with the
endpoints seeded from the nearest finite value.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "is_subsequence_constant",
    "add_noise_to_series",
    "impute_missing",
    "preprocess",
]

_METHODS = {"mean": np.mean, "median": np.median, "min": np.min, "max": np.max}
_DIRECTIONS = {"forward", "fwd", "f", "backward", "bwd", "b"}


def is_subsequence_constant(subsequence: np.ndarray) -> bool:
    a = np.asarray(subsequence)
    return bool(np.all(a == a[0]))


def add_noise_to_series(series: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
    """Add tiny uniform noise (breaks σ=0 windows). Seeded rng for determinism."""
    if rng is None:
        rng = np.random.default_rng(0)
    a = np.array(series, dtype="d", copy=True)
    return a + rng.uniform(0, 0.0000009, size=len(a))


def impute_missing(
    ts: np.ndarray, window: int, method: str = "mean", direction: str = "forward"
) -> np.ndarray:
    """Windowed fill of NaN/Inf values (returns a copy)."""
    if method not in _METHODS:
        raise ValueError(
            "invalid imputation method! valid include options: "
            + ", ".join(_METHODS)
        )
    if direction not in _DIRECTIONS:
        raise ValueError(
            "invalid imputation direction! valid include options: "
            + ", ".join(sorted(_DIRECTIONS))
        )
    if not isinstance(window, int):
        raise ValueError("window is not an integer!")

    temp = np.array(ts, dtype="d", copy=True)
    func = _METHODS[method]
    bad = ~np.isfinite(temp)

    if bad.all():
        return temp
    # endpoints seeded from the nearest finite value
    if bad[0]:
        temp[0] = temp[~bad][0]
        bad = ~np.isfinite(temp)
    if bad[-1]:
        temp[-1] = temp[~bad][-1]
        bad = ~np.isfinite(temp)

    if (direction.startswith("f") and method == "mean"
            and window <= 8 and len(temp) >= window):
        # (window ≤ 8 keeps python sum() bit-identical to np.mean, which
        # switches to unrolled/pairwise accumulation on longer slices)
        # Fast path, EXACT same results as the generic sweep below: after
        # window 0 is filled (the seeded endpoint makes it non-empty), each
        # later window introduces at most one new NaN — its rightmost
        # element — so the sweep degenerates to a scalar recurrence
        # x[t] = mean(x[t-w+1:t]). Python-float arithmetic on a list keeps
        # it ~200x faster than per-window numpy slicing on sparse series.
        n = len(temp)
        head_bad = bad[:window]
        if head_bad.any():
            temp[:window][head_bad] = temp[:window][~head_bad].mean()
        gaps = np.flatnonzero(bad[window:]) + window
        if len(gaps):
            buf = temp.tolist()
            wm1 = window - 1
            for t in gaps:
                seg = buf[t - wm1 : t]
                buf[t] = sum(seg) / wm1
            temp = np.asarray(buf)
        return temp

    if direction.startswith("f"):
        index_order = range(len(temp) - window + 1)
    else:
        index_order = range(len(temp) - window + 1, 0, -1)

    # identical semantics to the reference's sweep, but the NaN mask is
    # maintained incrementally (the reference recomputes it over the whole
    # array per touched window — O(n^2) on sparse series)
    for start in index_order:
        end = start + window
        window_bad = bad[start:end]
        if window_bad.any():
            seg = temp[start:end]
            stat = func(seg[~window_bad])
            seg[window_bad] = stat
            bad[start:end] = ~np.isfinite(seg)
    return temp


def preprocess(
    ts: np.ndarray,
    window: int,
    impute_method: str = "mean",
    impute_direction: str = "forward",
    add_noise: bool = True,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Impute missing values, then de-flatten constant windows with noise."""
    temp = impute_missing(ts, window, method=impute_method, direction=impute_direction)
    if add_noise:
        if rng is None:
            rng = np.random.default_rng(0)
        # Equivalent to the sequential window scan (noise window s, then the
        # next fully-un-noised constant window is s+window), expressed over
        # maximal equal-value runs: within a run [a, b) noise lands at
        # a, a+w, a+2w, ... while the window fits. Same windows in the same
        # ascending order ⇒ identical rng draw sequence ⇒ identical output,
        # but O(#runs + #noised) instead of a per-position python loop
        # (imputation of sparse series creates ~n-long constant runs).
        n = len(temp)
        if n >= window:
            change = np.flatnonzero(temp[1:] != temp[:-1]) + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [n]])
            for a, b in zip(starts, ends):
                s = a
                while s + window <= b:
                    temp[s : s + window] = add_noise_to_series(
                        temp[s : s + window], rng=rng
                    )
                    s += window
    return temp
