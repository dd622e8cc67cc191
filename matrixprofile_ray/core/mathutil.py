"""Scalar/vector math helpers shared by the matrix-profile kernels.

Parity targets in the reference library:
- ``fft_convolve`` / ``sliding_dot_product`` ⇔ core.py:397-444
- ``distance_profile``                       ⇔ core.py:447-478
- ``apply_exclusion_zone``                   ⇔ core.py:580-587
- ``pearson_to_euclidean``                   ⇔ core.py:590-622
- ``clean_nan_inf`` / ``find_skip_locations``⇔ core.py:141-192
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "fft_convolve",
    "sliding_dot_product",
    "distance_profile",
    "apply_exclusion_zone",
    "pearson_to_euclidean",
    "is_pearson_array",
    "clean_nan_inf",
    "find_skip_locations",
]


def fft_convolve(ts: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Sliding dot product of ``query`` against ``ts`` via FFT convolution."""
    n = len(ts)
    m = len(query)
    x = np.fft.fft(ts)
    y = np.fft.fft(np.concatenate([query[::-1], np.zeros(n - m)]))
    z = np.fft.ifft(x * y)
    return np.real(z[m - 1 : n])


def sliding_dot_product(ts: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Sliding dot product via direct convolution (exact, no FFT round-off)."""
    m = len(query)
    n = len(ts)
    dp = np.convolve(ts, query[::-1], mode="full")
    return np.real(dp[m - 1 : n])


def distance_profile(
    prod: np.ndarray,
    ws: int,
    data_mu: np.ndarray,
    data_sig: np.ndarray,
    query_mu: float,
    query_sig: float,
) -> np.ndarray:
    """z-normalized Euclidean distance profile from a sliding dot product.

    Correlations that numerically exceed 1.0 (identical windows after a large
    dynamic-range excursion) yield a tiny FINITE negative argument; clamp
    those to 0 so the distance is 0 rather than NaN (a NaN silently loses the
    true nearest neighbor in ``dist < mp`` merges). Constant windows
    (sig == 0) must stay NaN exactly as the reference's unclamped
    sqrt(real(...)) leaves them (core.py:447-478): a ±inf argument there
    comes from FFT noise divided by an exactly-zero sigma, and clamping the
    -inf branch fabricated a 0-distance match to a constant window (found by
    the round-4 stampi==stomp driver assert on a count series with runs of
    equal values)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        arg = np.real(
            2 * (ws - (prod - ws * data_mu * query_mu) / (data_sig * query_sig))
        )
        out = np.sqrt(np.maximum(arg, 0.0))
        out[~np.isfinite(arg)] = np.nan
        return out


def apply_exclusion_zone(
    exclusion_zone: int,
    is_join: bool,
    window_size: int,
    data_length: int,
    index: int,
    dist_profile: np.ndarray,
) -> np.ndarray:
    """Mask the trivial-match zone around ``index`` with +inf (in place)."""
    if exclusion_zone > 0 and not is_join:
        start = max(0, index - exclusion_zone)
        end = min(data_length - window_size + 1, index + exclusion_zone + 1)
        dist_profile[start:end] = np.inf
    return dist_profile


def pearson_to_euclidean(a: np.ndarray, windows) -> np.ndarray:
    """Convert Pearson correlations to z-normalized Euclidean distances.

    2-D inputs are row-aligned with ``windows``; inf entries stay inf.
    """
    a = np.asarray(a, dtype="d")
    if a.ndim == 1:
        w = windows[0] if np.ndim(windows) > 0 else windows
        return np.sqrt(2 * w * (1 - a))
    out = np.empty(a.shape, dtype="d")
    for idx, w in enumerate(np.asarray(windows).ravel()[: a.shape[0]]):
        row = np.sqrt(2 * w * (1 - a[idx]))
        row[np.isinf(a[idx])] = np.inf
        out[idx] = row
    return out


def is_pearson_array(a: np.ndarray) -> bool:
    """Heuristic metric sniff: finite values all within [0, 1]."""
    finite = a[np.isfinite(a)]
    return bool(finite.min() >= 0 and finite.max() <= 1)


def clean_nan_inf(ts: np.ndarray) -> np.ndarray:
    """Replace NaN/Inf with zeros (returns a copy)."""
    ts = np.array(ts, dtype="d", copy=True)
    ts[~np.isfinite(ts)] = 0
    return ts


def find_skip_locations(ts: np.ndarray, profile_length: int, window_size: int) -> np.ndarray:
    """Boolean mask of profile positions whose window contains NaN/Inf."""
    bad = ~np.isfinite(np.asarray(ts, dtype="d"))
    if not bad.any():
        return np.zeros(profile_length, dtype=bool)
    # sliding "any" via cumulative count of bad values in each window
    cs = np.concatenate([[0], np.cumsum(bad)])
    counts = cs[window_size:] - cs[:-window_size]
    return counts[:profile_length] > 0
