"""Rolling/window statistics kernels.

Numerical parity targets (reference: matrix-profile-foundation/matrixprofile):
- ``muinvn``        ⇔ cycore.pyx:22-100  (Kahan-compensated rolling mean +
                      inverse-norm sigma). We reach equal-or-better precision
                      with an 80-bit extended-precision cumulative sum for the
                      mean and exact centered second moments per window, so
                      the MATLAB goldens (muinvn_mua.txt / muinvn_stda.txt)
                      match to well beyond decimal=4.
- ``moving_avg_std``⇔ cycore.pyx:103-155 (plain cumsum formula incl. the
                      negative-variance clamp) — bit-compatible because
                      np.cumsum accumulates sequentially like the C loop.
- ``rolling_window``/``moving_*`` ⇔ core.py:261-394.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rolling_window",
    "moving_average",
    "moving_std",
    "moving_min",
    "moving_max",
    "moving_median",
    "moving_avg_std",
    "muinvn",
]

# Cap on temporary matrix cells for O(n*w) chunked window reductions.
_CHUNK_CELLS = 4_000_000


def rolling_window(a: np.ndarray, window: int) -> np.ndarray:
    """Zero-copy strided view of all length-``window`` subsequences of ``a``."""
    a = np.ascontiguousarray(a)
    return np.lib.stride_tricks.sliding_window_view(a, window)


def moving_average(a: np.ndarray, window: int = 3) -> np.ndarray:
    return np.mean(rolling_window(a, window), axis=-1)


def moving_std(a: np.ndarray, window: int = 3) -> np.ndarray:
    return np.std(rolling_window(a, window), axis=-1)


def moving_min(a: np.ndarray, window: int = 3) -> np.ndarray:
    return np.min(rolling_window(a, window), axis=-1)


def moving_max(a: np.ndarray, window: int = 3) -> np.ndarray:
    return np.max(rolling_window(a, window), axis=-1)


def moving_median(a: np.ndarray, window: int = 3) -> np.ndarray:
    return np.median(rolling_window(a, window), axis=-1)


def moving_avg_std(a: np.ndarray, window: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Rolling mean + std via the cumsum formula with negative-variance clamp.

    Matches the reference's fast path (cycore.pyx:103-155): sequential float64
    cumulative sums of x and x**2, per-window difference, variance clamped to
    zero when round-off drives it negative.
    """
    a = np.asarray(a, dtype="d")
    n = a.shape[0]
    plen = n - window + 1
    cs = np.cumsum(a)
    cs2 = np.cumsum(a * a)
    sums = np.empty(plen, dtype="d")
    sq_sums = np.empty(plen, dtype="d")
    sums[0] = cs[window - 1]
    sq_sums[0] = cs2[window - 1]
    sums[1:] = cs[window:] - cs[:plen - 1]
    sq_sums[1:] = cs2[window:] - cs2[:plen - 1]
    mu = sums / window
    sig_sq = sq_sums / window - mu * mu
    sig = np.sqrt(np.maximum(sig_sq, 0.0))
    return mu, sig


def muinvn(a: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """High-precision rolling mean and inverse centered norm.

    Returns ``(mu, sig)`` with ``sig[i] = 1 / sqrt(sum((a[i:i+w]-mu[i])**2))``
    and exactly ``0.0`` for constant windows — the contract MPX correctness
    depends on (reference cycore.pyx:95-98).

    Precision strategy: the reference uses Kahan/Neumaier running sums; we use
    an extended-precision (np.longdouble, 64-bit mantissa on x86) cumulative
    sum for the mean — strictly tighter error than compensated float64 — and
    compute the centered second moment exactly per window in chunks (same
    O(n·w) work the reference's sigma loop does, but vectorized).
    """
    a = np.asarray(a, dtype="d")
    n = a.shape[0]
    plen = n - w + 1

    acc = np.cumsum(a.astype(np.longdouble))
    sums = np.empty(plen, dtype=np.longdouble)
    sums[0] = acc[w - 1]
    if plen > 1:
        sums[1:] = acc[w:] - acc[:plen - 1]
    mu = np.asarray(sums / w, dtype="d")

    ssq = np.empty(plen, dtype="d")
    rows_per_chunk = max(1, _CHUNK_CELLS // w)
    win = rolling_window(a, w)
    for start in range(0, plen, rows_per_chunk):
        end = min(plen, start + rows_per_chunk)
        centered = win[start:end] - mu[start:end, None]
        ssq[start:end] = np.einsum("ij,ij->i", centered, centered)

    sig = np.zeros(plen, dtype="d")
    nz = ssq > 0
    sig[nz] = 1.0 / np.sqrt(ssq[nz])
    return mu, sig
