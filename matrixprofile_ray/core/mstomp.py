"""mSTAMP: multidimensional matrix profile.

Numerical-parity target: reference algorithms/mstomp.py:21-379 (the
sorted-cumulative-mean construction over per-dimension distance profiles;
row j of the output is the best mean over the (j+1) closest dimensions).
The reference's multi-dim path crashes in v1 (it calls a nonexistent
``core.find_multid_skip_locations``, mstomp.py:284) — semantics here follow
the mSTAMP paper + the reference's single-dimension fixtures
(tests/test_mstomp.py:38-59), which this port reproduces exactly.

The i-loop keeps the reference's O(1) sliding-dot update; every per-step
operation is vectorized across dimensions and profile positions.
"""

from __future__ import annotations

import numpy as np

from matrixprofile_ray.core.mathutil import fft_convolve
from matrixprofile_ray.core.moving import moving_avg_std

__all__ = ["mstomp"]

_EPS = 1e-14


def mstomp(ts: np.ndarray, window_size: int, return_dimension: bool = False) -> dict:
    """Multidimensional matrix profile of a (n_dim, n) array.

    Returns dict with 2-D ``mp``/``pi``/``lmp``/``lpi``/``rmp``/``rpi``
    (row j = profile using the j+1 nearest dimensions) and optional ``pd``.
    """
    ts = np.asarray(ts, dtype="d")
    if ts.ndim == 1:
        ts = ts[None, :]
    num_dim, n = ts.shape
    if window_size < 4:
        raise ValueError("window size must be at least 4.")
    if n < window_size * 2:
        raise ValueError("Time series is too short relative to desired window size")

    plen = n - window_size + 1
    ez = int(np.ceil(window_size / 2.0))

    mu = np.empty((num_dim, plen))
    sig = np.empty((num_dim, plen))
    first_product = np.empty((num_dim, plen))
    for d in range(num_dim):
        mu[d], sig[d] = moving_avg_std(ts[d], window_size)
        first_product[d] = fft_convolve(ts[d], ts[d, :window_size])

    skip_locs = np.zeros(plen, dtype=bool)
    for d in range(num_dim):
        bad = ~np.isfinite(ts[d])
        if bad.any():
            csum = np.cumsum(np.concatenate([[0], bad.astype(np.int64)]))
            skip_locs |= (csum[window_size:] - csum[:-window_size]) > 0

    mp = np.full((num_dim, plen), np.inf)
    pi = np.zeros((num_dim, plen), dtype=np.int64)
    lmp = np.full((num_dim, plen), np.inf)
    lpi = np.zeros((num_dim, plen), dtype=np.int64)
    rmp = np.full((num_dim, plen), np.inf)
    rpi = np.zeros((num_dim, plen), dtype=np.int64)
    pd_out = (
        [np.zeros((d + 1, plen), dtype=np.int64) for d in range(num_dim)]
        if return_dimension else None
    )

    last_product = first_product.copy()
    first_window = ts[:, :window_size]
    query_sum = first_window.sum(axis=1)
    query_2sum = (first_window ** 2).sum(axis=1)
    query_mu = query_sum / window_size
    query_sig = np.sqrt(
        np.maximum(query_2sum / window_size - query_mu ** 2, _EPS)
    )
    drop_value = first_window[:, 0].copy()

    dist = np.empty((num_dim, plen))
    positions = np.arange(plen)
    low_sig = sig < np.sqrt(_EPS)

    for i in range(plen):
        window_last = ts[:, i + window_size - 1]
        if i > 0:
            query_sum += window_last - drop_value
            query_2sum += window_last ** 2 - drop_value ** 2
            query_mu = query_sum / window_size
            query_sig = np.sqrt(
                np.maximum(query_2sum / window_size - query_mu ** 2, _EPS)
            )
            last_product[:, 1:] = (
                last_product[:, : n - window_size]
                - ts[:, : n - window_size] * drop_value[:, None]
                + ts[:, window_size:] * window_last[:, None]
            )
            last_product[:, 0] = first_product[:, i]
        drop_value = ts[:, i].copy()

        if skip_locs[i] or np.any(query_sig < np.sqrt(_EPS)):
            continue

        # z-normalized euclidean distance profile per dimension
        den = window_size * sig * query_sig[:, None]
        dist[:] = 2 * window_size * (
            1 - (last_product - window_size * mu * query_mu[:, None]) / den
        )
        np.maximum(dist, 0, out=dist)
        np.sqrt(dist, out=dist)
        dist[dist < _EPS] = 0
        # exclusion zone around i
        lo, hi = max(0, i - ez), min(plen, i + ez + 1)
        dist[:, lo:hi] = np.inf
        dist[:, skip_locs] = np.inf
        dist[low_sig] = np.inf

        order = np.argsort(dist, axis=0)
        dsorted = np.sort(dist, axis=0)
        cumsum = np.zeros(plen)
        for j in range(num_dim):
            cumsum += dsorted[j]
            mean_j = cumsum / (j + 1)

            upd = mean_j < mp[j]
            mp[j, upd] = mean_j[upd]
            pi[j, upd] = i
            if return_dimension:
                pd_out[j][:, upd] = order[: j + 1, upd]

            upd_l = (positions >= i) & (mean_j < lmp[j])
            lmp[j, upd_l] = mean_j[upd_l]
            lpi[j, upd_l] = i

            upd_r = (positions < i) & (mean_j < rmp[j])
            rmp[j, upd_r] = mean_j[upd_r]
            rpi[j, upd_r] = i

    out = {
        "mp": mp,
        "pi": pi,
        "lmp": lmp,
        "lpi": lpi,
        "rmp": rmp,
        "rpi": rpi,
        "w": window_size,
        "ez": ez,
        "metric": "euclidean",
        "algorithm": "mstomp",
    }
    if return_dimension:
        out["pd"] = pd_out
    return out
