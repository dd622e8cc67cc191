"""PreSCRIMP and SCRIMP++ — anytime/approximate matrix profile.

Parity targets: reference algorithms/scrimp.py:211-406 (prescrimp) and
:409-565 (scrimp_plus_plus), including the quirky refine-slice bounds
(`dist1[0:idx-1]`, `dist2[plen-idx+2:]`) the goldens depend on. The anytime
behaviour is expressed by ``sample_pct``; sampling uses an explicit
per-call seeded generator so results are reproducible regardless of
partition/order (unlike the reference's global np.random state).
"""

from __future__ import annotations

import math

import numpy as np

from matrixprofile_ray.core import mathutil
from matrixprofile_ray.core.moving import moving_avg_std

__all__ = ["prescrimp", "scrimp_plus_plus"]


def _fft_distance_profile(X, y, n, m, meanx, sigmax):
    """Distance profile from a precomputed FFT of the series."""
    y = np.concatenate([y[::-1], np.zeros(n - m)])
    z = np.fft.ifft(X * np.fft.fft(y))
    meany = np.sum(y) / m
    sigmay = np.sqrt(np.sum(y**2) / m - meany**2)
    dist = (z[m - 1 : n] - m * meanx * meany) / (sigmax * sigmay)
    dist = np.real(2 * (m - dist))
    return np.sqrt(np.absolute(dist))


def prescrimp(
    ts: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    step_size: float = 0.25,
    sample_pct: float = 0.1,
    random_state: int | None = None,
) -> dict:
    """PreSCRIMP: sampled anchors + local dot-product refinement."""
    is_join = query is not None
    ts = np.asarray(ts, dtype="d")
    query = np.asarray(query, dtype="d") if is_join else ts

    if not isinstance(step_size, float) or not (0 <= step_size <= 1):
        raise ValueError("step_size should be a float between 0 and 1.")
    if not isinstance(sample_pct, (int, float)) or not (0 <= sample_pct <= 1):
        raise ValueError("sample_pct should be a float between 0 and 1.")
    if window_size < 4:
        raise ValueError("window size must be at least 4.")
    if window_size > len(query) / 2:
        raise ValueError("Time series is too short relative to desired window size")

    step = int(math.floor(window_size * step_size))
    plen = len(ts) - window_size + 1
    n = len(ts)
    m = window_size
    ez = int(np.ceil(window_size / 4.0))

    mp = np.zeros(plen)
    pi = np.zeros(plen, dtype=np.int64)

    X = np.fft.fft(ts)
    mux, sigx = moving_avg_std(ts, m)

    dp = np.zeros(plen)
    refine = np.full(plen, np.inf)
    orig_index = np.arange(plen)
    compute_order = np.arange(0, plen, step=step)

    for iteration, idx in enumerate(compute_order):
        dist = _fft_distance_profile(X, ts[idx : idx + m], n, m, mux, sigx)
        dist = mathutil.apply_exclusion_zone(ez, is_join, m, n, idx, dist)

        if iteration == 0:
            mp = dist
            pi[:] = idx
        else:
            upd = dist < mp
            pi[upd] = idx
            mp[upd] = dist[upd]

        idx_min = int(np.argmin(dist))
        mp[idx] = dist[idx_min]
        pi[idx] = idx_min
        idx_nn = int(pi[idx])

        idx_diff = idx_nn - idx
        endidx = int(np.min([plen - 1, idx + step - 1, plen - idx_diff - 1]))
        beginidx = int(np.max([0, idx - step + 1, 2 - idx_diff]))

        # refine forward from the anchor with the running dot product
        dp[idx] = (m - mp[idx] ** 2 / 2) * sigx[idx] * sigx[idx_nn] \
            + m * mux[idx] * mux[idx_nn]
        if endidx > idx:
            grow = (
                ts[idx + m : endidx + m] * ts[idx_nn + m : endidx + m + idx_diff]
                - ts[idx:endidx] * ts[idx_nn : endidx + idx_diff]
            )
            dp[idx + 1 : endidx + 1] = dp[idx] + np.cumsum(grow)
        if endidx >= idx + 1:
            num = dp[idx + 1 : endidx + 1] - m * (
                mux[idx + 1 : endidx + 1] * mux[idx_nn + 1 : endidx + idx_diff + 1]
            )
            den = sigx[idx + 1 : endidx + 1] * sigx[idx_nn + 1 : endidx + idx_diff + 1]
            refine[idx + 1 : endidx + 1] = np.sqrt(np.abs(2 * (m - num / den)))

        # refine backward from the anchor
        back = np.arange(idx - 1, beginidx - 1, -1)
        if back.size:
            shrink = (
                ts[back] * ts[back + idx_diff]
                - ts[back + m] * ts[back + idx_diff + m]
            )
            dp[back] = dp[idx] + np.cumsum(shrink)
        if beginidx < idx:
            num = dp[beginidx:idx] - m * (
                mux[beginidx:idx] * mux[beginidx + idx_diff : idx_nn]
            )
            den = sigx[beginidx:idx] * sigx[beginidx + idx_diff : idx_nn]
            refine[beginidx:idx] = np.sqrt(np.abs(2 * (m - num / den)))

        # apply refinements on both the anchor side and the neighbor side
        seg = refine[beginidx : endidx + 1]
        upd1 = np.flatnonzero(seg < mp[beginidx : endidx + 1]) + beginidx
        if upd1.size:
            mp[upd1] = refine[upd1]
            pi[upd1] = orig_index[upd1] + idx_diff
        upd2 = np.flatnonzero(
            seg < mp[beginidx + idx_diff : endidx + idx_diff + 1]
        ) + beginidx
        if upd2.size:
            mp[upd2 + idx_diff] = refine[upd2]
            pi[upd2 + idx_diff] = orig_index[upd2]

    return {
        "mp": mp,
        "pi": pi,
        "rmp": None,
        "rpi": None,
        "lmp": None,
        "lpi": None,
        "w": window_size,
        "ez": ez,
        "join": is_join,
        "sample_pct": sample_pct,
        "metric": "euclidean",
        "algorithm": "prescrimp",
        "_ts": ts,
        "_query": query if is_join else None,
    }


def scrimp_plus_plus(
    ts: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    step_size: float = 0.25,
    sample_pct: float = 0.1,
    random_state: int | None = None,
) -> dict:
    """SCRIMP++: PreSCRIMP then SCRIMP diagonal refinement on sampled diagonals."""
    profile = prescrimp(
        ts, window_size, query=query, step_size=step_size,
        sample_pct=sample_pct, random_state=random_state,
    )
    ts = profile["_ts"]
    plen = len(ts) - window_size + 1
    n = len(ts)
    m = window_size
    ez = profile["ez"]

    mux, sigx = moving_avg_std(ts, m)

    orig_index = np.arange(plen)
    compute_order = orig_index[orig_index > ez]
    sample_size = int(np.ceil(len(compute_order) * sample_pct))
    rng = np.random.default_rng(random_state if random_state is not None else 0)
    compute_order = rng.choice(compute_order, size=sample_size, replace=False)

    curlastz = np.zeros(plen)
    curdistance = np.zeros(plen)
    dist1 = np.full(plen, np.inf)
    dist2 = np.full(plen, np.inf)

    mp = profile["mp"]
    pi = profile["pi"]

    for idx in compute_order:
        curlastz[idx] = np.sum(ts[:m] * ts[idx : idx + m])
        curlastz[idx + 1 :] = curlastz[idx] + np.cumsum(
            ts[m : n - idx] * ts[idx + m : n]
            - ts[: plen - idx - 1] * ts[idx : plen - 1]
        )

        with np.errstate(divide="ignore", invalid="ignore"):
            curdistance[idx:] = np.sqrt(
                np.abs(
                    2
                    * (
                        m
                        - (
                            curlastz[idx:plen]
                            - m * (mux[idx:] * mux[: plen - idx])
                        )
                        / (sigx[idx:] * sigx[: plen - idx])
                    )
                )
            )

        dist1[: idx - 1] = np.inf
        dist1[idx:] = curdistance[idx:]
        dist2[: plen - idx] = curdistance[idx:]
        dist2[plen - idx + 2 :] = np.inf

        loc1 = dist1 < mp
        if loc1.any():
            mp[loc1] = dist1[loc1]
            pi[loc1] = orig_index[loc1] - idx
        loc2 = dist2 < mp
        if loc2.any():
            mp[loc2] = dist2[loc2]
            pi[loc2] = orig_index[loc2] + idx

    profile["algorithm"] = "scrimp++"
    profile["sample_pct"] = sample_pct
    return profile
