"""STAMPI: incremental matrix-profile maintenance for appended points.

The reference library has no STAMPI (its stomp.py docstring mentions Ray but
v1 ships none); this follows the published STAMPI construction (Yeh et al.,
"Matrix Profile I", ICDM 2016 §V-D) on top of the same primitives the
reference uses: appending one point creates exactly one new subsequence whose
distance profile is computed with MASS, existing profile entries take an
elementwise min against it, and the new entry is the min of that profile with
the self-join exclusion zone applied (ez = ceil(w/2), matching stomp.py:276).
"""

from __future__ import annotations

import numpy as np

from matrixprofile_ray.core import mathutil
from matrixprofile_ray.core.moving import moving_avg_std
from matrixprofile_ray.core.stomp import stomp

__all__ = ["stampi_init", "stampi_append", "stampi_append_many"]


def stampi_init(ts: np.ndarray, w: int) -> dict:
    """Bootstrap incremental state from a batch STOMP run."""
    ts = np.asarray(ts, dtype="d")
    state = {
        "ts": ts,
        "w": w,
        "ez": int(np.ceil(w / 2.0)),
        "mp": np.empty(0, dtype="d"),
        "pi": np.empty(0, dtype=np.int64),
        "algorithm": "stampi",
    }
    if len(ts) >= 2 * w:
        profile = stomp(ts, w)
        state["mp"] = profile["mp"]
        state["pi"] = profile["pi"]
    return state


def stampi_append(state: dict, value: float) -> dict:
    """Append one point and update the profile in O(n log n).

    Mutates and returns ``state``. The matrix profile stays exact (equal to a
    batch recomputation up to floating-point noise in the MASS FFT).
    """
    w = state["w"]
    ez = state["ez"]
    ts = np.append(state["ts"], np.float64(value))
    state["ts"] = ts
    n = len(ts)
    if n < 2 * w:
        return state
    if len(state["mp"]) == 0:
        profile = stomp(ts, w)
        state["mp"] = profile["mp"]
        state["pi"] = profile["pi"]
        return state

    new_idx = n - w
    query = ts[new_idx:]
    # Use the SAME formulation batch STOMP uses (moving_avg_std + the
    # dot-product distance_profile) — not MASS — so the constant-window
    # epsilon policy matches batch recomputation by construction (a
    # hypothesis-found round-1 bug: mass2's sigma-threshold policy and
    # STOMP's sig==0 policy legitimately disagree on near-constant windows).
    data_mu, data_sig = moving_avg_std(ts, w)
    q_mu, q_sig = moving_avg_std(query, w)
    prod = mathutil.fft_convolve(ts, query)
    dist = mathutil.distance_profile(prod, w, data_mu, data_sig, q_mu[0], q_sig[0])
    # constant windows (sig == 0) produce NaN, same as batch STOMP, where
    # they never beat any finite entry; neutralize them for the merges below
    dist[~np.isfinite(dist)] = np.inf
    # batch STOMP's rolling dot products are EXACT, so a constant window's
    # covariance against anything is exactly 0 and 0/0 = NaN never updates.
    # The FFT product here carries ~1e-13 noise that turns that 0/0 into
    # ±inf — and the negative branch is CLAMPED TO DISTANCE 0 by
    # distance_profile, a false exact match (found by the w=4 driver-oracle
    # assert, round 4). Mask both constant sides to inf explicitly.
    if q_sig[0] == 0:
        dist[:] = np.inf
    else:
        dist[data_sig == 0] = np.inf

    # existing entries may now prefer the new subsequence
    head = dist[:new_idx]
    mask = np.zeros(new_idx, dtype=bool)
    cutoff = max(0, new_idx - ez)
    mask[:cutoff] = head[:cutoff] < state["mp"][:new_idx][:cutoff]
    mp = np.append(state["mp"], np.inf)
    pi = np.append(state["pi"], 0)
    mp[:cutoff][mask[:cutoff]] = head[:cutoff][mask[:cutoff]]
    pi[:cutoff][mask[:cutoff]] = new_idx

    # the new subsequence's own nearest neighbor
    own = dist.copy()
    mathutil.apply_exclusion_zone(ez, False, w, n, new_idx, own)
    nn = int(np.argmin(own))
    mp[new_idx] = own[nn]
    pi[new_idx] = nn

    state["mp"] = mp
    state["pi"] = pi
    return state


def stampi_append_many(state: dict, values: np.ndarray) -> dict:
    """Append a block of points in one call — same math as repeated
    ``stampi_append`` (bit-identical: per-point query stats come from the
    same window slice), but the series concatenation and rolling stats of
    the data side are hoisted out of the per-point loop. ``moving_avg_std``
    is cumsum-based, so its prefix values are independent of later points —
    computing it once on the final series equals per-step recomputation.

    Amortizes the Python dispatch the per-point shard loop paid
    (round-2 VERDICT item 3 on ``state/streaming.py``).
    """
    values = np.asarray(values, dtype="d")
    if len(values) == 0:
        return state
    w = state["w"]
    ez = state["ez"]
    ts = np.concatenate([state["ts"], values])
    state["ts"] = ts
    n = len(ts)
    if n < 2 * w:
        return state
    if len(state["mp"]) == 0:
        # sequential appends bootstrap via batch STOMP at exactly n == 2w
        # (stomp and the incremental path agree only up to fp noise, so the
        # bootstrap prefix length must match the one-at-a-time schedule for
        # bit-identical parity with repeated stampi_append)
        profile = stomp(ts[: 2 * w], w)
        state["mp"] = profile["mp"]
        state["pi"] = profile["pi"]

    n_old_sub = len(state["mp"])
    total_sub = n - w + 1
    data_mu, data_sig = moving_avg_std(ts, w)
    mp = np.concatenate([
        state["mp"], np.full(total_sub - n_old_sub, np.inf)
    ])
    pi = np.concatenate([
        state["pi"], np.zeros(total_sub - n_old_sub, dtype=np.int64)
    ])
    for s in range(n_old_sub, total_sub):
        seg = ts[: s + w]           # series as of this append
        query = ts[s: s + w]
        q_mu, q_sig = moving_avg_std(query, w)
        prod = mathutil.fft_convolve(seg, query)
        dist = mathutil.distance_profile(
            prod, w, data_mu[: s + 1], data_sig[: s + 1], q_mu[0], q_sig[0]
        )
        dist[~np.isfinite(dist)] = np.inf
        # same constant-window masking as stampi_append (FFT noise would
        # otherwise clamp a constant window's 0/0 into a false 0 distance)
        if q_sig[0] == 0:
            dist[:] = np.inf
        else:
            dist[data_sig[: s + 1] == 0] = np.inf

        cutoff = max(0, s - ez)
        head = dist[:s]
        mask = head[:cutoff] < mp[:cutoff]
        mp[:cutoff][mask] = head[:cutoff][mask]
        pi[:cutoff][mask] = s

        own = dist.copy()
        mathutil.apply_exclusion_zone(ez, False, w, s + w, s, own)
        nn = int(np.argmin(own))
        mp[s] = own[nn]
        pi[s] = nn

    state["mp"] = mp
    state["pi"] = pi
    return state
