"""STOMP: exact matrix profile via O(1) sliding dot-product updates.

Parity target: reference algorithms/stomp.py:19-377 — including left/right
profiles, the ez = ceil(w/2) self-join exclusion zone (disabled for joins),
NaN/Inf skip handling, and int profile-index initialisation to 0. Computed
here as a single "batch" (the reference's multiprocessing ranges collapse to
one; distribution happens across series, not within one).
"""

from __future__ import annotations

import numpy as np

from matrixprofile_ray.core import mathutil
from matrixprofile_ray.core.moving import moving_avg_std

__all__ = ["stomp"]


def stomp(ts: np.ndarray, window_size: int, query: np.ndarray | None = None) -> dict:
    """Compute the STOMP matrix profile for one series.

    Returns a dict with mp/pi/lmp/lpi/rmp/rpi plus metadata columns matching
    the reference profile structure (minus the embedded raw data).
    """
    is_join = query is not None
    ts = np.asarray(ts, dtype="d")
    query = np.asarray(query, dtype="d") if is_join else ts

    if window_size < 4:
        raise ValueError("window size must be at least 4.")
    if window_size > len(query) / 2:
        raise ValueError("Time series is too short relative to desired window size")

    profile_length = len(ts) - window_size + 1
    data_length = len(ts)
    num_queries = len(query) - window_size + 1
    exclusion_zone = 0 if is_join else int(np.ceil(window_size / 2.0))

    skip_locs = mathutil.find_skip_locations(ts, profile_length, window_size)
    ts = mathutil.clean_nan_inf(ts)
    query = mathutil.clean_nan_inf(query)

    matrix_profile = np.full(profile_length, np.inf)
    profile_index = np.zeros(profile_length, dtype=np.int64)
    left_matrix_profile = right_matrix_profile = None
    left_profile_index = right_profile_index = None
    if not is_join:
        left_matrix_profile = np.full(profile_length, np.inf)
        right_matrix_profile = np.full(profile_length, np.inf)
        left_profile_index = np.zeros(profile_length, dtype=np.int64)
        right_profile_index = np.zeros(profile_length, dtype=np.int64)

    data_mu, data_sig = moving_avg_std(ts, window_size)
    first_window = query[:window_size]
    first_product = mathutil.fft_convolve(ts, first_window)
    last_product = first_product.copy()

    query_sum = np.sum(first_window)
    query_2sum = np.sum(first_window**2)
    query_mu, query_sig = moving_avg_std(first_window, window_size)
    drop_value = first_window[0]

    def _update(i: int, dist: np.ndarray) -> None:
        dist = mathutil.apply_exclusion_zone(
            exclusion_zone, is_join, window_size, data_length, i, dist
        )
        better = dist < matrix_profile
        matrix_profile[better] = dist[better]
        profile_index[better] = i
        if not is_join:
            if i == 0:
                left_matrix_profile[better] = dist[better]
                left_profile_index[better] = 0
            else:
                lmask = np.zeros(profile_length, dtype=bool)
                lmask[i:] = dist[i:] < left_matrix_profile[i:]
                left_matrix_profile[lmask] = dist[lmask]
                left_profile_index[lmask] = i
                rmask = np.zeros(profile_length, dtype=bool)
                rmask[:i] = dist[:i] < right_matrix_profile[:i]
                right_matrix_profile[rmask] = dist[rmask]
                right_profile_index[rmask] = i

    dist = mathutil.distance_profile(
        last_product, window_size, data_mu, data_sig, query_mu[0], query_sig[0]
    )
    _update(0, dist)

    for i in range(1, num_queries):
        if skip_locs[i] if i < len(skip_locs) else False:
            continue
        query_window = query[i : i + window_size]
        query_sum = query_sum - drop_value + query_window[-1]
        query_2sum = query_2sum - drop_value**2 + query_window[-1] ** 2
        q_mu = query_sum / window_size
        q_sig = np.sqrt(query_2sum / window_size - q_mu**2)
        last_product[1:] = (
            last_product[: data_length - window_size]
            - ts[: data_length - window_size] * drop_value
            + ts[window_size:] * query_window[-1]
        )
        last_product[0] = first_product[i]
        drop_value = query_window[0]
        dist = mathutil.distance_profile(
            last_product, window_size, data_mu, data_sig, q_mu, q_sig
        )
        _update(i, dist)

    return {
        "mp": matrix_profile,
        "pi": profile_index,
        "rmp": right_matrix_profile,
        "rpi": right_profile_index,
        "lmp": left_matrix_profile,
        "lpi": left_profile_index,
        "metric": "euclidean",
        "w": window_size,
        "ez": exclusion_zone,
        "join": is_join,
        "sample_pct": 1,
        "algorithm": "stomp",
    }
