"""MPX: exact matrix profile via the diagonal covariance recurrence (no FFT).

Numerical-parity target: reference cympx.pyx:30-119 (self-join) and
cympx.pyx:125-284 (AB join), wrapper mpx.py:20-100. The reference streams a
scalar covariance along each diagonal in Cython/OpenMP; here the same
recurrence is vectorized as a *cumulative sum along each diagonal*, processed
in blocks of diagonals so every step is a large numpy kernel:

    cov(d, o) = cov(d, 0) + Σ_{k=1..o} df[k]·dg[k+d] + df[k+d]·dg[k]
    corr(o, o+d) = cov(d, o) · sig[o] · sig[o+d]

Tie-breaking matches the reference's sequential update order exactly
(diagonals ascending; within one diagonal the "col" update at offset o-d
precedes the "row" update at offset o), which the tiny-fixture index arrays
(tests/test_mpx.py:24-105) are sensitive to.
"""

from __future__ import annotations

import math

import numpy as np

from matrixprofile_ray.core.moving import muinvn, rolling_window

__all__ = ["mpx", "mpx_ab"]

# Cap on temporary cells per diagonal block (each temp is ~8 bytes/cell).
_BLOCK_CELLS = 4_000_000


def _diffs(ts: np.ndarray, mu: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """The df/dg difference series driving the O(1) covariance update."""
    n = ts.shape[0]
    plen = n - w + 1
    df = np.zeros(plen, dtype="d")
    dg = np.zeros(plen, dtype="d")
    if plen > 1:
        df[1:] = 0.5 * (ts[w:] - ts[:n - w])
        dg[1:] = (ts[w:] - mu[1:]) + (ts[:n - w] - mu[:plen - 1])
    return df, dg


def _first_cov(
    ts_outer: np.ndarray,
    mu_outer: np.ndarray,
    diags: np.ndarray,
    inner_window: np.ndarray,
    w: int,
) -> np.ndarray:
    """cov(d, 0) for a block of diagonals: centered window dot products."""
    wins = rolling_window(ts_outer, w)[diags] - mu_outer[diags, None]
    return wins @ inner_window


def _scatter_by_diag(
    corr: np.ndarray, diags: np.ndarray, out_len: int
) -> np.ndarray:
    """Shift row j of ``corr`` right by diags[j] into an (B, out_len) matrix.

    Invalid cells land in a sacrificial extra column. corr must already hold
    -inf at invalid cells.
    """
    nblk, width = corr.shape
    offs = np.arange(width)
    idx = diags[:, None] + offs[None, :]
    idx[idx >= out_len] = out_len  # dummy column
    shifted = np.full((nblk, out_len + 1), -np.inf, dtype="d")
    shifted[np.arange(nblk)[:, None], idx] = corr
    return shifted[:, :out_len]


def _block_corr(
    diags: np.ndarray,
    cov0: np.ndarray,
    df_o: np.ndarray,
    dg_o: np.ndarray,
    sig_o: np.ndarray,
    df_i: np.ndarray,
    dg_i: np.ndarray,
    sig_i: np.ndarray,
    width: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Correlations for a block of diagonals.

    Row j holds corr(offset, offset + diags[j]) for offsets 0..len_j-1 where
    len_j is bounded by both the outer and inner profile lengths; invalid
    cells are -inf. Returns (corr, valid mask).

    The outer series indexes by ``offset + diag`` (suffix _o), the inner one
    by ``offset`` (suffix _i); for a self join they are the same arrays.
    """
    out_len = sig_o.shape[0]
    offs = np.arange(width)
    idx = diags[:, None] + offs[None, :]
    valid = (idx < out_len) & (offs[None, :] < sig_i.shape[0])
    idx_c = np.minimum(idx, out_len - 1)

    inc = df_i[offs][None, :] * dg_o[idx_c] + df_o[idx_c] * dg_i[offs][None, :]
    inc[:, 0] = 0.0
    inc[~valid] = 0.0
    cov = np.cumsum(inc, out=inc, axis=1)
    cov += cov0[:, None]
    corr = cov * sig_i[offs][None, :] * sig_o[idx_c]
    corr[~valid] = -np.inf
    return corr, valid


def _merge_candidates(
    run_v: np.ndarray, run_i: np.ndarray, cand_v: np.ndarray, cand_i: np.ndarray
) -> None:
    """Strict-> merge so earlier (lower-diagonal) candidates win ties."""
    upd = cand_v > run_v
    run_v[upd] = cand_v[upd]
    run_i[upd] = cand_i[upd]


def mpx(
    ts: np.ndarray, w: int, cross_correlation: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile. Returns ``(mp, mpi)``.

    Distances are z-normalized Euclidean unless ``cross_correlation`` is set
    (then Pearson correlations clamped to [..,1]). minlag is ceil(w/4) as in
    the reference (cympx.pyx:58).
    """
    ts = np.asarray(ts, dtype="d")
    n = ts.shape[0]
    plen = n - w + 1
    minlag = int(math.ceil(w / 4.0))

    mu, sig = muinvn(ts, w)
    df, dg = _diffs(ts, mu, w)

    run_v = np.full(plen, -1.0, dtype="d")
    run_i = np.full(plen, -1, dtype=np.int64)

    first_diag = minlag + 1
    if first_diag < plen:
        inner_win = ts[:w] - mu[0]
        block = max(1, _BLOCK_CELLS // max(1, plen))
        for d0 in range(first_diag, plen, block):
            d1 = min(plen, d0 + block)
            diags = np.arange(d0, d1)
            width = plen - d0
            cov0 = _first_cov(ts, mu, diags, inner_win, w)
            corr, valid = _block_corr(
                diags, cov0, df, dg, sig, df, dg, sig, width
            )

            # row role: position = offset, neighbor = offset + diag
            row_j = np.argmax(corr, axis=0)
            cols = np.arange(width)
            row_v = corr[row_j, cols]
            row_d = diags[row_j]
            row_nbr = cols + row_d

            # col role: position = offset + diag, neighbor = offset
            shifted = _scatter_by_diag(corr, diags, plen)
            col_j = np.argmax(shifted, axis=0)
            pos = np.arange(plen)
            col_v = shifted[col_j, pos]
            col_d = diags[col_j]
            col_nbr = pos - col_d

            # within a diagonal the col update precedes the row update, so on
            # exact ties the col candidate wins when its diagonal is <= —
            # reproduce by preferring col unless the row value strictly wins
            # or ties from a smaller diagonal.
            cand_v = col_v.copy()
            cand_i = col_nbr.copy()
            rv = np.full(plen, -np.inf)
            rv[:width] = row_v
            ri = np.full(plen, -1, dtype=np.int64)
            ri[:width] = row_nbr
            rd = np.full(plen, np.iinfo(np.int64).max, dtype=np.int64)
            rd[:width] = row_d
            use_row = (rv > cand_v) | ((rv == cand_v) & (rd < col_d))
            cand_v[use_row] = rv[use_row]
            cand_i[use_row] = ri[use_row]

            _merge_candidates(run_v, run_i, cand_v, cand_i)

    np.minimum(run_v, 1.0, out=run_v)
    if cross_correlation:
        return run_v, run_i
    return np.sqrt(2.0 * w * (1.0 - run_v)), run_i


def _half_join(
    outer: np.ndarray,
    mu_o: np.ndarray,
    sig_o: np.ndarray,
    df_o: np.ndarray,
    dg_o: np.ndarray,
    inner: np.ndarray,
    mu_i: np.ndarray,
    sig_i: np.ndarray,
    df_i: np.ndarray,
    dg_i: np.ndarray,
    w: int,
    run_vo: np.ndarray,
    run_io: np.ndarray,
    run_vi: np.ndarray,
    run_ii: np.ndarray,
) -> None:
    """One direction of the AB join (reference cympx.pyx:195-214).

    Diagonal d starts at position d of the outer series and position 0 of the
    inner; outer positions get inner neighbors and vice versa.
    """
    plen_o = sig_o.shape[0]
    plen_i = sig_i.shape[0]
    width = min(plen_o, plen_i)
    block = max(1, _BLOCK_CELLS // max(1, max(width, plen_o)))
    inner_win = inner[:w] - mu_i[0]

    for d0 in range(0, plen_o, block):
        d1 = min(plen_o, d0 + block)
        diags = np.arange(d0, d1)
        cov0 = _first_cov(outer, mu_o, diags, inner_win, w)
        corr, _ = _block_corr(
            diags, cov0, df_o, dg_o, sig_o, df_i, dg_i, sig_i, width
        )

        # inner-side: position = offset, neighbor = offset + diag
        row_j = np.argmax(corr, axis=0)
        cols = np.arange(width)
        row_v = corr[row_j, cols]
        row_nbr = cols + diags[row_j]
        _merge_candidates(
            run_vi[:width], run_ii[:width], row_v, row_nbr
        )

        # outer-side: position = offset + diag, neighbor = offset
        shifted = _scatter_by_diag(corr, diags, plen_o)
        col_j = np.argmax(shifted, axis=0)
        pos = np.arange(plen_o)
        col_v = shifted[col_j, pos]
        col_nbr = pos - diags[col_j]
        _merge_candidates(run_vo, run_io, col_v, col_nbr)


def mpx_ab(
    ts: np.ndarray, query: np.ndarray, w: int, cross_correlation: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """AB similarity join. Returns ``(mp, mpi, mpb, mpib)``.

    Every subsequence of ``ts`` is matched against its nearest neighbor in
    ``query`` and vice versa (reference cympx.pyx:125-284). Positions with no
    candidate become +inf (Euclidean) / stay -1 (cross correlation).
    """
    ts = np.asarray(ts, dtype="d")
    query = np.asarray(query, dtype="d")
    plen_a = ts.shape[0] - w + 1
    plen_b = query.shape[0] - w + 1

    mua, siga = muinvn(ts, w)
    mub, sigb = muinvn(query, w)
    dfa, dga = _diffs(ts, mua, w)
    dfb, dgb = _diffs(query, mub, w)

    mp = np.full(plen_a, -1.0, dtype="d")
    mpi = np.full(plen_a, -1, dtype=np.int64)
    mpb = np.full(plen_b, -1.0, dtype="d")
    mpib = np.full(plen_b, -1, dtype=np.int64)

    # AB pass: diagonals anchored on ts; then BA pass anchored on query.
    # The sequential reference runs AB fully before BA, so AB wins exact ties.
    _half_join(ts, mua, siga, dfa, dga, query, mub, sigb, dfb, dgb, w,
               mp, mpi, mpb, mpib)
    _half_join(query, mub, sigb, dfb, dgb, ts, mua, siga, dfa, dga, w,
               mpb, mpib, mp, mpi)

    if cross_correlation:
        np.minimum(mp, 1.0, out=mp)
        np.minimum(mpb, 1.0, out=mpb)
        return mp, mpi, mpb, mpib

    for arr in (mp, mpb):
        none = arr == -1.0
        np.minimum(arr, 1.0, out=arr)
        arr[:] = np.sqrt(2.0 * w * (1.0 - arr))
        arr[none] = np.inf
    return mp, mpi, mpb, mpib
