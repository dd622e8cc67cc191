"""MPX: exact matrix profile via the diagonal covariance recurrence (no FFT).

Numerical-parity target: reference cympx.pyx:30-119 (self-join) and
cympx.pyx:125-284 (AB join), wrapper mpx.py:20-100. The reference streams a
scalar covariance along each diagonal in Cython/OpenMP; here the same
recurrence is vectorized as a *cumulative sum along each diagonal*, processed
in blocks of diagonals so every step is a large numpy kernel:

    cov(d, o) = cov(d, 0) + Σ_{k=1..o} df[k]·dg[k+d] + df[k+d]·dg[k]
    corr(o, o+d) = cov(d, o) · sig[o] · sig[o+d]

All shifted-array accesses are contiguous slices (diagonal d reads
dg[d:d+len]), so the block matrices are built with memcpy slice assignments
into preallocated buffers — no fancy indexing in the hot path.

Tie-breaking matches the reference's sequential update order exactly
(diagonals ascending; within one diagonal the "col" update at offset o-d
precedes the "row" update at offset o), which the tiny-fixture index arrays
(tests/test_mpx.py:24-105) are sensitive to.

Intentional divergence vs reference cympx.pyx:96-101: the reference clamps
the col-role candidate correlation to 1.0 INSIDE the sweep, so on degenerate
near-constant windows (numerical corr > 1) its index can pick whichever
candidate hit 1.0 first; here raw correlations merge unclamped (clamp once
at the end), so the index picks the numerically largest. Distances are
identical after the final clamp; only the neighbor INDEX on corr>1.0
degeneracies can differ. Chosen deliberately: the merge stays branch-free
and the unclamped argmax is at least as meaningful.
"""

from __future__ import annotations

import math

import numpy as np

from matrixprofile_ray.core.moving import muinvn, rolling_window

__all__ = ["mpx", "mpx_ab", "mpx_partial"]

# Cap on temporary cells per diagonal block (each temp ~8 bytes/cell) and on
# rows per block (keeps the scratch allocation small for short series —
# allocation churn, not compute, dominated the kernel below ~2k points).
_BLOCK_CELLS = 2_000_000
_BLOCK_ROWS = 192


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


class _Scratch:
    """Preallocated per-block buffers, reused across blocks/calls."""

    def __init__(self, nrows: int, width: int, out_len: int):
        self.nrows = nrows
        self.width = width
        self.out_len = out_len
        self.sh_dg = np.empty((nrows, width))
        self.sh_df = np.empty((nrows, width))
        self.sh_sig = np.zeros((nrows, width))
        self.corr = np.empty((nrows, width))
        self.shifted = np.full((nrows, out_len), -np.inf)

    def fits(self, nrows: int, width: int, out_len: int) -> bool:
        return (
            nrows <= self.nrows and width <= self.width
            and out_len <= self.out_len
        )


_SCRATCH_CACHE: list = []  # one reusable scratch per worker process


def _get_scratch(nrows: int, width: int, out_len: int) -> _Scratch:
    """Process-local scratch reuse: actor pools call the kernel once per
    series row, and same-tier series share shapes — reallocating ~20 MB per
    call was the dominant cost for short series."""
    if _SCRATCH_CACHE and _SCRATCH_CACHE[0].fits(nrows, width, out_len):
        return _SCRATCH_CACHE[0]
    scratch = _Scratch(nrows, width, out_len)
    _SCRATCH_CACHE.clear()
    _SCRATCH_CACHE.append(scratch)
    return scratch


def _block_corr(
    scratch: _Scratch,
    diags: np.ndarray,
    cov0: np.ndarray,
    df_o: np.ndarray,
    dg_o: np.ndarray,
    sig_o: np.ndarray,
    df_i: np.ndarray,
    dg_i: np.ndarray,
    sig_i: np.ndarray,
    width: int,
) -> np.ndarray:
    """Correlation block: row j holds corr(o, o + diags[j]) padded with -inf.

    Outer series is indexed at o + diag (suffix _o), inner at o (suffix _i);
    self-joins pass the same arrays for both.
    """
    nblk = len(diags)
    plen_o = sig_o.shape[0]
    sh_dg = scratch.sh_dg[:nblk, :width]
    sh_df = scratch.sh_df[:nblk, :width]
    sh_sig = scratch.sh_sig[:nblk, :width]
    corr = scratch.corr[:nblk, :width]

    lens = np.minimum(plen_o - diags, sig_i.shape[0])
    for j in range(nblk):
        d, ln = int(diags[j]), int(lens[j])
        sh_dg[j, :ln] = dg_o[d : d + ln]
        sh_df[j, :ln] = df_o[d : d + ln]
        sh_sig[j, :ln] = sig_o[d : d + ln]
        if ln < width:
            # zero padding: keeps the (overwritten-below) suffix finite so
            # cumsum/multiply don't spew NaN warnings
            sh_dg[j, ln:] = 0.0
            sh_df[j, ln:] = 0.0
            sh_sig[j, ln:] = 0.0

    # inc = df_i·dg_o[shift] + df_o[shift]·dg_i, cumulative along the diagonal
    np.multiply(sh_dg, df_i[:width][None, :], out=corr)
    sh_df *= dg_i[:width][None, :]
    corr += sh_df
    corr[:, 0] = 0.0
    np.cumsum(corr, axis=1, out=corr)
    corr += cov0[:, None]
    corr *= sh_sig
    corr *= sig_i[:width][None, :]
    for j in range(nblk):  # invalid suffix → -inf (argmax never picks it)
        ln = int(lens[j])
        if ln < width:
            corr[j, ln:] = -np.inf
    return corr


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


def _merge_block(
    corr: np.ndarray,
    diags: np.ndarray,
    width: int,
    plen_o: int,
    scratch: _Scratch,
    run_vo: np.ndarray,
    run_io: np.ndarray,
    run_vi: np.ndarray,
    run_ii: np.ndarray,
    self_join: bool,
) -> None:
    """Fold a correlation block into the running profiles (strict-> merge).

    Inner side ("row role"): position o, neighbor o + d.
    Outer side ("col role"): position o + d, neighbor o.
    """
    nblk = len(corr)
    cols = np.arange(width)

    row_j = np.argmax(corr, axis=0)
    row_v = corr[row_j, cols]
    row_d = diags[row_j]
    row_nbr = cols + row_d

    shifted = scratch.shifted[:nblk, :plen_o]
    shifted.fill(-np.inf)
    lens = np.minimum(plen_o - diags, width)
    for j in range(nblk):
        d, ln = int(diags[j]), int(lens[j])
        shifted[j, d : d + ln] = corr[j, :ln]
    col_j = np.argmax(shifted, axis=0)
    pos = np.arange(plen_o)
    col_v = shifted[col_j, pos]
    col_d = diags[col_j]
    col_nbr = pos - col_d

    if self_join:
        # combine roles with the reference's in-diagonal ordering: on exact
        # ties the col update (earlier in the offset sweep) wins unless the
        # row candidate came from a strictly smaller diagonal
        cand_v = col_v
        cand_i = col_nbr
        rv = np.full(plen_o, -np.inf)
        rv[:width] = row_v
        ri = np.empty(plen_o, dtype=np.int64)
        ri[:width] = row_nbr
        rd = np.full(plen_o, np.iinfo(np.int64).max, dtype=np.int64)
        rd[:width] = row_d
        use_row = (rv > cand_v) | ((rv == cand_v) & (rd < col_d))
        cand_v = np.where(use_row, rv, cand_v)
        cand_i = np.where(use_row, ri, cand_i)
        upd = cand_v > run_vo
        run_vo[upd] = cand_v[upd]
        run_io[upd] = cand_i[upd]
    else:
        upd = row_v > run_vi[:width]
        run_vi[:width][upd] = row_v[upd]
        run_ii[:width][upd] = row_nbr[upd]
        upd = col_v > run_vo
        run_vo[upd] = col_v[upd]
        run_io[upd] = col_nbr[upd]


def _sweep(
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
    first_diag: int,
    run_vo: np.ndarray,
    run_io: np.ndarray,
    run_vi: np.ndarray,
    run_ii: np.ndarray,
    self_join: bool,
    last_diag: int | None = None,
) -> None:
    plen_o = sig_o.shape[0]
    plen_i = sig_i.shape[0]
    if last_diag is None or last_diag > plen_o:
        last_diag = plen_o
    if first_diag >= last_diag:
        return
    width = min(plen_o - (first_diag if self_join else 0), plen_i)
    block = max(1, min(_BLOCK_ROWS, _BLOCK_CELLS // max(1, max(width, plen_o))))
    scratch = _get_scratch(block, width, plen_o)
    inner_win = inner[:w] - mu_i[0]

    for d0 in range(first_diag, last_diag, block):
        d1 = min(last_diag, d0 + block)
        diags = np.arange(d0, d1)
        bw = min(width, plen_o - d0)
        cov0 = _first_cov(outer, mu_o, diags, inner_win, w)
        corr = _block_corr(
            scratch, diags, cov0, df_o, dg_o, sig_o, df_i, dg_i, sig_i, bw
        )
        _merge_block(
            corr, diags, bw, plen_o, scratch,
            run_vo, run_io, run_vi, run_ii, self_join,
        )


def mpx(
    ts: np.ndarray, w: int, cross_correlation: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile. Returns ``(mp, mpi)``.

    Distances are z-normalized Euclidean unless ``cross_correlation`` is set
    (Pearson clamped to ≤1). minlag is ceil(w/4) as in the reference
    (cympx.pyx:58).
    """
    ts = np.asarray(ts, dtype="d")
    n = ts.shape[0]
    plen = n - w + 1
    minlag = int(math.ceil(w / 4.0))

    mu, sig = muinvn(ts, w)
    df, dg = _diffs(ts, mu, w)

    run_v = np.full(plen, -1.0, dtype="d")
    run_i = np.full(plen, -1, dtype=np.int64)

    from matrixprofile_ray.core import _native

    if not _native.native_mpx_self(
        np.ascontiguousarray(ts), mu, sig, df, dg, w, minlag + 1, run_v, run_i
    ):
        _sweep(
            ts, mu, sig, df, dg, ts, mu, sig, df, dg, w,
            minlag + 1, run_v, run_i, run_v, run_i, self_join=True,
        )

    np.minimum(run_v, 1.0, out=run_v)
    if cross_correlation:
        return run_v, run_i
    return np.sqrt(2.0 * w * (1.0 - run_v)), run_i


def mpx_partial(
    ts: np.ndarray, w: int, diag_lo: int, diag_hi: int
) -> tuple[np.ndarray, np.ndarray]:
    """Partial self-join over diagonals [diag_lo, diag_hi) — the fan-out
    unit for distributing ONE giant series across Ray tasks (reference
    cympx.pyx:104-112 splits the same diagonal loop across OpenMP threads
    and merges thread-local profiles).

    Returns RAW Pearson partials ``(run_v, run_i)`` (unclamped, -1 where no
    candidate). Merging rule (see ``stages/giant.py``): left-fold partials
    in ascending diag_lo order with strict ``>`` — later partials win only
    strictly — which reproduces the sequential kernel's earlier-diagonal
    tie-breaking, so the merged profile is bit-identical to ``mpx``.
    diag_lo must be ≥ minlag+1 = ceil(w/4)+1 (the caller slices the valid
    diagonal space once).
    """
    ts = np.asarray(ts, dtype="d")
    n = ts.shape[0]
    plen = n - w + 1
    diag_hi = min(diag_hi, plen)

    mu, sig = muinvn(ts, w)
    df, dg = _diffs(ts, mu, w)

    run_v = np.full(plen, -1.0, dtype="d")
    run_i = np.full(plen, -1, dtype=np.int64)
    if diag_lo >= diag_hi:
        return run_v, run_i

    from matrixprofile_ray.core import _native

    if not _native.native_mpx_self(
        np.ascontiguousarray(ts), mu, sig, df, dg, w, diag_lo, run_v, run_i,
        last_diag=diag_hi,
    ):
        _sweep(
            ts, mu, sig, df, dg, ts, mu, sig, df, dg, w,
            diag_lo, run_v, run_i, run_v, run_i, self_join=True,
            last_diag=diag_hi,
        )
    return run_v, run_i


def mpx_ab(
    ts: np.ndarray, query: np.ndarray, w: int, cross_correlation: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """AB similarity join. Returns ``(mp, mpi, mpb, mpib)``.

    Every subsequence of ``ts`` is matched against its nearest neighbor in
    ``query`` and vice versa (reference cympx.pyx:125-284). Positions with no
    candidate become +inf (Euclidean) / stay -1 (cross correlation). The
    sequential reference runs the AB pass fully before BA, so AB wins exact
    ties — preserved by the strict-> merges here.
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

    from matrixprofile_ray.core import _native

    ts_c = np.ascontiguousarray(ts)
    q_c = np.ascontiguousarray(query)
    if _native.native_mpx_ab(ts_c, mua, siga, dfa, dga,
                             q_c, mub, sigb, dfb, dgb,
                             w, mp, mpi, mpb, mpib):
        _native.native_mpx_ab(q_c, mub, sigb, dfb, dgb,
                              ts_c, mua, siga, dfa, dga,
                              w, mpb, mpib, mp, mpi)
    else:
        _sweep(ts, mua, siga, dfa, dga, query, mub, sigb, dfb, dgb, w,
               0, mp, mpi, mpb, mpib, self_join=False)
        _sweep(query, mub, sigb, dfb, dgb, ts, mua, siga, dfa, dga, w,
               0, mpb, mpib, mp, mpi, self_join=False)

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
