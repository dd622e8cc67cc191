"""Optional C fast path for the MPX diagonal recurrence.

The numpy block kernel (mpx.py) makes ~13 full passes over O(block)
scratch per diagonal block; under a 24-actor pool that saturates memory
bandwidth and caps cluster scaling. The scalar diagonal-streaming loop
below touches O(n) state once per cell — compute-bound, so actor pools
scale linearly with cores.

Compiled on first import with the system C compiler into the package dir
(shared by every Ray worker on the node via the filesystem; an O_EXCL
lock file keeps concurrent workers from racing the compile). If no
compiler is available the import fails soft and callers fall back to the
numpy kernel — results are identical either way (same update order and
tie-breaking; parity-tested in tests/test_kernels.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import time

import numpy as np

__all__ = ["native_mpx_self", "native_mpx_ab", "available"]

_SRC = r"""
#include <stdint.h>

/* Self-join: diagonals ascending over [first_diag, last_diag); within a
   diagonal, offsets ascending; strict > updates reproduce the numpy
   kernel's (col-before-row, earlier-diagonal-wins) tie-breaking exactly.
   A partial diagonal range yields a partial profile that left-fold
   merges (strict >, ascending ranges) into the full profile — the
   distributed fan-out path for one giant series. */
void mpx_self(const double *ts, const double *mu, const double *sig,
              const double *df, const double *dg,
              int64_t plen, int64_t w, int64_t first_diag, int64_t last_diag,
              double *mp, int64_t *mpi)
{
    if (last_diag > plen) last_diag = plen;
    for (int64_t d = first_diag; d < last_diag; d++) {
        double cov = 0.0;
        for (int64_t k = 0; k < w; k++)
            cov += (ts[d + k] - mu[d]) * (ts[k] - mu[0]);
        int64_t lim = plen - d;
        for (int64_t o = 0; o < lim; o++) {
            if (o)
                cov += df[o] * dg[o + d] + df[o + d] * dg[o];
            double corr = cov * sig[o] * sig[o + d];
            if (corr > mp[o])     { mp[o] = corr;     mpi[o] = o + d; }
            if (corr > mp[o + d]) { mp[o + d] = corr; mpi[o + d] = o; }
        }
    }
}

/* One AB sweep: outer series indexed at o+d, inner at o. Call twice with
   roles swapped for the full similarity join. */
void mpx_ab_sweep(const double *outer, const double *mu_o, const double *sig_o,
                  const double *df_o, const double *dg_o, int64_t plen_o,
                  const double *inner, const double *mu_i, const double *sig_i,
                  const double *df_i, const double *dg_i, int64_t plen_i,
                  int64_t w,
                  double *mp_o, int64_t *mpi_o,
                  double *mp_i, int64_t *mpi_i)
{
    for (int64_t d = 0; d < plen_o; d++) {
        double cov = 0.0;
        for (int64_t k = 0; k < w; k++)
            cov += (outer[d + k] - mu_o[d]) * (inner[k] - mu_i[0]);
        int64_t lim = plen_o - d;
        if (plen_i < lim) lim = plen_i;
        for (int64_t o = 0; o < lim; o++) {
            if (o)
                cov += df_i[o] * dg_o[o + d] + df_o[o + d] * dg_i[o];
            double corr = cov * sig_i[o] * sig_o[o + d];
            if (corr > mp_i[o])     { mp_i[o] = corr;     mpi_i[o] = o + d; }
            if (corr > mp_o[o + d]) { mp_o[o + d] = corr; mpi_o[o + d] = o; }
        }
    }
}
"""

_LIB = None


def _build_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


# versioned filename: the ABI changed when last_diag was added — a stale
# cached .so from an older signature must never be dlopen'ed
_SO_NAME = "_native_mpx_v2.so"


def _compile() -> str | None:
    out = os.path.join(_build_dir(), _SO_NAME)
    if os.path.exists(out):
        return out
    lock = out + ".lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        # another worker is compiling; wait briefly for it
        for _ in range(100):
            if os.path.exists(out):
                return out
            time.sleep(0.1)
        return None
    try:
        with tempfile.NamedTemporaryFile(
            "w", suffix=".c", delete=False, dir=_build_dir()
        ) as fh:
            fh.write(_SRC)
            src = fh.name
        for cc in ("cc", "gcc", "clang"):
            try:
                res = subprocess.run(
                    [cc, "-O3", "-fPIC", "-shared", "-o", out + ".tmp", src],
                    capture_output=True,
                    timeout=60,
                )
            except FileNotFoundError:
                continue
            if res.returncode == 0:
                os.replace(out + ".tmp", out)
                break
        os.unlink(src)
        return out if os.path.exists(out) else None
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _compile()
    if path is None:
        _LIB = False
        return _LIB
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return _LIB
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.mpx_self.argtypes = [dp, dp, dp, dp, dp, i64, i64, i64, i64, dp, ip]
    lib.mpx_self.restype = None
    lib.mpx_ab_sweep.argtypes = [
        dp, dp, dp, dp, dp, i64,
        dp, dp, dp, dp, dp, i64,
        i64, dp, ip, dp, ip,
    ]
    lib.mpx_ab_sweep.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _pi(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_mpx_self(ts, mu, sig, df, dg, w, first_diag, mp, mpi,
                    last_diag: int | None = None) -> bool:
    lib = _load()
    if not lib:
        return False
    if last_diag is None:
        last_diag = len(mu)
    lib.mpx_self(
        _p(ts), _p(mu), _p(sig), _p(df), _p(dg),
        ctypes.c_int64(len(mu)), ctypes.c_int64(w),
        ctypes.c_int64(first_diag), ctypes.c_int64(last_diag),
        _p(mp), _pi(mpi),
    )
    return True


def native_mpx_ab(outer, mu_o, sig_o, df_o, dg_o,
                  inner, mu_i, sig_i, df_i, dg_i,
                  w, mp_o, mpi_o, mp_i, mpi_i) -> bool:
    lib = _load()
    if not lib:
        return False
    lib.mpx_ab_sweep(
        _p(outer), _p(mu_o), _p(sig_o), _p(df_o), _p(dg_o),
        ctypes.c_int64(len(mu_o)),
        _p(inner), _p(mu_i), _p(sig_i), _p(df_i), _p(dg_i),
        ctypes.c_int64(len(mu_i)),
        ctypes.c_int64(w),
        _p(mp_o), _pi(mpi_o), _p(mp_i), _pi(mpi_i),
    )
    return True
