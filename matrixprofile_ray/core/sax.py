"""SAX / PAA symbolization of rolled-up series.

Engine-added time-series operator (no reference counterpart —
matrixprofile has no symbolic discretization; this complements the
rollup/downsample tiers per Lin et al.'s published SAX construction:
z-normalize, Piecewise Aggregate Approximation, Gaussian-breakpoint
alphabet).

Two entry points:

- :func:`paa` / :func:`sax_symbols` — float kernels for library use on
  arbitrary float64 series (vectorized numpy, per-series).
- :func:`sax_symbols_exact` — the ORACLE-GRADE path over integer
  micro-unit bucket sums (the rollup tier's ``sum_mu`` column). Every
  intermediate is derived from exact int64/arbitrary-precision integer
  sums with one final correctly-rounded double op per step, in the same
  expression shape DuckDB evaluates, so the emitted symbol string is
  bit-reproducible against a SQL mirror under any partitioning:

      mu    = double(s) / n                   (s = Σx, exact int)
      var   = double(ssq·n − s²) / (n·n)      (ssq = Σx², exact int)
      sigma = sqrt(var)                        (IEEE correctly rounded)
      paa_k = (double(S_k)/L_k − mu) / sigma   (S_k = segment int sum)

  Segment assignment is integer math: element i of n belongs to
  segment ``i·S // n``. A constant series (sigma == 0) emits all 'b'.

Alphabet-4 breakpoints are the standard N(0,1) quartiles
(−0.6745, 0, 0.6745) as double literals shared with the SQL mirror.
At 100-TB scale this runs per key on ROLLED series (≤ ~1e5 buckets per
retention tier), inside the same partitioned per-key kernels as the
matrix-profile stages — never over raw events.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["paa", "sax_symbols", "sax_symbols_exact", "BREAKPOINTS_4"]

BREAKPOINTS_4 = (-0.6745, 0.0, 0.6745)
_ALPHA = "abcd"


def _segment_bounds(n: int, n_segments: int) -> np.ndarray:
    """First element index of each segment under i*S//n assignment."""
    i = np.arange(n, dtype=np.int64)
    return i * n_segments // n


def paa(values: np.ndarray, n_segments: int) -> np.ndarray:
    """Piecewise Aggregate Approximation: mean of each of ``n_segments``
    contiguous segments (element i -> segment i*S//n). Vectorized via
    bincount; returns float64[n_segments]."""
    x = np.asarray(values, dtype="d")
    n = len(x)
    if n < n_segments:
        raise ValueError(f"series length {n} < n_segments {n_segments}")
    seg = _segment_bounds(n, n_segments)
    sums = np.bincount(seg, weights=x, minlength=n_segments)
    counts = np.bincount(seg, minlength=n_segments)
    return sums / counts


def sax_symbols(values: np.ndarray, n_segments: int = 16) -> str:
    """Float-path SAX word (alphabet 4): z-normalize (population std),
    PAA, Gaussian-quartile breakpoints. Constant series -> all 'b'."""
    x = np.asarray(values, dtype="d")
    sd = x.std()
    if sd == 0.0 or not np.isfinite(sd):
        return "b" * n_segments
    z = (x - x.mean()) / sd
    p = paa(z, n_segments)
    return "".join(_ALPHA[int(np.searchsorted(BREAKPOINTS_4, v, "right"))]
                   for v in p)


def sax_symbols_exact(micro: np.ndarray, n_segments: int = 16) -> str:
    """Oracle-grade SAX word over integer micro-unit sums (see module
    docstring for the exact-arithmetic contract). ``micro`` must be an
    integer array ordered by bucket timestamp."""
    x = np.asarray(micro)
    if not np.issubdtype(x.dtype, np.integer):
        raise ValueError("sax_symbols_exact requires integer micro-units")
    n = len(x)
    if n < n_segments:
        raise ValueError(f"series length {n} < n_segments {n_segments}")

    # exact integer moments (arbitrary precision: ssq*n can pass 2^63)
    xs = [int(v) for v in x]
    s = sum(xs)
    ssq = sum(v * v for v in xs)
    num = ssq * n - s * s          # exact integer, >= 0
    mu = float(s) / float(n)       # double(s) exact for |s| < 2^53
    var = float(num) / float(n * n)
    sigma = math.sqrt(var)
    if sigma == 0.0:
        return "b" * n_segments

    seg = _segment_bounds(n, n_segments)
    out = []
    for k in range(n_segments):
        lo = int(np.searchsorted(seg, k, "left"))
        hi = int(np.searchsorted(seg, k, "right"))
        s_k = sum(xs[lo:hi])
        z = (float(s_k) / float(hi - lo) - mu) / sigma
        # mirror of SQL: CASE WHEN z < -0.6745 ... (strict < at each bp)
        if z < BREAKPOINTS_4[0]:
            out.append("a")
        elif z < BREAKPOINTS_4[1]:
            out.append("b")
        elif z < BREAKPOINTS_4[2]:
            out.append("c")
        else:
            out.append("d")
    return "".join(out)
