"""Sequential time-series operators over rolled-up bucket series:
EWMA forecasting, one-sided CUSUM changepoint alarms, and LTTB
(largest-triangle-three-buckets) downsampling.

Engine-added operators (no reference counterpart — matrixprofile has no
forecasting/changepoint/visual-downsample surface; these complement the
rollup + downsample + retention tiers). All three are inherently
sequential recurrences, so they run per series inside partitioned
per-key kernels — at corpus scale each series is a ROLLED tier
(≤ ~1e5 buckets), never raw events.

ORACLE-GRADE arithmetic contract (mirrors the recursive-CTE SQL twins):
inputs are exact int64 bucket counts (doubles exactly representable),
every recurrence step applies the same literal double expression the
SQL mirror evaluates — EWMA uses alpha=0.25 (exact binary fraction, so
0.25*x + 0.75*e is two exact-input multiplies and one add in both
engines), CUSUM normalizes with the exact-integer mu/sigma derivation
shared with core/sax.py, and LTTB compares triangle areas built from
integer indices and int-exact bucket means. Results are therefore
bit-reproducible against DuckDB under any partitioning, including the
discrete argmax picks (first-max tie-break both sides).
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["ewma", "cusum_alarms", "lttb_indices", "exact_mu_sigma",
           "ols_trend", "acf"]


def exact_mu_sigma(x_int) -> tuple[float, float]:
    """Population mean/std from exact integer sums (one correctly-rounded
    double op per step; same expression shape as the SQL mirror —
    see core/sax.py for the derivation)."""
    xs = [int(v) for v in x_int]
    n = len(xs)
    s = sum(xs)
    ssq = sum(v * v for v in xs)
    mu = float(s) / float(n)
    sigma = math.sqrt(float(ssq * n - s * s) / float(n * n))
    return mu, sigma


def ewma(x_int, alpha: float = 0.25) -> tuple[float, int]:
    """Exponentially weighted moving average over integer bucket counts.

    e_0 = x_0; e_i = alpha*x_i + (1-alpha)*e_{i-1}.

    Returns (final EWMA value, number of points i>=1 with
    x_i > e_{i-1} — "above forecast" count). ``alpha`` should be an
    exact binary fraction (default 0.25) for the bit-reproducibility
    contract.
    """
    xs = np.asarray(x_int)
    if not np.issubdtype(xs.dtype, np.integer):
        raise ValueError("ewma expects integer bucket counts")
    if len(xs) == 0:
        raise ValueError("empty series")
    beta = 1.0 - alpha
    e = float(xs[0])
    n_above = 0
    for v in xs[1:]:
        fv = float(v)
        if fv > e:
            n_above += 1
        e = alpha * fv + beta * e
    return e, n_above


def cusum_alarms(x_int, k: float = 0.5, h: float = 5.0):
    """One-sided upper CUSUM over z-normalized integer bucket counts.

    z_i = (x_i - mu)/sigma with the exact-integer mu/sigma;
    S_0 = max(0, z_0 - k); S_i = max(0, S_{i-1} + (z_i - k)).
    Alarm where S_i > h (no reset — alarms count every excursion point).

    Returns (n_alarms, first_alarm_index or -1, max S). A constant
    series (sigma == 0) has z == 0 everywhere.
    """
    xs = np.asarray(x_int)
    if not np.issubdtype(xs.dtype, np.integer):
        raise ValueError("cusum_alarms expects integer bucket counts")
    mu, sigma = exact_mu_sigma(xs)
    s = 0.0
    n_alarms = 0
    first = -1
    s_max = 0.0
    for i, v in enumerate(xs):
        z = 0.0 if sigma == 0.0 else (float(v) - mu) / sigma
        val = (s + (z - k)) if i else (z - k)
        s = val if val > 0.0 else 0.0
        if s > s_max:
            s_max = s
        if s > h:
            n_alarms += 1
            if first < 0:
                first = i
    return n_alarms, first, s_max


def lttb_indices(x_int, n_out: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets downsample pick indices.

    Steinarsson's published construction with a fixed integer bucket
    spec shared with the SQL mirror: first and last points always kept;
    interior points 1..n-2 split into ``n_out - 2`` buckets with
    boundaries start_k = 1 + k*(n-2)//(n_out-2) (integer math, exact
    both engines). Bucket k's pick maximizes the triangle area against
    the previously picked point and the NEXT bucket's mean point
    (mean from exact integer sums; the final bucket pairs with the last
    point); ties break to the smallest index (numpy argmax = SQL
    list_position on the first max).

    Returns the sorted pick indices (length min(n_out, n)).
    """
    xs = np.asarray(x_int)
    if not np.issubdtype(xs.dtype, np.integer):
        raise ValueError("lttb_indices expects integer bucket counts")
    n = len(xs)
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    if n <= n_out:
        return np.arange(n, dtype=np.int64)

    t = n_out - 2
    bounds = [1 + k * (n - 2) // t for k in range(t + 1)]
    picks = [0]
    ia, iy = 0, float(xs[0])
    for k in range(t):
        lo, hi = bounds[k], bounds[k + 1]
        if k + 1 < t:
            nlo, nhi = bounds[k + 1], bounds[k + 2]
            cnt = nhi - nlo
            ax = float(sum(range(nlo, nhi))) / float(cnt)
            ay = float(int(xs[nlo:nhi].sum())) / float(cnt)
        else:
            ax, ay = float(n - 1), float(xs[n - 1])
        j = np.arange(lo, hi, dtype=np.int64)
        yj = xs[lo:hi].astype("d")
        area = np.abs((float(ia) - ax) * (yj - iy)
                      - (float(ia) - j.astype("d")) * (ay - iy))
        pick = lo + int(np.argmax(area))
        picks.append(pick)
        ia, iy = pick, float(xs[pick])
    picks.append(n - 1)
    return np.asarray(picks, dtype=np.int64)


def ols_trend(x_int) -> tuple[float, float]:
    """Least-squares linear trend (slope, intercept) of integer bucket
    counts against their positional index 0..n-1.

    All five sufficient statistics (n, Σx, Σi, Σi·x, Σi²) are exact
    integers (arbitrary precision — n·Σi·x passes 2^53 on long series),
    and the two final expressions round each integer to double BEFORE
    the division/multiplication, in the same order the SQL mirror
    evaluates:

        slope     = double(n·Σix − Σi·Σx) / double(n·Σii − Σi²)
        intercept = (double(Σx) − slope·double(Σi)) / n
    """
    xs = [int(v) for v in np.asarray(x_int)]
    n = len(xs)
    if n < 2:
        raise ValueError("need at least 2 points for a trend")
    sx = sum(xs)
    six = sum(i * v for i, v in enumerate(xs))
    si = n * (n - 1) // 2
    sii = (n - 1) * n * (2 * n - 1) // 6
    slope = float(n * six - si * sx) / float(n * sii - si * si)
    intercept = (float(sx) - slope * float(si)) / float(n)
    return slope, intercept


def acf(x_int, lag: int) -> float:
    """Autocorrelation at ``lag`` of integer bucket counts (the standard
    mean-anchored estimator):

        acf = Σ(x_i−mu)(x_{i+L}−mu) / Σ(x_i−mu)²

    expanded so every sum is an exact integer and the float expression
    matches the SQL mirror term-for-term and in association order:

        num = double(Σ x_i·x_{i+L}) − mu·double(Σhead + Σtail)
              + (double(n−L)·mu)·mu
        den = double(Σx²) − (double(n)·mu)·mu
    """
    xs = [int(v) for v in np.asarray(x_int)]
    n = len(xs)
    if not 0 < lag < n:
        raise ValueError(f"lag {lag} out of range for n={n}")
    s = sum(xs)
    ssq = sum(v * v for v in xs)
    mu = float(s) / float(n)
    sxx = sum(xs[i] * xs[i + lag] for i in range(n - lag))
    shead = sum(xs[: n - lag])
    stail = sum(xs[lag:])
    num = (float(sxx) - mu * float(shead + stail)
           + (float(n - lag) * mu) * mu)
    den = float(ssq) - (float(n) * mu) * mu
    if den == 0.0:
        return 0.0
    return num / den


def holt(x_int, alpha: float = 0.5, beta: float = 0.25):
    """Holt linear (double exponential smoothing) over integer bucket
    counts, with exact-binary-fraction coefficients (defaults 0.5/0.25)
    so every recurrence step is the identical pair of double
    expressions the recursive-CTE mirror evaluates:

        l_0 = x_0;  b_0 = x_1 - x_0
        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}

    Returns (final level, final trend). Forecast h steps ahead is
    ``level + h*trend`` (the caller applies it so the rounding point is
    explicit).
    """
    xs = np.asarray(x_int)
    if not np.issubdtype(xs.dtype, np.integer):
        raise ValueError("holt expects integer bucket counts")
    if len(xs) < 2:
        raise ValueError("need at least 2 points")
    ia, ib = 1.0 - alpha, 1.0 - beta
    lev = float(xs[0])
    tr = float(xs[1]) - float(xs[0])
    for v in xs[1:]:
        l_new = alpha * float(v) + ia * (lev + tr)
        tr = beta * (l_new - lev) + ib * tr
        lev = l_new
    return lev, tr
