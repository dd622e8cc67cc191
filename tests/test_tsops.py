"""Sequential time-series ops (core/tsops.py): EWMA, CUSUM, LTTB —
brute-force mirrors, tie-breaks, and the exact-arithmetic contract."""
from __future__ import annotations

import numpy as np
import pytest

from matrixprofile_ray.core.tsops import (
    cusum_alarms,
    ewma,
    exact_mu_sigma,
    lttb_indices,
)


class TestEwma:
    def test_recurrence_brute(self):
        rng = np.random.default_rng(5)
        x = rng.integers(0, 100, 50).astype(np.int64)
        e, n_above = ewma(x, alpha=0.25)
        eb, nb = float(x[0]), 0
        for v in x[1:]:
            if float(v) > eb:
                nb += 1
            eb = 0.25 * float(v) + 0.75 * eb
        assert e == eb and n_above == nb

    def test_constant(self):
        e, n_above = ewma(np.full(10, 7, dtype=np.int64))
        assert e == 7.0 and n_above == 0

    def test_requires_int(self):
        with pytest.raises(ValueError):
            ewma(np.ones(5))


class TestCusum:
    def test_no_alarms_on_flat(self):
        n_alarms, first, s_max = cusum_alarms(
            np.full(100, 4, dtype=np.int64))
        assert (n_alarms, first, s_max) == (0, -1, 0.0)

    def test_step_change_alarms(self):
        x = np.concatenate([np.full(200, 10), np.full(50, 40)]).astype(
            np.int64)
        n_alarms, first, s_max = cusum_alarms(x)
        assert n_alarms > 0
        assert 200 <= first < 210  # fires shortly after the shift
        assert s_max > 5.0

    def test_mu_sigma_exact(self):
        x = np.array([1, 2, 3, 4], dtype=np.int64)
        mu, sigma = exact_mu_sigma(x)
        assert mu == 2.5
        assert sigma == pytest.approx(np.std(x), rel=1e-15)

    def test_mu_sigma_big_values(self):
        # ssq*n exceeds 2^63: arbitrary-precision path stays finite/exact
        x = np.full(1000, 3 * 10**12, dtype=np.int64)
        x[::2] += 10**6
        mu, sigma = exact_mu_sigma(x)
        assert sigma == pytest.approx(5 * 10**5, rel=1e-12)


class TestLttb:
    def brute(self, y, n_out):
        n = len(y)
        t = n_out - 2
        bounds = [1 + k * (n - 2) // t for k in range(t + 1)]
        picks = [0]
        ia, iy = 0, float(y[0])
        for k in range(t):
            lo, hi = bounds[k], bounds[k + 1]
            if k + 1 < t:
                nlo, nhi = bounds[k + 1], bounds[k + 2]
                ax = sum(range(nlo, nhi)) / (nhi - nlo)
                ay = sum(int(v) for v in y[nlo:nhi]) / (nhi - nlo)
            else:
                ax, ay = float(n - 1), float(y[n - 1])
            best, barea = None, -1.0
            for j in range(lo, hi):
                a = abs((ia - ax) * (float(y[j]) - iy)
                        - (ia - j) * (ay - iy))
                if a > barea:
                    best, barea = j, a
            picks.append(best)
            ia, iy = best, float(y[best])
        picks.append(n - 1)
        return picks

    def test_matches_brute(self):
        rng = np.random.default_rng(9)
        for n in (40, 100, 333):
            y = rng.integers(0, 1000, n).astype(np.int64)
            got = lttb_indices(y, 16).tolist()
            assert got == self.brute(y, 16)

    def test_endpoints_and_monotonic(self):
        y = np.abs(np.sin(np.arange(500) / 7) * 100).astype(np.int64)
        idx = lttb_indices(y, 32)
        assert idx[0] == 0 and idx[-1] == 499 and len(idx) == 32
        assert (np.diff(idx) > 0).all()

    def test_short_series_passthrough(self):
        y = np.arange(10, dtype=np.int64)
        np.testing.assert_array_equal(lttb_indices(y, 32), np.arange(10))

    def test_peak_preserved(self):
        # a single spike must survive the downsample
        y = np.zeros(300, dtype=np.int64)
        y[150] = 1000
        assert 150 in lttb_indices(y, 16).tolist()

    def test_n_out_floor(self):
        with pytest.raises(ValueError):
            lttb_indices(np.arange(100, dtype=np.int64), 2)


class TestTrendAcf:
    def test_trend_exact_line(self):
        from matrixprofile_ray.core.tsops import ols_trend

        slope, intercept = ols_trend(np.arange(50, dtype=np.int64) * 3 + 7)
        assert slope == 3.0 and intercept == 7.0

    def test_trend_matches_polyfit(self):
        from matrixprofile_ray.core.tsops import ols_trend

        rng = np.random.default_rng(13)
        x = rng.integers(0, 500, 200).astype(np.int64)
        slope, intercept = ols_trend(x)
        ref = np.polyfit(np.arange(200), x.astype("d"), 1)
        assert slope == pytest.approx(ref[0], rel=1e-9)
        assert intercept == pytest.approx(ref[1], rel=1e-9)

    def test_trend_needs_two(self):
        from matrixprofile_ray.core.tsops import ols_trend

        with pytest.raises(ValueError):
            ols_trend(np.array([5], dtype=np.int64))

    def test_acf_periodic(self):
        from matrixprofile_ray.core.tsops import acf

        x = np.tile([10, 0], 100).astype(np.int64)
        assert acf(x, 2) > 0.9    # period-2 signal: lag-2 high
        assert acf(x, 1) < -0.9   # lag-1 anti-correlated

    def test_acf_matches_numpy(self):
        from matrixprofile_ray.core.tsops import acf

        rng = np.random.default_rng(17)
        x = rng.integers(0, 100, 300).astype(np.int64)
        for lag in (1, 24):
            xf = x.astype("d")
            mu = xf.mean()
            ref = ((xf[:-lag] - mu) * (xf[lag:] - mu)).sum() / (
                ((xf - mu) ** 2).sum())
            assert acf(x, lag) == pytest.approx(ref, rel=1e-9)

    def test_acf_constant_series(self):
        from matrixprofile_ray.core.tsops import acf

        assert acf(np.full(50, 9, dtype=np.int64), 1) == 0.0

    def test_acf_lag_bounds(self):
        from matrixprofile_ray.core.tsops import acf

        with pytest.raises(ValueError):
            acf(np.arange(10, dtype=np.int64), 10)


class TestHolt:
    def test_perfect_line(self):
        from matrixprofile_ray.core.tsops import holt

        lev, tr = holt(np.arange(30, dtype=np.int64) * 3 + 11)
        assert lev == float(11 + 29 * 3) and tr == 3.0

    def test_recurrence_brute(self):
        from matrixprofile_ray.core.tsops import holt

        rng = np.random.default_rng(21)
        x = rng.integers(0, 200, 60).astype(np.int64)
        lev, tr = holt(x, alpha=0.5, beta=0.25)
        lb, tb = float(x[0]), float(x[1]) - float(x[0])
        for v in x[1:]:
            ln = 0.5 * float(v) + 0.5 * (lb + tb)
            tb = 0.25 * (ln - lb) + 0.75 * tb
            lb = ln
        assert lev == lb and tr == tb

    def test_constant_series(self):
        from matrixprofile_ray.core.tsops import holt

        lev, tr = holt(np.full(20, 8, dtype=np.int64))
        assert lev == 8.0 and tr == 0.0

    def test_needs_two(self):
        from matrixprofile_ray.core.tsops import holt

        with pytest.raises(ValueError):
            holt(np.array([1], dtype=np.int64))
