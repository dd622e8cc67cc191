"""Preprocess/impute semantics (reference preprocess.py:140-270 parity)."""

from __future__ import annotations

import numpy as np
import pytest

import matrixprofile_ray.core as core


class TestImputeMissing:
    def test_no_missing_is_identity(self):
        x = np.arange(20, dtype="d")
        np.testing.assert_array_equal(core.impute_missing(x, 4), x)

    def test_fills_all_nan_inf(self):
        x = np.arange(40, dtype="d")
        x[[3, 7, 8, 20]] = np.nan
        x[[15, 30]] = np.inf
        out = core.impute_missing(x, 4)
        assert np.all(np.isfinite(out))
        # untouched positions unchanged
        mask = np.isfinite(x)
        np.testing.assert_array_equal(out[mask], x[mask])

    def test_forward_mean_fill_value(self):
        # window [1,2,3,nan] → nan ← mean(1,2,3) = 2
        x = np.array([1.0, 2, 3, np.nan, 5, 6, 7, 8])
        out = core.impute_missing(x, 4, method="mean", direction="forward")
        assert out[3] == 2.0

    def test_median_method(self):
        x = np.array([1.0, 2, 9, np.nan, 5, 6, 7, 8])
        out = core.impute_missing(x, 4, method="median", direction="forward")
        assert out[3] == 2.0  # median(1,2,9)

    def test_invalid_method_raises(self):
        with pytest.raises(ValueError):
            core.impute_missing(np.ones(8), 4, method="bogus")

    def test_invalid_direction_raises(self):
        with pytest.raises(ValueError):
            core.impute_missing(np.ones(8), 4, direction="sideways")

    def test_endpoint_nan_seeded_from_nearest_finite(self):
        x = np.array([np.nan, np.nan, 3.0, 4, 5, np.nan])
        out = core.impute_missing(x, 3)
        assert out[0] == 3.0 and out[-1] == 5.0
        assert np.all(np.isfinite(out))


class TestNoise:
    def test_constant_windows_deflattened(self):
        x = np.concatenate([np.ones(10), np.arange(10, dtype="d")])
        out = core.preprocess(x, 4, add_noise=True)
        # no window of width 4 is exactly constant anymore
        wins = core.rolling_window(out, 4)
        assert not np.any(wins.min(axis=1) == wins.max(axis=1))
        # noise is tiny (≤ 9e-7 per reference preprocess.py:115-137)
        assert np.max(np.abs(out[:10] - 1.0)) < 1e-6

    def test_seeded_rng_deterministic(self):
        x = np.concatenate([np.ones(10), np.arange(10, dtype="d")])
        a = core.preprocess(x, 4, rng=np.random.default_rng(5))
        b = core.preprocess(x, 4, rng=np.random.default_rng(5))
        np.testing.assert_array_equal(a, b)

    def test_no_noise_flag(self):
        x = np.ones(12)
        out = core.preprocess(x, 4, add_noise=False)
        np.testing.assert_array_equal(out, x)


class TestSparseSeriesPerformance:
    def test_large_sparse_series_fast(self):
        """16k-bucket raw-tier series with 90% gaps must impute quickly."""
        import time

        rng = np.random.default_rng(7)
        x = np.full(16_384, np.nan)
        pos = rng.choice(16_384, size=1_600, replace=False)
        x[pos] = rng.normal(size=1_600)
        t0 = time.time()
        out = core.impute_missing(x, 4)
        assert time.time() - t0 < 2.0
        assert np.all(np.isfinite(out))
