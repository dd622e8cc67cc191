"""Gorilla float-XOR + timestamp delta-of-delta codec round-trips (bit-exact)."""

from __future__ import annotations

import numpy as np
import pytest

from matrixprofile_ray.core.gorilla import (
    gorilla_decode_floats,
    gorilla_encode_floats,
    timestamps_decode,
    timestamps_encode,
)


class TestFloatCodec:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(1)
        values = rng.normal(size=5000)
        out = gorilla_decode_floats(gorilla_encode_floats(values))
        np.testing.assert_array_equal(out, values)

    def test_roundtrip_special_values(self):
        values = np.array(
            [0.0, -0.0, 1.0, np.nan, np.inf, -np.inf, 1e-308, 1e308, np.pi]
        )
        out = gorilla_decode_floats(gorilla_encode_floats(values))
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint64), values.view(np.uint64)
        )

    def test_constant_series_compresses(self):
        values = np.full(10_000, 42.5)
        enc = gorilla_encode_floats(values)
        # 1 control bit per repeated value → ~1/64 of raw size
        assert len(enc) < 10_000  # vs 80 KB raw
        np.testing.assert_array_equal(gorilla_decode_floats(enc), values)

    def test_empty(self):
        assert len(gorilla_decode_floats(gorilla_encode_floats(np.array([])))) == 0

    def test_single(self):
        out = gorilla_decode_floats(gorilla_encode_floats(np.array([3.75])))
        np.testing.assert_array_equal(out, [3.75])


class TestTimestampCodec:
    def test_dense_grid_compresses_hard(self):
        ts = 1_700_000_000_000_000 + 300_000_000 * np.arange(20_000, dtype=np.int64)
        enc = timestamps_encode(ts)
        # delta-of-delta == 0 everywhere after the first two → ~1 bit/point
        assert len(enc) < 6_000  # vs 160 KB raw
        np.testing.assert_array_equal(timestamps_decode(enc), ts)

    def test_irregular_roundtrip(self):
        rng = np.random.default_rng(2)
        deltas = rng.integers(1, 10_000_000, size=3000)
        ts = np.cumsum(deltas).astype(np.int64) + 1_600_000_000_000_000
        np.testing.assert_array_equal(
            timestamps_decode(timestamps_encode(ts)), ts
        )

    def test_short_series(self):
        for n in (0, 1, 2, 3):
            ts = np.arange(n, dtype=np.int64) * 1000
            np.testing.assert_array_equal(
                timestamps_decode(timestamps_encode(ts)), ts
            )


class TestCompressionRatio:
    def test_rollup_like_series_beats_raw(self):
        """Slow-moving counts (the actual workload shape) must compress."""
        rng = np.random.default_rng(3)
        values = np.round(50 + 10 * np.sin(np.arange(10_000) / 50)) + rng.integers(
            0, 3, size=10_000
        )
        values = values.astype("d")
        ts = 1_700_000_000_000_000 + 300_000_000 * np.arange(10_000, dtype=np.int64)
        enc_v = gorilla_encode_floats(values)
        enc_t = timestamps_encode(ts)
        raw = 16 * len(values)
        assert (len(enc_v) + len(enc_t)) < raw / 2


class TestNativeParity:
    """The C codec must produce byte-identical streams to the Python
    reference implementation (the Python loop defines the format)."""

    def _python_only(self, monkeypatch):
        from matrixprofile_ray.core import _native

        monkeypatch.setattr(_native, "native_gorilla_encode", lambda v: None)
        monkeypatch.setattr(_native, "native_gorilla_decode", lambda d: None)
        monkeypatch.setattr(_native, "native_ts_encode", lambda v: None)
        monkeypatch.setattr(_native, "native_ts_decode", lambda d: None)

    def test_float_stream_bit_exact(self, monkeypatch):
        from matrixprofile_ray.core import _native

        if not _native.available():
            pytest.skip("no C compiler")
        rng = np.random.default_rng(17)
        cases = [
            rng.normal(size=5000),
            np.zeros(777),
            np.repeat(rng.normal(size=10), 100),
            np.array([]),
            np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-308, 1e308]),
            rng.integers(0, 5, 2000).astype("d"),
        ]
        c_streams = [gorilla_encode_floats(v) for v in cases]
        self._python_only(monkeypatch)
        py_streams = [gorilla_encode_floats(v) for v in cases]
        assert c_streams == py_streams
        for s, v in zip(py_streams, cases):
            np.testing.assert_array_equal(
                gorilla_decode_floats(s).view("<u8"),
                np.asarray(v, "<f8").view("<u8"),
            )

    def test_ts_stream_bit_exact(self, monkeypatch):
        from matrixprofile_ray.core import _native

        if not _native.available():
            pytest.skip("no C compiler")
        rng = np.random.default_rng(18)
        cases = [
            np.cumsum(rng.integers(0, 10**9, 3000).astype(np.int64)),
            np.arange(0, 10**6, 3600, dtype=np.int64),
            np.array([], dtype=np.int64),
            np.array([5], dtype=np.int64),
            np.array([5, -3], dtype=np.int64),
            np.cumsum(rng.integers(-2000, 2000, 500).astype(np.int64)),
        ]
        c_streams = [timestamps_encode(t) for t in cases]
        self._python_only(monkeypatch)
        py_streams = [timestamps_encode(t) for t in cases]
        assert c_streams == py_streams
        for s, t in zip(py_streams, cases):
            np.testing.assert_array_equal(timestamps_decode(s), t)


class TestCorruptPayloads:
    """Native decoders must reject truncated/corrupt payloads instead of
    reading out of bounds or allocating bogus multi-GB buffers."""

    def test_native_rejects_corruption(self):
        from matrixprofile_ray.core import _native

        if not _native.available():
            pytest.skip("no C compiler")
        rng = np.random.default_rng(3)
        vals = rng.normal(size=1000)
        enc = gorilla_encode_floats(vals)
        ts = np.cumsum(rng.integers(1, 100, 1000).astype(np.int64))
        enc_ts = timestamps_encode(ts)
        for bad in (enc[:4], enc[:150], b"\x7f\xff\xff\xff" + enc[4:], b"\x01"):
            with pytest.raises(ValueError):
                _native.native_gorilla_decode(bad)
        for bad in (enc_ts[:150], b"\x7f\xff\xff\xff" + enc_ts[4:]):
            with pytest.raises(ValueError):
                _native.native_ts_decode(bad)
        # uncorrupted still round-trips after all the failed decodes
        np.testing.assert_array_equal(gorilla_decode_floats(enc), vals)
        np.testing.assert_array_equal(timestamps_decode(enc_ts), ts)
