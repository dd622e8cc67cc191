"""SAX/PAA symbolization (core/sax.py) — float path vs exact-integer
oracle-grade path, plus brute-force PAA checks."""
from __future__ import annotations

import numpy as np
import pytest

from matrixprofile_ray.core.sax import (
    BREAKPOINTS_4,
    paa,
    sax_symbols,
    sax_symbols_exact,
)


def brute_paa(x, S):
    n = len(x)
    out = []
    for k in range(S):
        seg = [x[i] for i in range(n) if i * S // n == k]
        out.append(sum(seg) / len(seg))
    return np.array(out)


def test_paa_matches_brute():
    rng = np.random.default_rng(3)
    for n in (16, 17, 100, 333):
        x = rng.normal(size=n)
        np.testing.assert_allclose(paa(x, 16), brute_paa(x, 16), rtol=1e-12)


def test_paa_exact_divisible():
    x = np.arange(32, dtype="d")
    np.testing.assert_array_equal(paa(x, 16), x.reshape(16, 2).mean(axis=1))


def test_paa_too_short_raises():
    with pytest.raises(ValueError):
        paa(np.arange(8, dtype="d"), 16)


def test_sax_constant_series():
    assert sax_symbols(np.ones(50)) == "b" * 16
    assert sax_symbols_exact(np.ones(50, dtype=np.int64)) == "b" * 16


def test_sax_symbols_known_word():
    # strictly increasing ramp: symbols ascend a..d
    x = np.linspace(-3, 3, 160)
    w = sax_symbols(x, 16)
    assert w[0] == "a" and w[-1] == "d"
    assert list(w) == sorted(w)


def test_exact_matches_float_path():
    """On well-separated data the exact-integer path and the float path
    agree (they differ only in summation order, never by a symbol unless
    a PAA value sits within float error of a breakpoint)."""
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(40, 400))
        micro = rng.integers(-10**9, 10**9, size=n).astype(np.int64)
        assert sax_symbols_exact(micro, 16) == sax_symbols(
            micro.astype("d"), 16)


def test_exact_requires_integers():
    with pytest.raises(ValueError):
        sax_symbols_exact(np.ones(40))


def test_exact_big_values_no_overflow():
    # ssq*n passes 2^63: arbitrary-precision path must stay exact
    micro = np.full(100, 3 * 10**12, dtype=np.int64)
    micro[::2] += 10**9
    w = sax_symbols_exact(micro, 16)
    assert len(w) == 16 and set(w) <= set("abcd")


def test_breakpoint_semantics():
    # value exactly AT a breakpoint belongs to the upper symbol
    # (strict < per the SQL CASE mirror)
    assert BREAKPOINTS_4 == (-0.6745, 0.0, 0.6745)
    # crafted: z == 0 exactly -> 'c'
    micro = np.array([-1, 1] * 32, dtype=np.int64)
    w = sax_symbols_exact(micro, 16)
    # every segment has mean 0 == global mean -> z == 0 -> 'c'
    assert w == "c" * 16
