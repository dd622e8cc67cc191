"""Visualization panels: dispatch, sparklines, describe summaries."""

from __future__ import annotations

import numpy as np
import pytest

import matrixprofile_ray.core as core
from matrixprofile_ray.visualize import Panel, describe, sparkline, visualize


def _mp_profile():
    rng = np.random.default_rng(2)
    ts = rng.uniform(size=300)
    p = core.stomp(ts, 16)
    return {
        "class": "MatrixProfile", "algorithm": "stomp", "w": 16,
        "mp": p["mp"], "pi": p["pi"], "ez": p["ez"], "join": False,
        "metric": "euclidean", "sample_pct": 1.0,
        "data": {"ts": ts, "query": None},
        "discords": np.array([5, 100]),
        "motifs": [{"motifs": [10, 50], "neighbors": []}],
    }


class TestSparkline:
    def test_length_and_range(self):
        s = sparkline(np.sin(np.linspace(0, 6, 200)), width=40)
        assert len(s) == 40

    def test_handles_nan(self):
        s = sparkline([1.0, np.nan, 2.0])
        assert len(s) == 3 and s[1] == " "

    def test_empty(self):
        assert sparkline([]) == ""


class TestVisualize:
    def test_mp_panels(self):
        panels = visualize(_mp_profile())
        titles = [p.title for p in panels]
        assert "series" in titles and "matrix profile" in titles
        assert "motifs" in titles and "discords" in titles
        rendered = panels[0].render()
        assert "series" in rendered and "│" in rendered

    def test_pmp_panels(self):
        rng = np.random.default_rng(3)
        ts = rng.uniform(size=300)
        p = core.skimp(ts, windows=[8, 16])
        panels = visualize({
            "class": "PMP", "pmp": p["pmp"], "pmpi": p["pmpi"],
            "windows": np.array([8, 16]), "data": {"ts": ts},
        })
        assert [pl.title for pl in panels] == ["series", "pmp w=8", "pmp w=16"]

    def test_describe(self):
        d = describe(_mp_profile())
        assert d["w"] == 16 and d["mp_len"] == 300 - 16 + 1
        assert np.isfinite(d["mp_min"])

    def test_unsupported_raises(self):
        with pytest.raises(ValueError):
            visualize({"stats": {}})

    def test_analyze_with_visuals(self):
        from matrixprofile_ray.api import analyze

        rng = np.random.default_rng(4)
        ts = rng.uniform(size=300)
        profile, panels = analyze(ts, windows=16, with_visuals=True)
        assert "motifs" in profile
        titles = [p.title for p in panels]
        assert "matrix profile" in titles
        # default return shape unchanged (profile dict only)
        alone = analyze(ts, windows=16)
        assert isinstance(alone, dict)
