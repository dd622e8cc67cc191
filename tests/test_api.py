"""Top-level compute/analyze dispatch, mstomp, clustering, io round-trips.

Contract assertions mirror reference tests/test_compute.py:23-176,
test_analyze.py:23-143, test_mstomp.py:38-59, test_io.py:19-123.
"""

from __future__ import annotations

import numpy as np
import pytest

import matrixprofile_ray.core as core
from matrixprofile_ray import api, io
from matrixprofile_ray.core.mstomp import mstomp


class TestComputeDispatch:
    def test_single_window_exact_is_mpx(self, sampledata):
        p = api.compute(sampledata, windows=32)
        assert p["algorithm"] == "mpx"
        assert p["class"] == "MatrixProfile"
        mp, pi = core.mpx(sampledata, 32)
        np.testing.assert_array_equal(p["mp"], mp)

    def test_single_window_sampled_is_scrimp(self, sampledata):
        p = api.compute(sampledata, windows=32, sample_pct=0.5)
        assert p["algorithm"] == "scrimp++"
        assert p["sample_pct"] == 0.5

    def test_query_makes_join(self, sampledata):
        p = api.compute(sampledata, windows=32, query=sampledata[199:300])
        assert p["join"] is True
        assert p["mpb"] is not None

    def test_many_windows_is_pmp(self, sampledata):
        p = api.compute(sampledata, windows=[16, 32])
        assert p["class"] == "PMP"
        assert list(p["windows"]) == [16, 32]

    def test_no_windows_uses_threshold(self, sampledata):
        p = api.compute(sampledata[:300], threshold=0.95)
        assert p["class"] == "PMP"
        assert p["windows"][0] == 8

    def test_small_window_raises(self, sampledata):
        with pytest.raises(ValueError):
            api.compute(sampledata, windows=3)


class TestAnalyze:
    def test_single_window_annotations(self, sampledata):
        p = api.analyze(sampledata, windows=32)
        assert "motifs" in p and "discords" in p and "regimes" in p
        assert len(p["discords"]) == 3
        np.testing.assert_array_equal(p["regimes"], [759, 423, 583])

    def test_pmp_annotations(self, sampledata):
        p = api.analyze(sampledata[:300], windows=[16, 32])
        assert p["class"] == "PMP"
        assert "motifs" in p and "discords" in p


class TestMstomp:
    def test_single_dim_fixture(self):
        # reference tests/test_mstomp.py:38-59
        ts = np.array([0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0])
        p = mstomp(ts, 4)
        np.testing.assert_almost_equal(p["mp"], [np.zeros(9)])
        np.testing.assert_array_equal(p["pi"], [[4, 5, 6, 7, 0, 1, 2, 3, 0]])
        np.testing.assert_almost_equal(
            p["lmp"], [[np.inf, np.inf, np.inf, 2.82842712, 0, 0, 0, 0, 0]]
        )
        np.testing.assert_array_equal(p["lpi"], [[0, 0, 0, 0, 0, 1, 2, 3, 0]])
        np.testing.assert_almost_equal(
            p["rmp"], [[0, 0, 0, 0, 0, 2.82842712, np.inf, np.inf, np.inf]]
        )
        np.testing.assert_array_equal(p["rpi"], [[4, 5, 6, 7, 8, 8, 0, 0, 0]])

    def test_duplicate_dims_match_stomp(self, sampledata):
        ts = sampledata[:300]
        p = mstomp(np.vstack([ts, ts]), 16)
        s = core.stomp(ts, 16)
        for row in (0, 1):
            np.testing.assert_almost_equal(p["mp"][row], s["mp"], decimal=8)

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            mstomp(np.vstack([np.arange(8), np.arange(8)]), 8)

    def test_return_dimension(self, sampledata):
        rng = np.random.default_rng(3)
        ts = np.vstack([sampledata[:200], rng.normal(size=200)])
        p = mstomp(ts, 16, return_dimension=True)
        assert len(p["pd"]) == 2
        assert p["pd"][0].shape == (1, 185)
        assert p["pd"][1].shape == (2, 185)


class TestClustering:
    def test_linkage_single_simple(self):
        # 3 points: d(0,1)=1, d(0,2)=10, d(1,2)=9 → merge (0,1) then join 2
        Z = core.linkage(np.array([1.0, 10.0, 9.0]), method="single")
        assert Z[0][0] == 0 and Z[0][1] == 1 and Z[0][2] == 1.0
        assert Z[1][2] == 9.0  # single linkage: min(10, 9)
        assert Z[1][3] == 3

    def test_complete_linkage(self):
        Z = core.linkage(np.array([1.0, 10.0, 9.0]), method="complete")
        assert Z[1][2] == 10.0

    def test_fcluster_maxclust(self):
        Z = core.linkage(np.array([1.0, 10.0, 9.0]), method="single")
        two = core.fcluster(Z, 2)
        assert two[0] == two[1] != two[2]
        three = core.fcluster(Z, 3)
        assert len(set(three)) == 3

    def test_hierarchical_clusters_end_to_end(self, sampledata):
        a = sampledata[:200]
        b = sampledata[5:205]          # near-copy of a
        rng = np.random.default_rng(0)
        c = rng.normal(size=200)       # unrelated
        res = core.hierarchical_clusters([a, b, c], 32, t=2)
        assert res["class"] == "hclusters"
        lab = res["assignments"]
        assert lab[0] == lab[1] != lab[2]


class TestIO:
    def test_json_roundtrip(self, sampledata):
        p = api.compute(sampledata, windows=32)
        p.pop("data")
        back = io.from_json(io.to_json(p))
        np.testing.assert_array_equal(back["mp"], p["mp"])
        np.testing.assert_array_equal(back["pi"], p["pi"])
        assert back["pi"].dtype == np.int64
        assert back["w"] == 32

    def test_disk_roundtrip_json(self, sampledata, tmp_path):
        p = api.compute(sampledata, windows=32)
        p.pop("data")
        path = str(tmp_path / "profile")
        io.to_disk(p, path, format="json")
        back = io.from_disk(path + ".json")
        np.testing.assert_array_equal(back["mp"], p["mp"])

    def test_disk_roundtrip_parquet(self, sampledata, tmp_path):
        p = api.compute(sampledata, windows=32)
        path = str(tmp_path / "profile")
        io.to_disk(p, path, format="parquet")
        back = io.from_disk(path + ".parquet")
        np.testing.assert_array_equal(back["mp"], p["mp"])
        np.testing.assert_array_equal(back["pi"], p["pi"])
        assert back["w"] == 32

    def test_bad_format_raises(self):
        with pytest.raises(ValueError):
            io.to_disk({}, "/tmp/x", format="bogus")
