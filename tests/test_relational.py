"""Relational / streaming-window operators: sessionize, as-of join,
percentiles, token histogram — unit semantics through Ray Data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from matrixprofile_ray.stages.relational import (
    asof_join,
    group_percentiles,
    sessionize,
)


class TestSessionize:
    def test_gap_splits_sessions(self, ray_session):
        import ray.data as rd

        minute = 60 * 1_000_000
        ts = np.array([0, 5, 10, 100, 105, 300], dtype=np.int64) * minute
        ds = rd.from_pandas(pd.DataFrame({
            "user_id": np.ones(len(ts), dtype=np.int64),
            "ts": ts,
        }))
        out = sessionize(ds, gap_us=30 * minute).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        # sessions: [0,5,10], [100,105], [300]
        assert r["n_events"] == 6
        assert r["n_sessions"] == 3
        assert r["max_session_events"] == 3

    def test_exact_gap_is_same_session(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({
            "user_id": [1, 1], "ts": np.array([0, 100], dtype=np.int64),
        }))
        out = sessionize(ds, gap_us=100).to_pandas()
        assert out.iloc[0]["n_sessions"] == 1  # strictly-greater splits


class TestAsofJoin:
    def test_latest_at_or_before(self, ray_session):
        import ray.data as rd

        left = rd.from_pandas(pd.DataFrame({
            "k": [1, 1, 1, 2], "lt": np.array([10, 25, 5, 10], dtype=np.int64),
        }))
        right = rd.from_pandas(pd.DataFrame({
            "k": [1, 1, 2], "rt": np.array([10, 20, 50], dtype=np.int64),
            "val": [1.0, 2.0, 3.0],
        }))
        out = asof_join(left, right, key="k", left_ts="lt",
                        right_ts="rt", right_value="val").to_pandas()
        out = out.sort_values(["k", "lt"]).reset_index(drop=True)
        # k=1: lt=5 → no match (dropped); lt=10 → rt=10; lt=25 → rt=20
        # k=2: lt=10 < rt=50 → dropped
        assert len(out) == 2
        assert out["lt"].tolist() == [10, 25]
        assert out["rt"].tolist() == [10, 20]
        assert out["val"].tolist() == [1.0, 2.0]


class TestGroupPercentiles:
    def test_matches_numpy(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        vals = rng.normal(size=500)
        ds = rd.from_pandas(pd.DataFrame({"g": ["a"] * 500, "v": vals}))
        out = group_percentiles(ds, "g", "v").to_pandas()
        assert out.iloc[0]["p50"] == round(float(np.percentile(vals, 50)), 6)
        assert out.iloc[0]["p99"] == round(float(np.percentile(vals, 99)), 6)


class TestTokenHistogram:
    def test_counts_and_tiebreak(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import token_histogram

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["b a a c", "A b z"],
        }))
        out = token_histogram(ds, k=3).to_pandas()
        assert out["token"].tolist() == ["a", "b", "c"]  # c before z on tie
        assert out["cnt"].tolist() == [3, 2, 1]
