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


class TestPartitionInvariance:
    """partitioned_group_map results must not depend on the partition count
    (keys never split; hashing is deterministic)."""

    def test_partition_count_invariant(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.util import partitioned_group_map

        rng = np.random.default_rng(4)
        n = 2000
        df = pd.DataFrame({
            "g": rng.integers(0, 60, n),
            "v": rng.normal(size=n),
        })
        ds = rd.from_pandas(df)

        def fold(part: pd.DataFrame) -> pd.DataFrame:
            return part.groupby("g", as_index=False).agg(
                s=("v", "sum"), c=("v", "size")
            )

        outs = []
        for parts in (1, 7, 64):
            out = partitioned_group_map(
                ds, ["g"], fold, num_partitions=parts
            ).to_pandas().sort_values("g").reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])
        # every key appears exactly once (keys never split across partitions)
        assert outs[0]["g"].is_unique
        np.testing.assert_allclose(
            outs[0].sort_values("g")["s"].to_numpy(),
            df.groupby("g")["v"].sum().to_numpy(),
        )

    def test_sessionize_matches_bruteforce(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        n = 1500
        df = pd.DataFrame({
            "user_id": rng.integers(0, 40, n),
            "ts": rng.integers(0, 10**10, n).astype(np.int64),
        })
        from matrixprofile_ray.stages.relational import sessionize

        gap = 30 * 60 * 1_000_000
        got = sessionize(rd.from_pandas(df), gap_us=gap).to_pandas()
        got = got.sort_values("user_id").reset_index(drop=True)
        rows = []
        for uid, g in df.groupby("user_id"):
            t = np.sort(g["ts"].to_numpy())
            brk = np.flatnonzero(np.diff(t) > gap)
            sizes = np.diff(np.concatenate([[0], brk + 1, [len(t)]]))
            rows.append({
                "user_id": uid, "n_events": len(t),
                "n_sessions": len(sizes),
                "max_session_events": int(sizes.max()),
            })
        want = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
        for c in ("n_events", "n_sessions", "max_session_events"):
            np.testing.assert_array_equal(
                got[c].to_numpy(), want[c].to_numpy(), err_msg=c
            )

    def test_asof_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import asof_join

        rng = np.random.default_rng(6)
        left = pd.DataFrame({
            "k": rng.integers(0, 20, 500),
            "lt": rng.integers(0, 10**6, 500).astype(np.int64),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 20, 300),
            "rt": rng.integers(0, 10**6, 300).astype(np.int64),
            "val": rng.normal(size=300),
        }).drop_duplicates(["k", "rt"])  # tie-free as-of timestamps
        got = asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", left_ts="lt", right_ts="rt", right_value="val",
        ).to_pandas().sort_values(["k", "lt"]).reset_index(drop=True)
        # brute force
        rows = []
        rmap = {k: g.sort_values("rt") for k, g in right.groupby("k")}
        for _, r in left.iterrows():
            g = rmap.get(r["k"])
            if g is None:
                continue
            ok = g[g["rt"] <= r["lt"]]
            if ok.empty:
                continue
            last = ok.iloc[-1]
            rows.append({"k": r["k"], "lt": r["lt"],
                         "rt": last["rt"], "val": last["val"]})
        want = pd.DataFrame(rows).sort_values(["k", "lt"]).reset_index(drop=True)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got["rt"].to_numpy(), want["rt"].to_numpy())
        np.testing.assert_allclose(got["val"].to_numpy(), want["val"].to_numpy())


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
