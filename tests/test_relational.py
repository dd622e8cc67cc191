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


class TestHistogramQuantiles:
    def test_within_bin_width_of_exact_and_matches_duckdb(self):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.relational import histogram_quantiles

        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "event_type": rng.choice(["a", "b"], size=4000),
            "value": rng.gamma(2.0, 50.0, size=4000),
        })
        got = histogram_quantiles(
            rd.from_pandas(df), "event_type", "value",
            qs=(0.5, 0.95), lo=0.0, hi=1000.0, nbins=2000,
        ).to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True)
        # sketch left-edge is within one bin width below the exact value
        width = 1000.0 / 2000
        for _, r in got.iterrows():
            vals = df.loc[df["event_type"] == r["event_type"], "value"]
            exact = np.quantile(vals.clip(0, 1000), r["q"],
                                method="inverted_cdf")
            assert r["quantile"] <= exact <= r["quantile"] + width
        # exact oracle agreement (integer bins pin the result)
        con = duckdb.connect()
        con.register("events", df)
        import __ray_entry__ as entry
        sql = entry.oracle_sql()["histogram_quantiles"].replace(
            "(0.5), (0.95), (0.99)", "(0.5), (0.95)")
        want = con.execute(sql).df().sort_values(
            ["event_type", "q"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["event_type", "q", "quantile"]].astype(
                {"quantile": "float64"}),
            want[["event_type", "q", "quantile"]],
        )

    def test_merge_is_partition_invariant(self):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import histogram_quantiles

        rng = np.random.default_rng(17)
        df = pd.DataFrame({
            "event_type": ["k"] * 1000,
            "value": rng.uniform(0, 500, size=1000),
        })
        a = histogram_quantiles(rd.from_pandas(df), "event_type", "value")
        b = histogram_quantiles(
            rd.from_pandas(df).repartition(7), "event_type", "value")
        pd.testing.assert_frame_equal(
            a.to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True),
            b.to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True),
        )


class TestStratifiedCap:
    def test_cap_and_determinism_vs_duckdb(self):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.relational import stratified_cap

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "doc_id": np.arange(300, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], size=300),
            "source": rng.choice(["web", "books"], size=300),
        })
        got = stratified_cap(
            rd.from_pandas(df), "lang", "doc_id", cap=15,
            extra_cols=("source",),
        ).to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
        # per-key cap respected
        assert (got.groupby("lang").size() <= 15).all()
        con = duckdb.connect()
        con.register("documents", df)
        want = con.execute("""
            SELECT lang, doc_id, source FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY lang
                ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id
            ) <= 15
        """).df().sort_values(["lang", "doc_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["lang", "doc_id", "source"]], want
        )

    def test_small_groups_pass_through(self):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import stratified_cap

        df = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "lang": ["en"] * 3 + ["de"] * 3,
        })
        got = stratified_cap(rd.from_pandas(df), "lang", "doc_id", cap=10)
        assert got.count() == 6


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


class TestWindowedLagStats:
    def test_matches_pandas_reference(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import windowed_lag_stats

        rng = np.random.default_rng(7)
        n = 500
        df = pd.DataFrame({
            "user_id": rng.integers(0, 20, n),
            "ts": rng.integers(0, 10_000, n).astype(np.int64),
            "value": np.round(rng.uniform(0, 100, n), 2),
            "event_id": np.arange(n, dtype=np.int64),
        })
        got = windowed_lag_stats(
            rd.from_pandas(df, override_num_blocks=4),
            "user_id", "ts", "value", "event_id",
        ).to_pandas().sort_values("user_id").reset_index(drop=True)

        ref_rows = []
        for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
            d = g["value"].diff().dropna().to_numpy()
            if len(d) == 0:
                continue
            ref_rows.append({
                "user_id": uid,
                "n_deltas": len(d),
                "min_delta": round(d.min(), 6),
                "max_delta": round(d.max(), 6),
                "sum_delta_mu": int(
                    np.copysign(np.floor(np.abs(d * 1e6) + 0.5), d)
                    .astype(np.int64).sum()
                ),
            })
        want = pd.DataFrame(ref_rows).sort_values(
            "user_id"
        ).reset_index(drop=True)
        assert len(got) == len(want)
        for c in ("n_deltas", "sum_delta_mu"):
            np.testing.assert_array_equal(got[c].to_numpy(),
                                          want[c].to_numpy())
        for c in ("min_delta", "max_delta"):
            np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy())

    def test_single_row_keys_dropped(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import windowed_lag_stats

        df = pd.DataFrame({
            "user_id": [1, 2, 2],
            "ts": np.array([0, 0, 10], dtype=np.int64),
            "value": [5.0, 1.0, 4.0],
            "event_id": np.array([0, 1, 2], dtype=np.int64),
        })
        got = windowed_lag_stats(
            rd.from_pandas(df), "user_id", "ts", "value", "event_id"
        ).to_pandas()
        assert got["user_id"].tolist() == [2]
        assert got["sum_delta_mu"].tolist() == [3_000_000]


class TestRunningSum:
    def test_prefix_scan_per_key(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import running_sum

        rng = np.random.default_rng(11)
        n = 300
        df = pd.DataFrame({
            "user_id": rng.integers(0, 10, n),
            "ts": rng.integers(0, 5_000, n).astype(np.int64),
            "value": np.round(rng.uniform(-50, 50, n), 2),
            "event_id": np.arange(n, dtype=np.int64),
        })
        got = running_sum(
            rd.from_pandas(df, override_num_blocks=3),
            "user_id", "ts", "value", "event_id",
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        assert len(got) == n

        mu = np.copysign(np.floor(np.abs(df["value"].to_numpy() * 1e6) + 0.5),
                         df["value"].to_numpy()).astype(np.int64)
        ref = df.assign(mu=mu).sort_values(["ts", "event_id"])
        want = ref.groupby("user_id")["mu"].cumsum()
        ref = ref.assign(cum=want).sort_values("event_id")
        np.testing.assert_array_equal(
            got["cum_value_mu"].to_numpy(), ref["cum"].to_numpy()
        )


class TestAntiJoinCount:
    def test_counts_unmatched_left(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import anti_join_count

        left = pd.DataFrame({
            "ck": [1, 2, 3, 4, 5, 6],
            "seg": ["A", "A", "B", "B", "B", "C"],
        })
        right = pd.DataFrame({"ok": [2, 3, 3, 99]})
        got = anti_join_count(
            rd.from_pandas(left, override_num_blocks=2),
            rd.from_pandas(right, override_num_blocks=2),
            "ck", "ok", "seg", out_count="n",
        ).to_pandas().sort_values("seg").reset_index(drop=True)
        assert got["seg"].tolist() == ["A", "B", "C"]
        assert got["n"].tolist() == [1, 2, 1]

    def test_all_matched_is_empty(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import anti_join_count

        left = pd.DataFrame({"ck": [1, 2], "seg": ["A", "B"]})
        right = pd.DataFrame({"ok": [1, 2]})
        got = anti_join_count(
            rd.from_pandas(left), rd.from_pandas(right),
            "ck", "ok", "seg",
        ).to_pandas()
        assert len(got) == 0


class TestTermDfTop:
    def test_doc_frequency_not_term_frequency(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import term_df_top

        ds = rd.from_pandas(pd.DataFrame({
            "lang": ["en", "en", "en", "de"],
            # "a" appears 3x in one doc but df counts DOCS: df(a)=1 < df(b)=2
            "text": ["a a a b", "b c", "c d", "x y"],
        }), override_num_blocks=2)
        out = term_df_top(ds, k=2).to_pandas().sort_values(
            ["lang", "rank"]
        ).reset_index(drop=True)
        en = out[out["lang"] == "en"]
        assert en["token"].tolist() == ["b", "c"]
        assert en["doc_freq"].tolist() == [2, 2]
        de = out[out["lang"] == "de"]
        assert de["token"].tolist() == ["x", "y"]


class TestGroupedMoments:
    def test_matches_scipy_formulas(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_moments

        rng = np.random.default_rng(7)
        # 2-decimal values like the events table
        vals = np.round(rng.gamma(2.0, 25.0, size=4000), 2)
        keys = rng.choice(["a", "b", "c"], size=4000)
        ds = rd.from_pandas(
            pd.DataFrame({"k": keys, "v": vals})
        ).repartition(7)
        out = grouped_moments(ds, "k", "v").to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        for _, r in out.iterrows():
            x = vals[keys == r["k"]]
            n = len(x)
            m = x.mean()
            m2 = ((x - m) ** 2).mean()
            m3 = ((x - m) ** 3).mean()
            m4 = ((x - m) ** 4).mean()
            skew = (m3 / m2**1.5) * np.sqrt(n * (n - 1)) / (n - 2)
            kurt = (
                ((n + 1) * (m4 / m2**2 - 3) + 6)
                * (n - 1) / ((n - 2) * (n - 3))
            )
            assert r["n"] == n
            np.testing.assert_allclose(r["skew"], skew, atol=2e-6)
            np.testing.assert_allclose(r["kurt"], kurt, atol=2e-6)

    def test_partition_invariant_bitwise(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_moments

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "k": rng.choice(["x", "y"], size=500),
            "v": np.round(rng.normal(50, 20, size=500), 2),
        })
        outs = []
        for nparts in (1, 3, 11):
            ds = rd.from_pandas(df).repartition(nparts)
            o = grouped_moments(ds, "k", "v").to_pandas()
            outs.append(o.sort_values("k").reset_index(drop=True))
        for o in outs[1:]:
            # exact integer partials ⇒ bit-identical at any partitioning
            pd.testing.assert_frame_equal(outs[0], o)


class TestGroupedMomentsOverflow:
    def test_max_magnitude_many_rows_exact(self, ray_session):
        """Round-4 regression (round-3 advice): per-row s4_hi reaches
        ~2^52 at the |c| < 2^21 guard bound, so >2^11 max-magnitude rows
        used to wrap the per-batch int64 groupby sum silently. 6000 rows
        near the bound in ONE batch must still match the exact
        Python-int computation."""
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_moments

        from matrixprofile_ray.stages.relational import _mu_int64

        rng = np.random.default_rng(11)
        # values*100 just under 2^21 = 2097152 (wiggle stays in-domain)
        vals = np.round(20960.0 + rng.normal(0, 1, size=6000), 2)
        df = pd.DataFrame({"k": ["a"] * 6000, "v": vals})
        out = grouped_moments(rd.from_pandas(df), "k", "v").to_pandas()
        # the engine's exact cent quantization: at this magnitude the
        # float64 finalize is cancellation-dominated, so even a single
        # ±1-cent rounding-rule difference would shift kurt by millions —
        # the point of the test is that the INTEGER power sums stay exact
        c = [int(x) for x in _mu_int64(vals, 100.0)]
        n = len(c)
        s1, s2 = sum(c), sum(x * x for x in c)
        s3, s4 = sum(x**3 for x in c), sum(x**4 for x in c)
        fn, f1, f2, f3, f4 = float(n), float(s1), float(s2), float(s3), float(s4)
        # the finalize expression MIRRORED VERBATIM (mm*mm*mm, not mm**3:
        # at this magnitude the result is cancellation-dominated and a
        # 1-ulp pow difference shifts kurt by orders of magnitude — the
        # test pins the integer sums AND the exact float recipe)
        mm = f1 / fn
        m2 = (f2 - f1 * mm) / fn
        m3 = (f3 - 3.0 * mm * f2 + 2.0 * fn * mm * mm * mm) / fn
        m4 = (f4 - 4.0 * mm * f3 + 6.0 * mm * mm * f2
              - 3.0 * fn * mm * mm * mm * mm) / fn
        skew = m3 / (m2 * np.sqrt(m2)) * np.sqrt(fn * (fn - 1.0)) / (fn - 2.0)
        kurt = (((fn + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0)
                * (fn - 1.0) / ((fn - 2.0) * (fn - 3.0)))
        np.testing.assert_allclose(out["skew"].iloc[0], round(skew, 6),
                                   atol=2e-6)
        np.testing.assert_allclose(out["kurt"].iloc[0], round(kurt, 6),
                                   atol=2e-6)

    def test_guard_still_rejects_out_of_domain(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_moments

        df = pd.DataFrame({"k": ["a"], "v": [30000.0]})  # 3e6 cents > 2^21
        with pytest.raises(Exception, match="2\\^21"):
            grouped_moments(rd.from_pandas(df), "k", "v").to_pandas()


class TestBroadcastJoinSumDegenerate:
    def test_empty_small_side_returns_empty(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import broadcast_join_sum

        big = rd.from_pandas(pd.DataFrame({"fk": [1, 2], "w": [10, 20]}))
        out = broadcast_join_sum(
            big, np.array([], dtype=np.int64), np.array([], dtype=object),
            "fk", weight_fn=lambda b: b["w"].to_numpy(),
        )
        assert len(out) == 0
        assert list(out.columns) == ["group", "n", "total"]

    def test_duplicate_small_keys_raise(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import broadcast_join_sum

        big = rd.from_pandas(pd.DataFrame({"fk": [1], "w": [10]}))
        with pytest.raises(ValueError, match="unique"):
            broadcast_join_sum(
                big, np.array([1, 1]), np.array(["a", "b"], dtype=object),
                "fk", weight_fn=lambda b: b["w"].to_numpy(),
            )


class TestSeriesCorrPairs:
    def test_matches_numpy_corrcoef(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import series_corr_pairs

        rng = np.random.default_rng(11)
        t = np.arange(200, dtype=np.int64)
        rows = []
        series = {}
        for key in ("a", "b", "c"):
            v = rng.integers(1, 100, size=200)
            series[key] = v
            for ti, vi in zip(t, v):
                rows.append({"k": key, "t": ti, "v": int(vi)})
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
        out = series_corr_pairs(ds, "k", "t", "v")
        assert list(out["key_a"]) == ["a", "a", "b"]
        assert list(out["key_b"]) == ["b", "c", "c"]
        for _, r in out.iterrows():
            expect = np.corrcoef(series[r["key_a"]], series[r["key_b"]])[0, 1]
            np.testing.assert_allclose(r["corr_v"], expect, atol=2e-6)
            assert r["n"] == 200

    def test_inner_alignment_drops_missing(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import series_corr_pairs

        # b missing at t=2: only t∈{0,1} are co-present
        df = pd.DataFrame({
            "k": ["a", "a", "a", "b", "b"],
            "t": np.array([0, 1, 2, 0, 1], dtype=np.int64),
            "v": np.array([1, 2, 3, 10, 30], dtype=np.int64),
        })
        ds = rd.from_pandas(df).repartition(3)
        out = series_corr_pairs(ds, "k", "t", "v")
        assert len(out) == 1
        assert out.iloc[0]["n"] == 2
        np.testing.assert_allclose(out.iloc[0]["corr_v"], 1.0, atol=1e-9)


class TestBroadcastJoinSum:
    def test_grouped_exact_sum(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import broadcast_join_sum

        big = pd.DataFrame({
            "fk": np.array([1, 2, 3, 1, 9], dtype=np.int64),  # 9 unmatched
            "x": np.array([100, 200, 300, 400, 500], dtype=np.int64),
        })
        ds = rd.from_pandas(big).repartition(3)
        out = broadcast_join_sum(
            ds,
            np.array([3, 1, 2], dtype=np.int64),
            np.array(["g2", "g1", "g1"], dtype=object),
            "fk",
            weight_fn=lambda b: b["x"].to_numpy(),
        )
        got = {r["group"]: (r["n"], r["total"]) for _, r in out.iterrows()}
        assert got == {"g1": (3, 700), "g2": (1, 300)}

    def test_large_values_no_int64_wrap(self, ray_session):
        """c=56021 → c^4 = 9.85e18 > int64 max: the limb decomposition
        must stay exact where a direct c4 = (c*c)**2 wraps negative."""
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_moments

        rng = np.random.default_rng(5)
        vals = np.round(rng.uniform(0, 600, size=300), 2)
        vals[7] = 560.21  # the sf0.1 click max that exposed the wrap
        df = pd.DataFrame({"k": ["a"] * 300, "v": vals})
        out = grouped_moments(rd.from_pandas(df).repartition(4), "k", "v")
        r = out.to_pandas().iloc[0]
        x = np.round(vals * 100)  # exact fixed-point
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        skew = (m3 / m2**1.5) * np.sqrt(n * (n - 1)) / (n - 2)
        kurt = (
            ((n + 1) * (m4 / m2**2 - 3) + 6) * (n - 1) / ((n - 2) * (n - 3))
        )
        np.testing.assert_allclose(r["skew"], skew, atol=2e-6)
        np.testing.assert_allclose(r["kurt"], kurt, atol=2e-6)

    def test_domain_guard_raises(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_moments

        df = pd.DataFrame({"k": ["a", "a", "a", "a"],
                           "v": [1.0, 2.0, 3.0, 2.0**22]})
        with pytest.raises(Exception, match="2\\^21|RayTaskError|ValueError"):
            grouped_moments(rd.from_pandas(df), "k", "v").to_pandas()


class TestGroupedQuantileDisc:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_quantile_disc

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], size=500),
            "v": rng.integers(0, 1000, size=500),
        })
        got = (grouped_quantile_disc(rd.from_pandas(df).repartition(7),
                                     "g", "v")
               .to_pandas().sort_values("g").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT g, COUNT(*) AS n, MIN(v) AS min,"
            " quantile_disc(v, 0.25) AS p25, quantile_disc(v, 0.5) AS p50,"
            " quantile_disc(v, 0.75) AS p75, MAX(v) AS max"
            " FROM t GROUP BY 1 ORDER BY 1").df()
        for c in ("n", "min", "p25", "p50", "p75", "max"):
            assert got[c].astype("int64").tolist() == \
                want[c].astype("int64").tolist(), c

    def test_small_group_edges(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_quantile_disc

        # n=1: every quantile is the single element; n=2: p25/p50 pick
        # index max(ceil(q*2)-1, 0) = 0, p75 picks 1
        df = pd.DataFrame({"g": ["x", "y", "y"], "v": [7, 10, 20]})
        got = (grouped_quantile_disc(rd.from_pandas(df), "g", "v")
               .to_pandas().sort_values("g").reset_index(drop=True))
        x = got[got["g"] == "x"].iloc[0]
        assert (x["p25"], x["p50"], x["p75"]) == (7, 7, 7)
        y = got[got["g"] == "y"].iloc[0]
        assert (y["p25"], y["p50"], y["p75"]) == (10, 10, 20)


class TestGroupedDistinctCount:
    def test_exact_distinct_across_blocks(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import grouped_distinct_count

        # user 1 appears on day 1 in two different blocks → must count once
        df = pd.DataFrame({
            "day": [1, 1, 1, 2, 2, 1],
            "user": [1, 2, 1, 1, 1, 1],
        })
        got = grouped_distinct_count(
            rd.from_pandas(df).repartition(3), "day", "user")
        d1 = got[got["day"] == 1].iloc[0]
        assert (d1["n_rows"], d1["n_distinct"]) == (4, 2)
        d2 = got[got["day"] == 2].iloc[0]
        assert (d2["n_rows"], d2["n_distinct"]) == (2, 1)


class TestGlobalRank:
    def test_matches_row_number_with_ties(self, ray_session):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.relational import global_rank

        rng = np.random.default_rng(5)
        # heavy ties + skew: values cluster so single buckets hold many rows
        df = pd.DataFrame({
            "id": np.arange(400, dtype=np.int64),
            "v": rng.choice([3, 3, 3, 7, 100], size=400).astype(np.int64),
        })
        got = (global_rank(rd.from_pandas(df).repartition(5), "v", "id",
                           num_buckets=8)
               .to_pandas().sort_values("id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT id, ROW_NUMBER() OVER (ORDER BY v, id) AS rnk FROM t"
            " ORDER BY id").df()
        assert got["rnk"].astype("int64").tolist() == \
            want["rnk"].astype("int64").tolist()

    def test_single_value_domain(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import global_rank

        df = pd.DataFrame({"id": [5, 2, 9], "v": [1, 1, 1]})
        got = (global_rank(rd.from_pandas(df), "v", "id")
               .to_pandas().sort_values("id").reset_index(drop=True))
        # all values equal → rank is id order
        assert dict(zip(got["id"], got["rnk"])) == {2: 1, 5: 2, 9: 3}


class TestHllDistinct:
    def test_accuracy_and_partition_invariance(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import hll_distinct

        rng = np.random.default_rng(13)
        # group a: 20k distinct over 60k rows; b: 3k distinct; c: 10
        rows = pd.DataFrame({
            "g": np.repeat(["a", "b", "c"], [60_000, 9_000, 50]),
            "u": np.concatenate([
                rng.integers(0, 20_000, 60_000),
                1_000_000 + rng.integers(0, 3_000, 9_000),
                2_000_000 + rng.integers(0, 10, 50),
            ]).astype(np.int64),
        })
        truth = rows.groupby("g")["u"].nunique()
        est1 = hll_distinct(rd.from_pandas(rows).repartition(4), "g", "u")
        est2 = hll_distinct(rd.from_pandas(rows).repartition(13), "g", "u")
        # registers merge by max → estimate independent of partitioning
        assert est1["est"].tolist() == est2["est"].tolist()
        for g, want in truth.items():
            got = int(est1[est1["g"] == g]["est"].iloc[0])
            tol = 0.05 if want > 100 else 0.2  # ~1.6% typical at p=12
            assert abs(got - want) <= max(2, tol * want), (g, got, want)

    def test_small_range_linear_counting_near_exact(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import hll_distinct

        rows = pd.DataFrame({"g": ["x"] * 100,
                             "u": np.arange(100, dtype=np.int64) % 10})
        est = hll_distinct(rd.from_pandas(rows), "g", "u")
        assert int(est["est"].iloc[0]) == 10  # linear counting regime


class TestGlobalRankEmpty:
    def test_empty_dataset_returns_empty(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import global_rank

        empty = rd.from_pandas(pd.DataFrame({
            "id": pd.Series(dtype="int64"),
            "v": pd.Series(dtype="int64"),
        }))
        out = global_rank(empty, "v", "id")
        # Ray's to_pandas() drops columns for 0-row datasets, so assert
        # the schema on the Dataset itself
        assert out.schema().names == ["id", "v", "rnk"]
        assert len(out.to_pandas()) == 0


class TestBloomAntiJoin:
    def test_bloom_primitives_no_false_negatives(self):
        from matrixprofile_ray.stages.relational import (
            _bloom_may_contain, _bloom_set)

        rng = np.random.default_rng(7)
        keys = rng.integers(0, 2**62, size=5000, dtype=np.int64)
        m_bits = len(keys) * 10
        words = _bloom_set(keys, m_bits, 7)
        # never a false negative
        assert _bloom_may_contain(words, keys, m_bits, 7).all()
        # false-positive rate near the 10-bits/key theoretical ~0.8%
        probe = rng.integers(2**62, 2**63 - 1, size=20000, dtype=np.int64)
        fp = _bloom_may_contain(words, probe, m_bits, 7).mean()
        assert fp < 0.03

    def test_matches_plain_anti_join(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.relational import bloom_anti_join

        rng = np.random.default_rng(11)
        n = 4000
        left = pd.DataFrame({
            "ck": np.arange(n, dtype=np.int64),
            "seg": rng.choice(list("ABCD"), size=n),
        })
        # small side hits ~60% of keys, with dups
        right = pd.DataFrame({
            "ok": rng.choice(np.arange(n, dtype=np.int64),
                             size=int(n * 1.5)),
        })
        got = bloom_anti_join(
            rd.from_pandas(left, override_num_blocks=4),
            rd.from_pandas(right, override_num_blocks=4),
            "ck", "ok", "seg", out_count="n",
        )
        matched = set(right["ok"].tolist())
        want = (left[~left["ck"].isin(matched)]
                .groupby("seg", as_index=False).size()
                .rename(columns={"size": "n"})
                .sort_values("seg").reset_index(drop=True))
        assert got["seg"].tolist() == want["seg"].tolist()
        assert got["n"].tolist() == want["n"].astype("int64").tolist()

    def test_rejects_non_integer_keys(self, ray_session):
        import pytest
        import ray.data as rd

        from matrixprofile_ray.stages.relational import bloom_anti_join

        left = rd.from_pandas(pd.DataFrame(
            {"ck": ["a", "b"], "seg": ["A", "B"]}))
        right = rd.from_pandas(pd.DataFrame({"ok": [1, 2]}))
        with pytest.raises(ValueError, match="integer"):
            bloom_anti_join(left, right, "ck", "ok", "seg")
