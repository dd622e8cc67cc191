"""Generic timeseries pipeline: salted two-phase rollup equivalence and
cascade exactness over the events table."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)

H1 = 3_600_000_000
D1 = 86_400_000_000


def _events(ray_session):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(SF, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )


@needs_testdata
class TestSaltedRollup:
    def test_salted_equals_unsalted(self, ray_session):
        from matrixprofile_ray.pipelines.timeseries import rollup_events

        plain = (
            rollup_events(_events(ray_session), H1)
            .to_pandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        salted = (
            rollup_events(_events(ray_session), H1, salt=4)
            .to_pandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        assert len(plain) == len(salted)
        np.testing.assert_array_equal(plain["count"], salted["count"])
        np.testing.assert_allclose(
            plain["sum_value"].to_numpy(), salted["sum_value"].to_numpy(),
            atol=1e-9,
        )
        np.testing.assert_array_equal(
            plain["min_value"], salted["min_value"]
        )
        np.testing.assert_array_equal(
            plain["max_value"], salted["max_value"]
        )

    def test_cascade_from_salted_partials(self, ray_session):
        from matrixprofile_ray.pipelines.timeseries import (
            cascade_events,
            rollup_events,
        )

        direct = (
            rollup_events(_events(ray_session), D1)
            .to_pandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        partials = rollup_events(
            _events(ray_session), H1, keep_partials=True, salt=4
        )
        cascaded = (
            cascade_events(partials, D1)
            .to_pandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        np.testing.assert_array_equal(direct["count"], cascaded["count"])
        np.testing.assert_allclose(
            direct["mean_value"].to_numpy(), cascaded["mean_value"].to_numpy(),
            atol=1e-9,
        )


class TestRollupExactMuSums:
    def test_boundary_mean_partition_invariant(self, ray_session):
        """The sf0.1 sweep regression: a bucket whose mean lands exactly
        on x.xxxxxx5 AND splits across blocks must still hash-match a
        sequential oracle — sum_mu (exact int micro-units) makes sum and
        mean independent of partitioning and float add order."""
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.pipelines.timeseries import rollup_events
        from matrixprofile_ray.stages.relational import _round6_away

        # 4 values whose mean = 49.0278125 → ROUND(·, 6) is a half case
        vals = [49.027812, 49.027813, 49.027812, 49.027813]
        ts = [1_000_000 * i for i in range(4)]
        df = pd.DataFrame({
            "event_type": ["a"] * 4,
            "ts": pd.to_datetime(ts, unit="us"),
            "value": vals,
        })
        outs = []
        for parts in (1, 4):
            ds = rd.from_pandas(df).repartition(parts)
            out = rollup_events(ds, 3_600_000_000).to_pandas()
            mu = out["sum_mu"].to_numpy(dtype=np.int64)
            sv = mu.astype(np.float64) / 1e6
            mean = sv / out["count"].to_numpy(dtype=np.float64)
            outs.append((mu[0], _round6_away(mean)[0]))
        # identical across partitioning
        assert outs[0] == outs[1]
        con = duckdb.connect()
        con.register("events", df)
        want = con.execute("""
            SELECT SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS mu,
                   ROUND((SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT))
                          / 1000000.0) / count(*), 6) AS mean_r
            FROM events""").fetchone()
        assert outs[0][0] == want[0]
        assert outs[0][1] == want[1]
        # the half case rounds AWAY (…813), not to-even (…812)
        assert outs[0][1] == 49.027813
