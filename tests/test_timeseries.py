"""Generic timeseries pipeline: salted two-phase rollup equivalence and
cascade exactness over the events table."""

from __future__ import annotations

import os

import numpy as np
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
