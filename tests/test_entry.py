"""Driver-contract smoke: entry()/queries()/oracle_sql() shape and a fast
subset of oracle comparisons at sf0.001 (the full gate runs at sf0.01)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


@needs_testdata
class TestContract:
    def test_entry_runs(self, ray_session):
        import __ray_entry__ as e

        df = _to_df(e.entry())
        assert len(df) >= 0
        assert {"event_type", "kind", "rank", "idx"} <= set(df.columns)

    def test_every_oracle_key_has_query(self):
        import __ray_entry__ as e

        assert set(e.oracle_sql()) <= set(e.queries())

    def test_rollup_1h_matches_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        got = _to_df(e.queries()["rollup_1h"](SF))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
        )
        want = con.execute(e.oracle_sql()["rollup_1h"]).df()
        got = got.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)
        want = want.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got["count"], want["count"])
        np.testing.assert_allclose(
            got["mean_value"].to_numpy(), want["mean_value"].to_numpy(),
            atol=1e-9,
        )

    def test_dedup_exact_matches_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        got = _to_df(e.queries()["dedup_exact"](SF))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        want = con.execute(e.oracle_sql()["dedup_exact"]).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        np.testing.assert_array_equal(got["doc_id"], want["doc_id"])
        np.testing.assert_array_equal(got["dup_count"], want["dup_count"])
