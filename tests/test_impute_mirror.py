"""The recursive-CTE gap-fill mirror must stay bit-identical to the
engine's impute_missing on adversarial synthetic gap patterns —
independent of the driver testdata (which the mimic sweeps gate).

The SQL under test is the same list-carry recursion __ray_entry__
generates (head-window set-based mean, one gap per recursion step,
left-associated ((a+b)+c)/3), run over a tiny synthetic events table.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrixprofile_ray.core.preprocess import impute_missing  # noqa: E402

H1 = 3600000000


def _mirror_sql():
    import __ray_entry__ as e

    return f"""
        WITH RECURSIVE {e._impute_sql_cte()}
        SELECT event_type, pos, c FROM iv ORDER BY event_type, pos
    """


def _run_case(counts_by_pos: dict[str, dict[int, int]]):
    """counts_by_pos: key -> {hour position: event count}. Builds an
    events table with exactly that hourly histogram, runs the recursive
    mirror, and compares bitwise against the engine impute."""
    con = duckdb.connect()
    rows = []
    for key, hist in counts_by_pos.items():
        for pos, cnt in hist.items():
            for _ in range(cnt):
                rows.append((key, pos * 3600))
    con.execute("CREATE TABLE raw (event_type VARCHAR, sec BIGINT)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", rows)
    con.execute("""
        CREATE VIEW events AS
        SELECT event_type, to_timestamp(sec)::TIMESTAMP AS ts FROM raw
    """)
    out = con.execute(_mirror_sql()).df()

    for key, hist in counts_by_pos.items():
        pos = np.array(sorted(hist), dtype=np.int64)
        n = int(pos[-1] - pos[0]) + 1
        dense = np.full(n, np.nan)
        dense[pos - pos[0]] = [float(hist[int(p)]) for p in pos]
        want = impute_missing(dense, 4)
        got = out[out.event_type == key].sort_values("pos")["c"].to_numpy("d")
        assert len(got) == len(want), key
        assert np.array_equal(got, want), (
            key, np.flatnonzero(got != want)[:5])


class TestImputeMirror:
    def test_no_gaps_identity(self):
        _run_case({"a": {i: i % 7 + 1 for i in range(20)}})

    def test_head_window_gaps(self):
        # gaps at pos 1-3 exercise the set-based head fill
        _run_case({"a": {0: 5, 4: 2, 5: 9, 6: 1, 7: 7, 8: 3}})

    def test_long_consecutive_gap_run(self):
        # a 12-gap run: the recurrence feeds on its own imputed values
        hist = {i: (i % 5) + 1 for i in range(30)}
        for g in range(9, 21):
            hist.pop(g)
        _run_case({"a": hist})

    def test_scattered_and_adjacent_gaps(self):
        hist = {i: (7 * i) % 11 + 1 for i in range(40)}
        for g in (5, 6, 11, 17, 18, 19, 25, 33, 34, 38):
            hist.pop(g)
        _run_case({"a": hist})

    def test_multiple_keys_different_grids(self):
        _run_case({
            "a": {0: 3, 1: 4, 7: 2, 9: 5},
            "b": {2: 1, 3: 1, 4: 1, 10: 6, 12: 2},
            "c": {i: 2 for i in range(8)},
        })

    def test_convergent_run_goes_constant(self):
        # equal values before a long gap: the mean recurrence emits the
        # exact constant — the case the w24g conditioning documents
        hist = {0: 4, 1: 4, 2: 4, 3: 4}
        hist.update({i: 4 for i in range(4, 8)})
        hist[30] = 9
        _run_case({"a": hist})
