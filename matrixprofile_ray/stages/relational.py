"""Relational / streaming-window operators Ray Data lacks natively.

Each is a documented composition of map_batches + groupby().map_groups —
the partitioning assumption is always "one KEY's rows fit in one worker"
(keys are users/customers; a key's history is bounded, the key COUNT is
what scales).

- ``sessionize``: gap-based sessionization per key (the streaming-window
  op of SURVEY §2.9 generalized beyond tumbling windows).
- ``asof_join``: for each left row, the most recent right row with
  right_ts <= left_ts for the same key. Implemented as ONE shuffle: both
  sides union into the same hash partitioning (tagged), each key group
  sorts once and answers all its left rows with a searchsorted — no
  per-row lookups, no broadcast of the big side.
- ``group_percentiles``: exact per-key quantiles (numpy linear
  interpolation == SQL quantile_cont) via per-key sort in map_groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["sessionize", "asof_join", "group_percentiles"]


def _ts_int(col) -> np.ndarray:
    """timestamp/int column → int64 microseconds."""
    arr = col.to_numpy()
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_us: int = 30 * 60 * 1_000_000):
    """Per-key session stats: a new session starts when the gap between
    consecutive events exceeds ``gap_us``.

    Output: key, n_events, n_sessions, max_session_events (int64).
    """

    def sess(group: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(_ts_int(group[ts_col]))
        breaks = np.flatnonzero(np.diff(t) > gap_us)
        sizes = np.diff(np.concatenate([[0], breaks + 1, [len(t)]]))
        return pd.DataFrame({
            key_col: [group[key_col].iloc[0]],
            "n_events": np.array([len(t)], dtype=np.int64),
            "n_sessions": np.array([len(sizes)], dtype=np.int64),
            "max_session_events": np.array([sizes.max()], dtype=np.int64),
        })

    return ds.groupby(key_col).map_groups(sess, batch_format="pandas")


def asof_join(left_ds, right_ds, key: str, left_ts: str, right_ts: str,
              right_value: str):
    """events-style as-of join: for each left row, the latest right row at
    or before its timestamp (same key). Inner semantics (left rows with no
    prior right row are dropped).

    Output: key, <left_ts>, <right_ts> (matched, int64 us), <right_value>.
    """

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": batch[key].to_numpy(),
            "t": _ts_int(batch[left_ts]),
            "v": np.nan,
            "side": np.zeros(len(batch), dtype=np.int8),
        })

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": batch[key].to_numpy(),
            "t": _ts_int(batch[right_ts]),
            "v": batch[right_value].to_numpy(dtype="d"),
            "side": np.ones(len(batch), dtype=np.int8),
        })

    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )

    def match(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series(dtype=group["k"].dtype),
            left_ts: pd.Series(dtype="int64"),
            right_ts: pd.Series(dtype="int64"),
            right_value: pd.Series(dtype="float64"),
        })
        is_right = group["side"].to_numpy() == 1
        lt = group["t"].to_numpy()[~is_right]
        rt = group["t"].to_numpy()[is_right]
        rv = group["v"].to_numpy()[is_right]
        if not len(lt) or not len(rt):
            return empty
        order = np.argsort(rt, kind="stable")
        rt, rv = rt[order], rv[order]
        # ties on right_ts: keep the LAST (searchsorted 'right' - 1), i.e.
        # the max-value-at-max-ts is whatever sorts last — callers needing
        # determinism should pass a tie-free right side or aggregate first
        idx = np.searchsorted(rt, lt, side="right") - 1
        ok = idx >= 0
        if not ok.any():
            return empty
        return pd.DataFrame({
            key: group["k"].to_numpy()[~is_right][ok],
            left_ts: lt[ok],
            right_ts: rt[idx[ok]],
            right_value: rv[idx[ok]],
        })

    return tagged.groupby("k").map_groups(match, batch_format="pandas")


def group_percentiles(ds, key_col: str, value_col: str,
                      qs=(0.5, 0.9, 0.99)):
    """Exact per-key percentiles (linear interpolation, = quantile_cont)."""

    def pct(group: pd.DataFrame) -> pd.DataFrame:
        vals = group[value_col].to_numpy(dtype="d")
        out = {key_col: [group[key_col].iloc[0]]}
        for q in qs:
            out[f"p{int(q * 100)}"] = [
                round(float(np.percentile(vals, q * 100)), 6)
            ]
        return pd.DataFrame(out)

    return ds.groupby(key_col).map_groups(pct, batch_format="pandas")
