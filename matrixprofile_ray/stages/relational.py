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

__all__ = [
    "sessionize",
    "asof_join",
    "group_percentiles",
    "grouped_topk",
    "windowed_lag_stats",
    "running_sum",
    "anti_join_count",
]


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

    def sess_partition(part: pd.DataFrame) -> pd.DataFrame:
        """All keys of one partition at once: one lexsort, one diff, one
        pandas session-size groupby (per-key map_groups pays Ray overhead
        per KEY — millions of users at corpus scale)."""
        keys = part[key_col].to_numpy()
        t = _ts_int(part[ts_col])
        order = np.lexsort((t, keys))
        keys, t = keys[order], t[order]
        new_key = np.ones(len(t), dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        starts = new_key.copy()
        starts[1:] |= np.diff(t) > gap_us
        sess_id = np.cumsum(starts) - 1
        sess_sizes = np.bincount(sess_id)
        sess_key = keys[starts]  # key owning each session
        g = pd.DataFrame({key_col: sess_key, "sz": sess_sizes}).groupby(
            key_col, as_index=False
        ).agg(
            n_events=("sz", "sum"),
            n_sessions=("sz", "size"),
            max_session_events=("sz", "max"),
        )
        for c in ("n_events", "n_sessions", "max_session_events"):
            g[c] = g[c].astype(np.int64)
        return g

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(ds, [key_col], sess_partition)


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

    def match_partition(part: pd.DataFrame) -> pd.DataFrame:
        """All keys of one partition via ONE pd.merge_asof(by=key) — per-key
        map_groups pays Ray overhead per key (measured ~25 ms/key).

        Ties on the right timestamp: merge_asof keeps the LAST right row in
        sort order — callers needing determinism should aggregate the right
        side to tie-free timestamps first."""
        empty = pd.DataFrame({
            key: pd.Series(dtype=part["k"].dtype),
            left_ts: pd.Series(dtype="int64"),
            right_ts: pd.Series(dtype="int64"),
            right_value: pd.Series(dtype="float64"),
        })
        is_right = part["side"].to_numpy() == 1
        left = part.loc[~is_right, ["k", "t"]].sort_values("t", kind="stable")
        right = part.loc[is_right, ["k", "t", "v"]].sort_values(
            "t", kind="stable"
        ).rename(columns={"t": "rt"})
        if left.empty or right.empty:
            return empty
        m = pd.merge_asof(left, right, left_on="t", right_on="rt", by="k",
                          direction="backward")
        m = m.dropna(subset=["rt"])
        if m.empty:
            return empty
        return pd.DataFrame({
            key: m["k"].to_numpy(),
            left_ts: m["t"].to_numpy().astype(np.int64),
            right_ts: m["rt"].to_numpy().astype(np.int64),
            right_value: m["v"].to_numpy(dtype="d"),
        })

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(tagged, ["k"], match_partition)


def _mu_int64(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """round-half-away-from-zero(x*scale) as int64 — bit-matches SQL
    ROUND(x*scale, 0) (DuckDB rounds half away from zero; numpy's
    ``np.round`` is half-to-even). Summing these integers is
    order-independent, so parallel partial sums hash-match a sequential
    oracle at any scale — the same exact-integer-units trick as the
    segment-join revenue fix."""
    s = x * scale
    return np.copysign(np.floor(np.abs(s) + 0.5), s).astype(np.int64)


def windowed_lag_stats(ds, key_col: str, ts_col: str, value_col: str,
                       order_col: str):
    """LAG-window deltas per key: for each key ordered by (ts, order_col),
    delta = value - lag(value); aggregated per key.

    Output: key, n_deltas (int64), min_delta, max_delta (round 6),
    sum_delta_mu (int64 micro-units — exact, order-free). Keys with a
    single row produce no deltas and are dropped (SQL LAG ... WHERE
    delta IS NOT NULL semantics).

    One partition-cardinality shuffle; the whole partition is processed
    with one lexsort + one shifted diff — no per-key Python work.
    """

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        k = part[key_col].to_numpy()
        t = _ts_int(part[ts_col])
        o = part[order_col].to_numpy()
        v = part[value_col].to_numpy(dtype="d")
        idx = np.lexsort((o, t, k))
        k, v = k[idx], v[idx]
        same = k[1:] == k[:-1]
        d = (v[1:] - v[:-1])[same]
        dk = k[1:][same]
        if len(dk) == 0:
            return pd.DataFrame({
                key_col: pd.Series(dtype=part[key_col].dtype),
                "n_deltas": pd.Series(dtype="int64"),
                "min_delta": pd.Series(dtype="float64"),
                "max_delta": pd.Series(dtype="float64"),
                "sum_delta_mu": pd.Series(dtype="int64"),
            })
        g = pd.DataFrame({
            key_col: dk, "delta": d, "mu": _mu_int64(d)
        }).groupby(key_col, as_index=False).agg(
            n_deltas=("delta", "size"),
            min_delta=("delta", "min"),
            max_delta=("delta", "max"),
            sum_delta_mu=("mu", "sum"),
        )
        g["n_deltas"] = g["n_deltas"].astype(np.int64)
        g["min_delta"] = np.round(g["min_delta"].to_numpy(dtype="d"), 6)
        g["max_delta"] = np.round(g["max_delta"].to_numpy(dtype="d"), 6)
        g["sum_delta_mu"] = g["sum_delta_mu"].astype(np.int64)
        return g

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(ds, [key_col], fold)


def running_sum(ds, key_col: str, ts_col: str, value_col: str,
                id_col: str):
    """Cumulative windowed sum per key (SQL ``SUM(...) OVER (PARTITION BY
    key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)``) — the prefix-scan
    operator. Values are accumulated in exact int64 micro-units so the
    running totals are bit-deterministic under any partitioning.

    Output: one row per input row — id, key, cum_value_mu (int64).
    """

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        k = part[key_col].to_numpy()
        t = _ts_int(part[ts_col])
        o = part[id_col].to_numpy()
        v = part[value_col].to_numpy(dtype="d")
        idx = np.lexsort((o, t, k))
        k, o, v = k[idx], o[idx], v[idx]
        mu = _mu_int64(v)
        cs = np.cumsum(mu)
        starts = np.ones(len(k), dtype=bool)
        starts[1:] = k[1:] != k[:-1]
        start_idx = np.flatnonzero(starts)
        seg_len = np.diff(np.append(start_idx, len(k)))
        offsets = np.repeat(cs[start_idx] - mu[start_idx], seg_len)
        return pd.DataFrame({
            id_col: o,
            key_col: k,
            "cum_value_mu": (cs - offsets).astype(np.int64),
        })

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(ds, [key_col], fold)


def anti_join_count(left_ds, right_ds, left_key: str, right_key: str,
                    group_col: str, out_count: str = "n"):
    """Distributed anti join + group count: left rows whose key has NO
    match in the right side, counted per ``group_col``.

    Topology: both sides tag into a shared hash partitioning on the key
    (ONE shuffle — no broadcast of either side, no distinct
    materialization); each partition drops left rows whose key appears on
    its right rows (keys never split across partitions) and emits partial
    per-group counts, so the final groupby is group-cardinality-sized.
    """

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": batch[left_key].to_numpy(),
            "g": batch[group_col].astype(str).to_numpy(),
            "side": np.zeros(len(batch), dtype=np.int8),
        })

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        # in-batch unique: shrinks the exchange to distinct keys per block
        ks = np.unique(batch[right_key].to_numpy())
        return pd.DataFrame({
            "k": ks,
            "g": np.full(len(ks), "", dtype=object),
            "side": np.ones(len(ks), dtype=np.int8),
        })

    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        is_right = part["side"].to_numpy() == 1
        right_keys = part.loc[is_right, "k"].to_numpy()
        left = part.loc[~is_right]
        keep = left.loc[~left["k"].isin(right_keys)]
        partial = keep.groupby("g", as_index=False).size()
        return pd.DataFrame({
            group_col: partial["g"].to_numpy(),
            out_count: partial["size"].to_numpy(dtype=np.int64),
        })

    from matrixprofile_ray.util import partitioned_group_map

    partials = partitioned_group_map(tagged, ["k"], fold)
    totals = partials.groupby(group_col).sum(out_count)

    def rename(tbl) -> pd.DataFrame:
        return tbl.rename(columns={f"sum({out_count})": out_count})

    return totals.map_batches(rename, batch_format="pandas")


def grouped_topk(ds, key_col: str, value_col: str, k: int = 3,
                 extra_cols: tuple = ()):
    """Top-k rows per key by value (ties break by the extra columns then
    value descending — deterministic). One partition-cardinality shuffle;
    the per-partition fold is one pandas sort + groupby.head, so a key's
    candidate set never exceeds its own rows and the global sort is
    avoided entirely (contrast: Dataset.sort is an all-to-all over
    everything)."""

    cols = [key_col, value_col, *extra_cols]

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        part = part[cols].sort_values(
            [key_col, value_col, *extra_cols],
            ascending=[True, False] + [True] * len(extra_cols),
            kind="stable",
        )
        top = part.groupby(key_col, sort=False).head(k).copy()
        top["rank"] = top.groupby(key_col, sort=False).cumcount()
        return top

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(ds, [key_col], fold)


def group_percentiles(ds, key_col: str, value_col: str,
                      qs=(0.5, 0.9, 0.99)):
    """Exact per-key percentiles (linear interpolation, = quantile_cont)."""

    def pct_partition(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in part.groupby(key_col, sort=False):
            vals = g[value_col].to_numpy(dtype="d")
            row = {key_col: k}
            for q in qs:
                row[f"p{int(q * 100)}"] = round(
                    float(np.percentile(vals, q * 100)), 6
                )
            rows.append(row)
        return pd.DataFrame(rows)

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(ds, [key_col], pct_partition)
