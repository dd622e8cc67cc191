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
    "grouped_moments",
    "series_corr_pairs",
    "broadcast_join_sum",
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
    segment-join revenue fix.

    Half detection compares ``abs(s) - floor(abs(s)) >= 0.5`` (that
    subtraction is exact for doubles) instead of ``floor(abs(s) + 0.5)``:
    the +0.5 addition itself rounds, pushing inputs one ulp below a half
    boundary (s = 0.49999999999999994) UP to 1 where SQL ROUND yields 0.
    """
    s = x * scale
    a = np.abs(s)
    f = np.floor(a)
    f = f + (a - f >= 0.5)
    return np.copysign(f, s).astype(np.int64)


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


def histogram_quantiles(ds, key_col: str, value_col: str,
                        qs: tuple = (0.5, 0.95, 0.99),
                        lo: float = 0.0, hi: float = 1000.0,
                        nbins: int = 2000):
    """Mergeable fixed-bin histogram-sketch quantiles per key.

    The 100-TB scale path next to :func:`group_percentiles` (which must
    co-locate every value of a key to sort it): here each batch folds its
    rows into integer (key, bin) counts FIRST, so the shuffle carries at
    most nbins rows per key regardless of data volume, and merge is
    count addition — associative, order-independent, exactly the shape a
    256-node pre-aggregation wants. Result quantile is the LEFT EDGE of
    the first bin whose cumulative count reaches ceil(q*n) — a pure
    function of the integer counts, so the DuckDB oracle (width-bucket
    counts + window cumsum) matches exactly; precision is (hi-lo)/nbins.
    """

    span = hi - lo

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype="d")
        # mirror: floor(((v - lo) * nbins) / (hi - lo)), clipped to range
        idx = np.floor(((v - lo) * nbins) / span)
        idx = np.clip(idx, 0, nbins - 1).astype(np.int64)
        g = pd.DataFrame({key_col: batch[key_col].to_numpy(), "bin": idx})
        out = g.groupby([key_col, "bin"], sort=False).size()
        out = out.rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def finalize(part: pd.DataFrame) -> pd.DataFrame:
        merged = part.groupby([key_col, "bin"], sort=True)["cnt"].sum()
        merged = merged.reset_index()
        rows = []
        for key, grp in merged.groupby(key_col, sort=True):
            bins = grp["bin"].to_numpy()
            cum = grp["cnt"].to_numpy().cumsum()
            n = int(cum[-1])
            for q in qs:
                r = int(np.ceil(q * n))
                b = int(bins[np.searchsorted(cum, max(r, 1))])
                rows.append({
                    key_col: key, "q": q,
                    "quantile": lo + (b * span) / nbins,
                    "n": n,
                })
        return pd.DataFrame(rows)

    from matrixprofile_ray.util import partitioned_group_map

    partials = ds.map_batches(partial, batch_format="pandas")
    return partitioned_group_map(partials, [key_col], finalize)


def stratified_cap(ds, key_col: str, id_col: str, cap: int,
                   extra_cols: tuple = ()):
    """Deterministic per-key row cap (stratified downsample).

    The web-pipeline balancing step: keep at most ``cap`` rows per key
    (domain / language / source), chosen by a Knuth-multiplicative hash of
    the id — an unbiased, engine-independent pseudo-random order, so the
    SAME rows survive on any engine, any partitioning, any scale. Order
    key is (hash(id), id): the id tiebreak makes the total order exact
    even on hash collisions. One partition-cardinality shuffle; the fold
    is one vectorized sort + groupby.head per partition.

    SQL mirror: QUALIFY row_number() OVER (PARTITION BY key ORDER BY
    (id::HUGEINT * 2654435761) % 4294967296, id) <= cap — same constant,
    same modulus, computed in uint64 here so neither side can wrap
    (ADVICE r3: signed int64 multiply wraps at doc_id ~3.47e9 while
    DuckDB BIGINT raises; uint64/HUGEINT agree everywhere).
    """

    cols = [key_col, id_col, *extra_cols]

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        part = part[cols].copy()
        h = (part[id_col].to_numpy().astype(np.uint64)
             * np.uint64(2654435761)) % np.uint64(4294967296)
        part["_h"] = h
        part = part.sort_values([key_col, "_h", id_col], kind="stable")
        top = part.groupby(key_col, sort=False).head(cap)
        return top.drop(columns=["_h"])

    from matrixprofile_ray.util import partitioned_group_map

    return partitioned_group_map(ds, [key_col], fold)


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


def _round6_away(x: np.ndarray | float) -> np.ndarray | float:
    """ROUND(x, 6) with SQL half-away-from-zero semantics."""
    return _mu_int64(np.asarray(x, dtype="d"), 1e6) / 1e6


_HILO_SHIFT = np.int64(32)
_HILO_MASK = np.int64((1 << 32) - 1)


def grouped_moments(ds, key_col: str, value_col: str, scale: float = 100.0):
    """Distributed per-key skewness / excess kurtosis from EXACT integer
    power sums — the higher-moment extension of the rollup combiner.

    Values are fixed-point integers (``round(v*scale)``; events carry
    2-decimal values so scale=100 is lossless; domain |c| < 2^21,
    enforced). Each batch emits per-key partial sums of c, c^2, c^3,
    c^4; the 3rd/4th powers are carried as (hi, lo) int64 limbs at 2^32
    — c^4 itself can exceed int64 so its limbs are formed via an exact
    2^31-split decomposition of c^2 without ever materializing c^4 —
    and sum without overflow for ~2^31 batches (lo is re-normalised per
    batch).
    Integer sums are order-independent, so the parallel fold is
    bit-deterministic at any partitioning — and the finalize expression
    below (plain +,-,*,/ and sqrt, all IEEE correctly rounded; no pow)
    is mirrored verbatim in the DuckDB oracle, giving hash-identical
    doubles instead of "close at 6 decimals".

    Skew/kurtosis are scale-invariant, so working in fixed-point units
    changes nothing. Formulas are the bias-corrected sample versions
    DuckDB's skewness()/kurtosis() implement.

    Output: key, n (int64), skew, kurt (round 6, half-away).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = _mu_int64(batch[value_col].to_numpy(dtype="d"), scale)
        if len(c) and np.abs(c).max() >= (1 << 21):
            # c^4 exactness bound: the two-limb decomposition below is
            # exact for |c| < 2^21 (~2e7 in value units at scale=100).
            # Fail loudly instead of silently wrapping.
            raise ValueError(
                "grouped_moments: |value*scale| must be < 2^21; "
                f"got {np.abs(c).max()}"
            )
        c2, c3 = c * c, c * c * c
        # c^4 can exceed int64 (wraps at |c| > ~55k): form its 2^32-split
        # limbs exactly WITHOUT ever materializing c^4. With c2 = a*2^31+b
        # (a,b < 2^31): c4 = a^2*2^62 + a*b*2^32 + b^2, so
        #   lo = b^2 mod 2^32,  hi = a^2*2^30 + a*b + (b^2 >> 32)
        # — every term < 2^61 for the 2^21 domain, all exact int64.
        a = c2 >> np.int64(31)
        b = c2 & np.int64((1 << 31) - 1)
        b2 = b * b
        c4_lo = b2 & _HILO_MASK
        c4_hi = (a * a) << np.int64(30)
        c4_hi = c4_hi + a * b + (b2 >> _HILO_SHIFT)
        # c4_hi itself reaches ~2^52, so a batch groupby-sum would wrap
        # int64 after ~2^11 max-magnitude rows (round-3 advice): split it
        # into two more 2^32 limbs — per-row s4_hh < 2^20, s4_hl < 2^32,
        # so per-batch sums stay exact up to 2^31 rows per (batch, key),
        # far above any worker-heap-sized batch.
        df = pd.DataFrame({
            key_col: batch[key_col].to_numpy(),
            "n": np.ones(len(c), dtype=np.int64),
            "s1": c,
            "s2_hi": c2 >> _HILO_SHIFT, "s2_lo": c2 & _HILO_MASK,
            "s3_hi": c3 >> _HILO_SHIFT, "s3_lo": c3 & _HILO_MASK,
            "s4_hh": c4_hi >> _HILO_SHIFT, "s4_hl": c4_hi & _HILO_MASK,
            "s4_lo": c4_lo,
        })
        g = df.groupby(key_col, as_index=False).sum()
        for p in ("s2", "s3"):  # renormalise: carry lo overflow to hi
            lo = g[f"{p}_lo"].to_numpy()
            g[f"{p}_hi"] = g[f"{p}_hi"].to_numpy() + (lo >> _HILO_SHIFT)
            g[f"{p}_lo"] = lo & _HILO_MASK
        lo = g["s4_lo"].to_numpy()
        hl = g["s4_hl"].to_numpy() + (lo >> _HILO_SHIFT)
        g["s4_lo"] = lo & _HILO_MASK
        g["s4_hh"] = g["s4_hh"].to_numpy() + (hl >> _HILO_SHIFT)
        g["s4_hl"] = hl & _HILO_MASK
        return g

    def finalize(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        def osum(col) -> int:
            # Python-int (arbitrary precision) cross-partition sum: the
            # per-key partial count equals the partition count, but limb
            # values near 2^32 × many partials must never wrap silently
            return int(col.astype(object).sum()) if len(col) else 0

        for k, g in part.groupby(key_col, sort=False):
            n = int(g["n"].sum())
            s1 = int(g["s1"].sum())
            # exact arbitrary-precision reconstruction
            s2 = (osum(g["s2_hi"]) << 32) + osum(g["s2_lo"])
            s3 = (osum(g["s3_hi"]) << 32) + osum(g["s3_lo"])
            s4 = ((osum(g["s4_hh"]) << 64) + (osum(g["s4_hl"]) << 32)
                  + osum(g["s4_lo"]))
            # float64 finalize — mirrored EXACTLY in the SQL oracle
            fn, f1, f2, f3, f4 = (
                float(n), float(s1), float(s2), float(s3), float(s4)
            )
            mm = f1 / fn
            m2 = (f2 - f1 * mm) / fn
            m3 = (f3 - 3.0 * mm * f2 + 2.0 * fn * mm * mm * mm) / fn
            m4 = (
                f4 - 4.0 * mm * f3 + 6.0 * mm * mm * f2
                - 3.0 * fn * mm * mm * mm * mm
            ) / fn
            skew = (
                m3 / (m2 * np.sqrt(m2))
                * np.sqrt(fn * (fn - 1.0)) / (fn - 2.0)
            )
            kurt = (
                ((fn + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0)
                * (fn - 1.0) / ((fn - 2.0) * (fn - 3.0))
            )
            rows.append({
                key_col: k, "n": n,
                "skew": float(_round6_away(skew)),
                "kurt": float(_round6_away(kurt)),
            })
        out = pd.DataFrame(rows)
        out["n"] = out["n"].astype(np.int64)
        return out

    from matrixprofile_ray.util import partitioned_group_map

    partials = ds.map_batches(partial, batch_format="pandas")
    return partitioned_group_map(partials, [key_col], finalize)


def series_corr_pairs(ds, key_col: str, ts_col: str, value_col: str):
    """Pairwise Pearson correlation between keyed integer series aligned
    on a shared time axis (inner-join semantics: only timestamps where
    BOTH keys have a value contribute to that pair).

    Topology: ONE hash shuffle on the time column; each partition pivots
    its rows to a (timestamps x keys) matrix and computes ALL pairwise
    co-presence counts / sums / cross-products with k x k integer matmuls
    — per-pair partials, not per-pair passes. Partials are exact int64
    (values are counts), so the cross-partition combine is
    order-independent; the finalize expression is mirrored verbatim in
    the SQL oracle for hash-identical doubles.

    Partitioning assumption (documented per the engine convention): the
    KEY count k is bounded (pair output is k^2); the TIME axis is what
    scales and it is the shuffle key.

    Output: key_a < key_b, n (co-present timestamps, int64),
    corr (round 6, half-away).
    """

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        p = part.pivot_table(
            index=ts_col, columns=key_col, values=value_col, aggfunc="sum"
        )
        if p.shape[1] < 2:
            return pd.DataFrame({
                "key_a": pd.Series(dtype="object"),
                "key_b": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "sx": pd.Series(dtype="int64"),
                "sy": pd.Series(dtype="int64"),
                "sxy": pd.Series(dtype="int64"),
                "sx2": pd.Series(dtype="int64"),
                "sy2": pd.Series(dtype="int64"),
            })
        keys = [str(c) for c in p.columns]
        x = p.to_numpy(dtype="d")
        present = ~np.isnan(x)
        xi = np.where(present, x, 0.0).astype(np.int64)
        mi = present.astype(np.int64)
        n = mi.T @ mi
        sxy = xi.T @ xi
        sx = xi.T @ mi          # sum of x where both i and j present
        sx2 = (xi * xi).T @ mi
        ii, jj = np.triu_indices(len(keys), k=1)
        ka = np.asarray(keys, dtype=object)
        return pd.DataFrame({
            "key_a": ka[ii], "key_b": ka[jj],
            "n": n[ii, jj],
            "sx": sx[ii, jj], "sy": sx[jj, ii],
            "sxy": sxy[ii, jj],
            "sx2": sx2[ii, jj], "sy2": sx2[jj, ii],
        })

    from matrixprofile_ray.util import partitioned_group_map

    partials = partitioned_group_map(ds, [ts_col], fold).to_pandas()
    # pair-cardinality combine (k^2 rows x nparts): exact integer sums,
    # then ONE int->double conversion per term — mirrors the oracle's
    # CAST(exact_integer_expression AS DOUBLE) so products never round
    # twice (fn*fsxy in float can differ from float(n*sxy) by 1 ulp)
    g = partials.groupby(["key_a", "key_b"], as_index=False).sum()
    corrs = []
    for _, r in g.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sx2, sy2 = int(r["sxy"]), int(r["sx2"]), int(r["sy2"])
        num = float(n * sxy - sx * sy)
        vx = float(n * sx2 - sx * sx)
        vy = float(n * sy2 - sy * sy)
        corrs.append(num / (np.sqrt(vx) * np.sqrt(vy)))
    out = pd.DataFrame({
        "key_a": g["key_a"], "key_b": g["key_b"],
        "n": g["n"].astype(np.int64),
        "corr_v": _round6_away(np.asarray(corrs)),
    })
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def broadcast_join_sum(big_ds, small_keys: np.ndarray, small_vals: np.ndarray,
                       join_col: str, group_vals: np.ndarray | None = None,
                       weight_fn=None, weight_cols=()):
    """Broadcast hash join + grouped exact-integer sum: the small side
    (key -> group label) is shipped ONCE via ray.put and looked up inside
    every map_batches task with a vectorized searchsorted — no shuffle of
    the big side at all (contrast Dataset.join's all-to-all: at 100 TB the
    big side never moves, only per-batch partial sums do).

    ``weight_fn(batch) -> int64 array`` computes the exact-integer measure
    per big-side row (e.g. revenue in cents x discount basis points);
    integer partials make the parallel sum order-independent.

    Output (pandas): group, n (int64), total (int64 exact units).
    """
    import ray

    small_keys = np.asarray(small_keys)
    if len(small_keys) == 0:
        # inner-join with an empty small side: nothing can match — return
        # the empty result instead of letting searchsorted index [-1]
        return pd.DataFrame({
            "group": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "total": pd.Series(dtype="int64"),
        })
    if len(np.unique(small_keys)) != len(small_keys):
        # the key→label contract is a FUNCTION; a duplicate key would
        # silently match only its first occurrence instead of fanning out
        # like a real hash join — fail loudly
        raise ValueError("broadcast_join_sum: small_keys must be unique")

    order = np.argsort(small_keys, kind="stable")
    handle = ray.put((small_keys[order],
                      (small_vals if group_vals is None else group_vals)[order]))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys_sorted, grp_sorted = ray.get(handle)
        k = batch[join_col].to_numpy()
        pos = np.searchsorted(keys_sorted, k)
        pos_c = np.minimum(pos, len(keys_sorted) - 1)
        hit = keys_sorted[pos_c] == k
        w = weight_fn(batch).astype(np.int64)
        df = pd.DataFrame({
            "group": grp_sorted[pos_c[hit]],
            "w": w[hit],
        })
        g = df.groupby("group", as_index=False).agg(
            n=("w", "size"), total=("w", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    partials = big_ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = partials.groupby("group", as_index=False).sum()
    out["n"] = out["n"].astype(np.int64)
    out["total"] = out["total"].astype(np.int64)
    return out.sort_values("group").reset_index(drop=True)


def grouped_quantile_disc(ds, group_col: str, value_col: str,
                          qs: tuple = (0.25, 0.5, 0.75)):
    """EXACT per-group discrete quantiles (plus n/min/max) — the
    length-distribution profile a corpus audit reports per language /
    source before picking filter thresholds.

    Discrete quantile = the element at index ``max(ceil(q*n) - 1, 0)``
    of the group's sorted values — DuckDB's ``quantile_disc`` semantics,
    so integer inputs give a bit-exact oracle. Use binary-exact q values
    (0.25/0.5/0.75 — exact doubles) so ``q * n`` rounds identically on
    both sides; q=0.9 style decimals can differ in the last ulp.

    Topology: ONE hash-partition by group co-locates each group, then a
    vectorized lexsort + segment-boundary pick per partition — no
    per-group Python. Groups must fit a partition (language/source
    cardinality); for unbounded value streams use the mergeable
    :func:`histogram_quantiles` sketch instead.

    Returns columns: group_col, n, min, p{q*100}..., max (value dtype
    preserved for the quantile/min/max columns).
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: [], "n": [], "min": [], "max": []}
        if part.empty:
            out = pd.DataFrame(cols)
            for q in qs:
                out[f"p{int(q * 100)}"] = []
            return out
        vals = part[value_col].to_numpy()
        grp = part[group_col].to_numpy()
        order = np.lexsort((vals, grp))
        vals, grp = vals[order], grp[order]
        first = np.ones(len(grp), dtype=bool)
        first[1:] = grp[1:] != grp[:-1]
        starts = np.flatnonzero(first)
        ns = np.diff(np.append(starts, len(grp)))
        out = pd.DataFrame({
            group_col: grp[starts],
            "n": ns.astype(np.int64),
            "min": vals[starts],
            "max": vals[starts + ns - 1],
        })
        for q in qs:
            idx = np.maximum(np.ceil(q * ns).astype(np.int64) - 1, 0)
            out[f"p{int(q * 100)}"] = vals[starts + idx]
        return out

    return partitioned_group_map(ds, [group_col], fold)


def grouped_distinct_count(ds, group_col: str, distinct_col: str):
    """Per-group row count + EXACT distinct count of ``distinct_col``
    (daily-active-users shape: COUNT(*) + COUNT(DISTINCT user) per day).

    Each batch pre-aggregates (group, value, cnt) in-batch, then ONE
    hash-partition by the distinct VALUE co-locates every occurrence so
    the distinct count is a local first-occurrence count; per-partition
    partials (O(groups × partitions) rows, cluster-sized) fold on the
    driver. No corpus-scale shuffle, no sort.
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cnt = batch.groupby([group_col, distinct_col], as_index=False).size()
        return cnt.rename(columns={"size": "cnt"})

    pairs = ds.map_batches(partial, batch_format="pandas")

    def per_value_fold(part: pd.DataFrame) -> pd.DataFrame:
        nr = part.groupby(group_col, as_index=False)["cnt"].sum().rename(
            columns={"cnt": "n_rows"})
        nd = part.drop_duplicates([group_col, distinct_col]).groupby(
            group_col, as_index=False).size().rename(
            columns={"size": "n_distinct"})
        return nr.merge(nd, on=group_col)

    partials = partitioned_group_map(pairs, [distinct_col], per_value_fold)
    out = partials.to_pandas()
    out = out.groupby(group_col, as_index=False).agg(
        n_rows=("n_rows", "sum"), n_distinct=("n_distinct", "sum"))
    for c in ("n_rows", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)


def global_rank(ds, value_col: str, id_col: str, num_buckets: int = 1024):
    """Dense global ROW_NUMBER over (value_col, id_col) order WITHOUT a
    global sort — the distributed ranking behind "take the p-th
    percentile document" / curriculum ordering.

    Topology (same distributed-prefix-sum shape as
    ``text.pack_sequences``): one min/max pass bounds the value domain,
    rows bucket into ``num_buckets`` value RANGES, the per-bucket row
    counts (a bucket-sized table) prefix-sum on the driver into base
    ranks, and one ``partitioned_group_map`` on the bucket emits
    ``base[bucket] + local position`` after an in-partition sort by
    (value, id). Ranks are 1-based, bit-identical to SQL
    ``ROW_NUMBER() OVER (ORDER BY value, id)`` at any partitioning.

    Equal-width value ranges skew with the value distribution; a
    production variant samples quantile boundaries instead (the fold is
    unchanged). Ties across buckets cannot happen: a value lands in
    exactly one range.
    """
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Max, Min

    from matrixprofile_ray.util import partitioned_group_map

    # int-only contract: the bucket arithmetic and the fold both cast to
    # int64, which would silently truncate floats into wrong ranks
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    for col in (value_col, id_col):
        typ = types[col]
        if not pa.types.is_integer(typ):
            raise ValueError(
                f"global_rank requires integer columns; {col!r} is {typ}"
            )

    bounds = ds.aggregate(Min(value_col), Max(value_col))
    if bounds is None or bounds.get(f"min({value_col})") is None:
        import ray.data as rd

        # empty Arrow table keeps the schema (empty pandas would lose it)
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
        }))
    lo = int(bounds[f"min({value_col})"])
    hi = int(bounds[f"max({value_col})"])
    span = max(hi - lo + 1, 1)
    nb = min(num_buckets, span)
    width = -(-span // nb)  # ceil

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.int64)
        return batch.append_column(
            "bucket", pa.array((v - lo) // width, pa.int64()))

    with_bucket = ds.map_batches(
        add_bucket, batch_format="pyarrow").materialize()

    sizes = with_bucket.groupby("bucket").count().take_all()
    sizes.sort(key=lambda r: r["bucket"])
    base = np.zeros(nb, dtype=np.int64)
    acc = 0
    for row in sizes:
        base[int(row["bucket"])] = acc
        acc += int(row["count()"])

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["bucket", value_col, id_col], kind="mergesort")
        b = part["bucket"].to_numpy(dtype=np.int64)
        starts = np.ones(len(b), dtype=bool)
        starts[1:] = b[1:] != b[:-1]
        seg_start = np.flatnonzero(starts)
        seg_len = np.diff(np.append(seg_start, len(b)))
        local = np.arange(len(b), dtype=np.int64) - np.repeat(
            seg_start, seg_len)
        return pd.DataFrame({
            id_col: part[id_col].to_numpy(dtype=np.int64),
            value_col: part[value_col].to_numpy(dtype=np.int64),
            "rnk": base[b] + local + 1,
        })

    return partitioned_group_map(with_bucket, ["bucket"], fold)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants) — full
    avalanche over uint64, the per-value hash of the HLL sketch."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hll_distinct(ds, group_col: str, distinct_col: str, p: int = 12):
    """Approximate per-group distinct count via a MERGEABLE HyperLogLog
    sketch (Flajolet et al. 2007) — the 100-TB path where
    :func:`grouped_distinct_count`'s value-hash exchange (∝ distinct
    values) is too wide: the exchange here is O(groups × batches)
    rows of 2^p register bytes, independent of cardinality.

    Per batch: one splitmix64 pass, register index = top p hash bits,
    rank = leading-zero count of the low bits + 1 (vectorized via
    ``np.frexp`` — the low 64−p bits fit a double exactly for p ≥ 12),
    per-group register max via ``np.maximum.at``. Partials merge by
    ELEMENTWISE MAX (associative + idempotent → any partitioning gives
    identical registers; the hash is seed-fixed so the estimate is
    deterministic). Standard bias correction + linear-counting
    small-range fallback. Relative error ≈ 1.04/sqrt(2^p) (~1.6% at
    p=12).

    Returns pandas (group_col, est) sorted by group.
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    # the frexp rank trick needs the low 64-p bits to fit a double's
    # 52-bit mantissa exactly; >18 wastes registers for no accuracy gain
    if p < 12 or p > 18:
        raise ValueError(f"hll_distinct requires 12 <= p <= 18, got {p}")

    m = 1 << p
    shift = np.uint64(64 - p)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[distinct_col].to_numpy()
        h = _splitmix64(vals.astype(np.uint64))
        idx = (h >> shift).astype(np.int64)
        rest = (h & ((np.uint64(1) << shift) - np.uint64(1))).astype(
            np.float64)
        # bit_length via frexp: rest < 2^(64-p) <= 2^52 is double-exact
        _, exp = np.frexp(rest)
        rank = (int(shift) - exp + 1).astype(np.uint8)  # rest=0 → 64-p+1
        groups, ginv = np.unique(batch[group_col].to_numpy(),
                                 return_inverse=True)
        regs = np.zeros((len(groups), m), dtype=np.uint8)
        np.maximum.at(regs, (ginv, idx), rank)
        return pd.DataFrame({
            group_col: groups,
            "regs": [r.tobytes() for r in regs],  # one row per group
        })

    partials = ds.map_batches(partial, batch_format="pandas")

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        out_g, out_e = [], []
        for g, rows in part.groupby(group_col, sort=False):
            regs = np.frombuffer(
                b"".join(rows["regs"]), dtype=np.uint8
            ).reshape(len(rows), m).max(axis=0)
            est = _hll_estimate(regs, m)
            out_g.append(g)
            out_e.append(est)
        return pd.DataFrame({group_col: out_g, "est": out_e})

    out = partitioned_group_map(partials, [group_col], fold).to_pandas()
    out["est"] = out["est"].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)


def _hll_estimate(regs: np.ndarray, m: int) -> int:
    """Bias-corrected HLL estimate with the linear-counting fallback.

    The harmonic denominator sum(2^-M_j) is computed as the EXACT
    integer sum(2^(64-M_j)) / 2^64 (ranks are <= 53, so every term is an
    exact python int) — a float sum's result would depend on summation
    order, which would make the estimate partition-order-sensitive in
    the last ulp and un-mirrorable in SQL. The remaining float
    expression is fixed-order and mirrored verbatim by the
    hll_users_estimate oracle."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom = sum(
        int(c) << (64 - int(r))
        for r, c in zip(*np.unique(regs, return_counts=True))
    )
    e = alpha * m * m * 18446744073709551616.0 / float(denom)
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # small-range linear counting
    # half-away-from-zero (SQL ROUND semantics; e >= 0). frac is exact:
    # e - floor(e) of doubles >= 1 is a Sterbenz-safe subtraction.
    f = float(np.floor(e))
    return int(f) + (1 if e - f >= 0.5 else 0)


# --------------------------------------------------------------- bloom

def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher construction) over splitmix64-mixed keys."""
    h = _splitmix64(keys.astype(np.uint64))
    h1 = h >> np.uint64(32)
    h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)  # odd ⇒ full cycle
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def _bloom_set(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Build a bitset (uint64 words) with all ``keys`` inserted."""
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    pos = _bloom_positions(keys, m_bits, k).reshape(-1)
    np.bitwise_or.at(words, pos >> 6,
                     np.uint64(1) << (pos & 63).astype(np.uint64))
    return words


def _bloom_may_contain(words: np.ndarray, keys: np.ndarray,
                       m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (or FP)."""
    pos = _bloom_positions(keys, m_bits, k)
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return bits.all(axis=1)


def bloom_anti_join(big_ds, small_ds, big_key: str, small_key: str,
                    group_col: str, out_count: str = "n",
                    bits_per_key: int = 10, n_hashes: int = 7,
                    small_count: int | None = None):
    """Anti join via a broadcast Bloom prefilter + exact verification:
    big-side rows whose key has NO match in the small side, counted per
    ``group_col``. Result is EXACT — the filter only routes rows.

    The alternative topology to ``anti_join_count``'s shared-key
    shuffle, for when the big side dwarfs the small side (the 100-TB
    case: "drop every url already crawled"). Three stages:

    1. build — one bitset per small-side BLOCK (vectorized insert),
       OR-folded; the fold ships ``n_blocks × m/8`` bytes, never keys.
    2. prefilter — the bitset broadcasts once via ``ray.put``; big-side
       rows probing any zero bit are DEFINITELY absent and count
       immediately, zero shuffle for (1 - fp_rate) of the anti set.
    3. verify — only Bloom-positive rows (true matches + ~0.8% false
       positives at the default 10 bits/key) enter the exact
       ``anti_join_count`` shuffle, so the exchange is sized by the
       small side's match rate, not the big side's row count.

    ``small_count`` (estimated distinct keys) sizes the filter; when
    omitted one counting pass runs first. int64 keys only (the same
    contract global_rank enforces).
    """
    import pyarrow as pa
    import ray

    for ds, col in ((big_ds, big_key), (small_ds, small_key)):
        schema = ds.schema()
        typ = dict(zip(schema.names, schema.types))[col]
        # pandas-backed blocks report numpy dtypes / Python classes
        # instead of pyarrow types — normalize before checking
        if isinstance(typ, pa.DataType):
            ok = pa.types.is_integer(typ)
        else:
            try:
                ok = np.issubdtype(np.dtype(typ), np.integer)
            except TypeError:
                ok = False
        if not ok:
            raise ValueError(
                f"bloom_anti_join needs integer keys, got {col}: {typ}")

    if small_count is None:
        small_count = small_ds.count()
    m_bits = max(64, int(small_count) * bits_per_key)

    def block_bitset(batch: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(batch[small_key].to_numpy(dtype=np.int64))
        words = _bloom_set(ks, m_bits, n_hashes)
        return pd.DataFrame({"w": [words.tobytes()]})

    partials = small_ds.map_batches(
        block_bitset, batch_format="pandas",
        batch_size=65536).take_all()
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    for row in partials:  # one small OR per block, driver-side
        words |= np.frombuffer(row["w"], dtype=np.uint64)
    bloom_ref = ray.put(words)

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(bloom_ref)
        ks = batch[big_key].to_numpy(dtype=np.int64)
        maybe = _bloom_may_contain(w, ks, m_bits, n_hashes)
        definite = batch.loc[~maybe]
        partial = definite.groupby(group_col, as_index=False).size()
        neg = pd.DataFrame({
            "g": partial[group_col].astype(str).to_numpy(),
            "c": partial["size"].to_numpy(dtype=np.int64),
            "k": np.full(len(partial), -1, dtype=np.int64),
            "cand": np.zeros(len(partial), dtype=bool),
        })
        cand = pd.DataFrame({
            "g": batch.loc[maybe, group_col].astype(str).to_numpy(),
            "c": np.zeros(int(maybe.sum()), dtype=np.int64),
            "k": ks[maybe],
            "cand": np.ones(int(maybe.sum()), dtype=bool),
        })
        return pd.concat([neg, cand], ignore_index=True)

    routed = big_ds.map_batches(prefilter, batch_format="pandas")
    # definite negatives: already partial counts, tiny rollup
    negatives = routed.filter(expr="cand == False")
    candidates = routed.filter(expr="cand == True")

    verified = anti_join_count(
        candidates, small_ds.select_columns([small_key]),
        "k", small_key, "g", out_count="c")

    neg_df = negatives.select_columns(["g", "c"]).to_pandas()
    # verified holds only Bloom FALSE POSITIVES that survived the exact
    # check (usually none at 10 bits/key) — it is legitimately empty,
    # and empty pandas blocks drop their schema
    ver_df = verified.to_pandas()
    if not {"g", "c"}.issubset(ver_df.columns):
        ver_df = pd.DataFrame({"g": pd.Series(dtype=object),
                               "c": pd.Series(dtype=np.int64)})
    ver_df = ver_df[["g", "c"]]
    total = (
        pd.concat([neg_df, ver_df], ignore_index=True)
        .groupby("g", as_index=False)["c"].sum()
    )
    return pd.DataFrame({
        group_col: total["g"].to_numpy(),
        out_count: total["c"].to_numpy(dtype=np.int64),
    }).sort_values(group_col).reset_index(drop=True)
