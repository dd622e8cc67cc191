"""Similarity search over embedding columns (list<float>).

- ``brute_force_topk``: baseline exact cosine top-k. The query matrix is
  broadcast once (``ray.put`` / actor-constructor arg) and every batch does
  one numpy matmul against it — no shuffle, scales linearly with corpus.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets
  (sign-pattern hash), candidates only meet inside ONE groupby on the
  bucket key; exact re-scoring inside the bucket.
- ``near_duplicates``: embedding-cosine near-dup pairs via the same LSH
  bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["BruteForceTopK", "brute_force_topk", "lsh_topk", "near_duplicates"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-30)


class BruteForceTopK:
    """Actor-pool stage: per-batch exact cosine scores vs broadcast queries.

    Emits per (query_id, vec_id) candidate rows with local top-k per batch;
    the global top-k is a tiny sort+limit downstream. Setup (normalizing the
    query matrix) happens once per actor.
    """

    def __init__(self, queries: dict[int, np.ndarray], k: int = 10):
        self.qids = np.array(sorted(queries), dtype=np.int64)
        self.qmat = _normalize(
            np.vstack([np.asarray(queries[q], dtype="d") for q in self.qids])
        )
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.vstack(batch["embedding"].to_numpy()))
        ids = batch["vec_id"].to_numpy()
        sims = vecs @ self.qmat.T  # (batch, nq)
        out = {"query_id": [], "vec_id": [], "sim": []}
        k = min(self.k, len(ids))
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            top = np.argpartition(col, -k)[-k:]
            for t in top:
                out["query_id"].append(int(qid))
                out["vec_id"].append(int(ids[t]))
                out["sim"].append(round(float(col[t]), 6))
        return pd.DataFrame(out)


def brute_force_topk(ds, queries: dict[int, np.ndarray], k: int = 10,
                     concurrency=2):
    """Exact cosine top-k for each query vector; returns (query_id, vec_id, sim)."""
    candidates = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries": queries, "k": k},
        batch_format="pandas",
        concurrency=concurrency,
    )

    def global_topk(group: pd.DataFrame) -> pd.DataFrame:
        top = group.nlargest(k, ["sim", "vec_id"])
        top = top.sort_values(["sim", "vec_id"], ascending=[False, True])
        top = top.iloc[:k].copy()
        top["rank"] = np.arange(len(top), dtype=np.int64)
        return top

    return candidates.groupby("query_id").map_groups(
        global_topk, batch_format="pandas"
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(dim, nbits))


def _bucket_ids(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return (bits.astype(np.int64) * weights[None, :]).sum(axis=1)


def lsh_topk(ds, queries: dict[int, np.ndarray], k: int = 10, nbits: int = 8,
             dim: int | None = None):
    """LSH-bucketed ANN: only vectors sharing a query's sign-pattern bucket
    are scored. One groupby on the int bucket key; recall < 1 by design
    (approximate), precision exact within candidates.
    """
    qids = sorted(queries)
    qmat = _normalize(np.vstack([np.asarray(queries[q], dtype="d") for q in qids]))
    if dim is None:
        dim = qmat.shape[1]
    planes = _hyperplanes(dim, nbits)
    qbuckets = _bucket_ids(qmat, planes)
    wanted = {}
    for qid, qb in zip(qids, qbuckets):
        wanted.setdefault(int(qb), []).append(qid)
    qvec_by_id = {qid: qmat[i] for i, qid in enumerate(qids)}

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.vstack(batch["embedding"].to_numpy()))
        buckets = _bucket_ids(vecs, planes)
        keep = np.isin(buckets, list(wanted))
        return pd.DataFrame({
            "vec_id": batch["vec_id"].to_numpy()[keep],
            "bucket": buckets[keep],
            "embedding": [v for v, m in zip(batch["embedding"], keep) if m],
        })

    def score_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["bucket"].iloc[0])
        vecs = _normalize(np.vstack(group["embedding"].to_numpy()))
        ids = group["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "sim": []}
        for qid in wanted.get(bucket, []):
            sims = vecs @ qvec_by_id[qid]
            kk = min(k, len(ids))
            top = np.argsort(-sims)[:kk]
            for t in top:
                out["query_id"].append(qid)
                out["vec_id"].append(int(ids[t]))
                out["sim"].append(round(float(sims[t]), 6))
        return pd.DataFrame(out)

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(score_bucket, batch_format="pandas")
    )


def near_duplicates(ds, threshold: float = 0.95, nbits: int = 6,
                    dim: int | None = None):
    """Embedding-cosine near-dup pairs via LSH buckets + exact in-bucket scoring."""

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.vstack(batch["embedding"].to_numpy())
        planes = _hyperplanes(vecs.shape[1], nbits)
        buckets = _bucket_ids(_normalize(vecs), planes)
        out = batch[["vec_id", "embedding"]].copy()
        out["bucket"] = buckets
        return out

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "sim": pd.Series(dtype="float64"),
        })
        if len(group) < 2:
            return empty
        vecs = _normalize(np.vstack(group["embedding"].to_numpy()))
        ids = group["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        sims = vecs @ vecs.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame({
            "a": ids[iu[keep]].astype(np.int64),
            "b": ids[ju[keep]].astype(np.int64),
            "sim": np.round(sims[iu, ju][keep], 6),
        })

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
