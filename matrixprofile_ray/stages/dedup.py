"""Deduplication operators for web-scale corpora.

Five dedup families, each expressed Ray-Data-first:

- **exact**: hash-partition on the full text (one groupby), keep the
  smallest doc_id per group. At 100 TB the groupby key is a 64-bit content
  hash, not the text itself, so only 16 bytes/row shuffle.
- **MinHash + LSH**: per-batch shingle→minhash signatures (vectorized),
  band hashes as columns, then ONE groupby per band on the band hash —
  candidate pairs only ever meet inside a bucket (no all-pairs).
- **SimHash**: 64-bit simhash per doc; near-dups = equal hash (or equal
  in any rotated band for Hamming≤k variants).
- **n-gram Jaccard**: exact pairwise verification of LSH candidates.
- **embedding cosine**: see matrixprofile_ray.stages.ann (near_duplicates).

All hashing is seed-fixed and batch-order independent, so results are
identical across block splits and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_dedup",
    "ngram_jaccard",
]

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """64-bit polynomial hashes of all k-byte shingles (vectorized)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    base = np.uint64(1099511628211)
    powers = np.empty(k, dtype=np.uint64)
    powers[-1] = 1
    with np.errstate(over="ignore"):
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * base
        wins = np.lib.stride_tricks.sliding_window_view(b, k)
        return np.unique((wins * powers[None, :]).sum(axis=1, dtype=np.uint64))


# universal-hash parameters for the minhash permutations, seed-fixed
def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    batch: pa.Table,
    num_perm: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
) -> pa.Table:
    """doc_id + minhash signature + per-band bucket hashes.

    Output: doc_id, sig (list<uint64 as int64>), band_0..band_{bands-1}
    (int64 bucket keys). Rows with equal band_i values are LSH candidates.
    """
    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands
    texts = batch["text"].to_pylist()
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t, shingle_k)
            # (a*x+b) mod p, min over shingles, vectorized (perm × shingle)
            vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
            sigs[i] = vals.min(axis=1)
    cols = {"doc_id": batch["doc_id"],
            "sig": pa.array(sigs.view(np.int64).tolist(),
                            pa.list_(pa.int64()))}
    with np.errstate(over="ignore"):
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            # FNV-style mix of the band rows into one bucket key
            h = np.full(len(texts), 0xCBF29CE484222325, dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ seg[:, r]) * np.uint64(0x100000001B3)
            cols[f"band_{bi}"] = pa.array(h.view(np.int64), pa.int64())
    return pa.table(cols)


def minhash_dedup_pairs(
    ds,
    num_perm: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    threshold: float = 0.8,
):
    """Dataset(doc_id, text) → Dataset of near-duplicate pairs.

    Topology: map_batches(signatures) → for each band, groupby(band hash)
    → within-group pairing → union → exact Jaccard estimate from
    signatures, filter ≥ threshold, dedup pairs. The only shuffles are the
    per-band groupbys on 8-byte keys.
    """
    def long_signatures(batch: pa.Table) -> pa.Table:
        """One row per (doc, band): the 16-per-band groupbys become ONE
        groupby on the composite (band, bucket) key."""
        sig_tbl = minhash_signatures(batch, num_perm, shingle_k, bands)
        n = sig_tbl.num_rows
        parts = []
        for bi in range(bands):
            parts.append(pa.table({
                "band": pa.array(np.full(n, bi, dtype=np.int64)),
                "bucket": sig_tbl[f"band_{bi}"],
                "doc_id": sig_tbl["doc_id"],
                "sig": sig_tbl["sig"],
            }))
        return pa.concat_tables(parts)

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            })
        ids = group["doc_id"].to_numpy()
        sig = np.vstack(group["sig"].to_numpy())
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        out_a, out_b, out_s = [], [], []
        for i in range(len(ids)):
            eq = (sig[i + 1 :] == sig[i]).mean(axis=1)
            keep = eq >= threshold
            for j, s in zip(np.flatnonzero(keep), eq[keep]):
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
                out_s.append(float(s))
        return pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    allpairs = (
        ds.map_batches(long_signatures, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    def _rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(
            [c if c != "max(sim)" else "sim" for c in tbl.column_names]
        )

    # a pair can surface from several bands — keep one copy
    return (
        allpairs.groupby(["a", "b"]).max("sim")
        .map_batches(_rename, batch_format="pyarrow")
    )


def simhash(batch: pa.Table, shingle_k: int = 5) -> pa.Table:
    """64-bit SimHash per document: doc_id, simhash (int64)."""
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, shingle_k)
        # bit-count matrix: (n_shingles, 64) of 0/1
        bits = ((sh[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(sh)  # +1 / -1 majority
        out[i] = np.uint64(0)
        mask = votes > 0
        out[i] = np.sum(np.where(mask, np.uint64(1) << bit_idx, np.uint64(0)))
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(out.view(np.int64), pa.int64()),
    })


def simhash_dedup(ds, shingle_k: int = 5):
    """Exact-simhash duplicate groups: one groupby on the 64-bit hash."""
    hashed = ds.map_batches(
        lambda b: simhash(b, shingle_k), batch_format="pyarrow"
    )

    def first_per_group(group: pd.DataFrame) -> pd.DataFrame:
        keep = group["doc_id"].min()
        return pd.DataFrame({
            "simhash": [group["simhash"].iloc[0]],
            "keep_doc_id": [keep],
            "group_size": [len(group)],
        })

    return hashed.groupby("simhash").map_groups(
        first_per_group, batch_format="pandas"
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: content-hash groupby, keep smallest id per text.

    Returns (kept doc ids + group sizes). The groupby key is the 64-bit
    FNV hash of the text — at corpus scale only (hash, id) pairs shuffle;
    hash collisions are broken by carrying the text length as a checksum.
    """
    def hash_batch(batch: pa.Table) -> pa.Table:
        import zlib

        texts = batch[text_col].to_pylist()
        h = np.array(
            [zlib.crc32(t.encode()) + (len(t) << 32) for t in texts],
            dtype=np.int64,
        )
        return pa.table({
            id_col: batch[id_col],
            "content_hash": pa.array(h, pa.int64()),
        })

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": [int(group[id_col].min())],
            "dup_count": [len(group)],
        })

    return hashed.groupby("content_hash").map_groups(
        keep_first, batch_format="pandas"
    )


def ngram_jaccard(batch: pa.Table, other: dict[int, set], n: int = 3) -> pa.Table:
    """Exact word-n-gram Jaccard of each row against a broadcast doc set.

    ``other`` is {doc_id: set(ngram)} broadcast via ray.put — the
    small-side-lookup pattern (no shuffle join).
    """
    def grams(text: str) -> set:
        toks = text.split()
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    rows = {"a": [], "b": [], "jaccard": []}
    for i in range(batch.num_rows):
        did = batch["doc_id"][i].as_py()
        g = grams(batch["text"][i].as_py())
        for oid, og in other.items():
            if oid >= did or not g or not og:
                continue
            j = len(g & og) / len(g | og)
            rows["a"].append(oid)
            rows["b"].append(did)
            rows["jaccard"].append(round(j, 6))
    return pa.table({
        "a": pa.array(rows["a"], pa.int64()),
        "b": pa.array(rows["b"], pa.int64()),
        "jaccard": pa.array(rows["jaccard"], pa.float64()),
    })
