"""Text-analysis batch transforms for large-scale training-data pipelines.

All stateless, vectorized over Arrow/numpy inside ``map_batches``:
token counting (whitespace), quality scoring (length/punct/digit/stopword
ratios), n-gram-heuristic language ID, and rolling-hash document
fingerprints. Designed for the ``documents`` table schema
(doc_id, text, lang, source, n_chars) but only require (doc_id, text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_count",
    "text_quality",
    "lang_id",
    "fingerprint",
    "token_histogram",
    "term_df_top",
    "TOP_STOPWORDS",
]

TOP_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
    "pt": ("o", "a", "os", "que", "um"),
}


def token_count(batch: pa.Table) -> pa.Table:
    """doc_id + n_tokens: whitespace-delimited token count (vectorized)."""
    toks = pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(batch["text"]), r"\s+")
    )
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pc.cast(toks, pa.int64()),
    })


# GPT-2-style pre-tokenizer, RE2-safe (no lookahead — the reference
# regex's trailing `\s+(?!\S)` is dropped, making this "BPE-ish"):
# contractions, space-prefixed letter runs, digit runs, punctuation runs,
# residual whitespace. RE2 is the engine on BOTH sides of the oracle
# (pyarrow.compute and DuckDB), so match counts are bit-identical.
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(batch: pa.Table) -> pa.Table:
    """doc_id + n_tokens (whitespace) + n_bpe_tokens (GPT-2-ish regex).

    The BPE-ish count is the pre-tokenizer match count — the upper bound a
    byte-pair vocabulary would start merging from; it is the cheap
    length-budget signal an LLM-data pipeline filters on."""
    ws = pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(batch["text"]), r"\s+")
    )
    bpe = pc.count_substring_regex(batch["text"], BPE_TOKEN_PATTERN)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pc.cast(ws, pa.int64()),
        "n_bpe_tokens": pc.cast(bpe, pa.int64()),
    })


def text_quality(batch: pa.Table) -> pa.Table:
    """Quality-scoring features per document.

    Columns: doc_id, n_chars, n_tokens, mean_token_len, digit_ratio,
    stopword_ratio. All as round-trippable float64/int64.
    """
    text = pc.utf8_trim_whitespace(batch["text"])
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    tokens = pc.split_pattern_regex(text, r"\s+")
    n_tokens = pc.cast(pc.list_value_length(tokens), pa.int64())
    n_digits = pc.utf8_length(pc.replace_substring_regex(text, r"[^0-9]", ""))

    nc = np.asarray(n_chars, dtype="d")
    nt = np.maximum(np.asarray(n_tokens, dtype="d"), 1.0)
    nd = np.asarray(n_digits, dtype="d")
    # mean token length over the non-space mass
    n_spaces = nt - 1.0
    mean_tok = (nc - n_spaces) / nt

    # vectorized stopword-token counting: re-pad every token with its own
    # surrounding spaces (no shared space between neighbors) so a
    # non-overlapping substring count of " w " equals the token count of w
    padded = pc.binary_join_element_wise(
        " ",
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", "  "),
        " ",
        "",
    )
    stop_hits = np.zeros(len(nc))
    for word in TOP_STOPWORDS:
        stop_hits += np.asarray(
            pc.count_substring(padded, f" {word} "), dtype="d"
        )
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": pa.array(np.round(mean_tok, 6), pa.float64()),
        "digit_ratio": pa.array(np.round(nd / np.maximum(nc, 1.0), 6), pa.float64()),
        "stopword_ratio": pa.array(np.round(stop_hits / nt, 6), pa.float64()),
    })


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-profile language guess: doc_id, lang_pred, lang_score."""
    text = pc.utf8_lower(batch["text"])
    langs = list(_LANG_MARKERS)
    scores = np.zeros((batch.num_rows, len(langs)))
    for j, lang in enumerate(langs):
        for marker in _LANG_MARKERS[lang]:
            hits = pc.count_substring(text, f" {marker} ")
            scores[:, j] += np.asarray(hits, dtype="d")
    best = np.argmax(scores, axis=1)
    total = np.maximum(scores.sum(axis=1), 1.0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang_pred": pa.array([langs[i] for i in best], pa.string()),
        "lang_score": pa.array(
            np.round(scores[np.arange(len(best)), best] / total, 6), pa.float64()
        ),
    })


def token_histogram(ds, k: int = 20):
    """Global top-k tokens by count (lowercased, whitespace-split).

    Partial-combine topology: each batch pre-aggregates its own token
    counts IN-BATCH (Arrow split + value_counts), so the groupby shuffles
    one row per (batch, distinct-token) — vocabulary-bounded, not
    corpus-bounded. Ties at the boundary break by token ascending, making
    the top-k deterministic.
    """
    import pandas as pd

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"])), r"\s+"
        )
        flat = pc.list_flatten(toks)
        counted = flat.value_counts()
        return pa.table({
            "token": counted.field("values"),
            "cnt": pc.cast(counted.field("counts"), pa.int64()),
        })

    totals = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
    )

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(
            [c if c != "sum(cnt)" else "cnt" for c in tbl.column_names]
        )

    top = (
        totals.map_batches(rename, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )
    return top


def term_df_top(ds, k: int = 10, group_col: str = "lang"):
    """Top-k terms per language by DOCUMENT frequency (the df table of
    tf-idf; integer counts, so the ranking is exactly reproducible).

    Partial-combine topology: each batch computes doc-unique (lang, token)
    pairs in one flatten + drop_duplicates and emits per-batch df partials
    — the groupby exchange is vocabulary-bounded, not corpus-bounded.
    Ties break by token ascending (deterministic top-k).
    """
    import pandas as pd

    from matrixprofile_ray.stages.relational import grouped_topk

    def partial_df(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"])), r"\s+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        pairs = pd.DataFrame({
            "doc": doc_idx,
            group_col: np.asarray(batch[group_col])[doc_idx],
            "token": np.asarray(pc.list_flatten(toks)),
        })
        pairs = pairs[pairs["token"] != ""]
        pairs = pairs.drop_duplicates(["doc", group_col, "token"])
        cnt = pairs.groupby([group_col, "token"], as_index=False).size()
        return pa.table({
            group_col: pa.array(cnt[group_col], pa.string()),
            "token": pa.array(cnt["token"], pa.string()),
            "doc_freq": pa.array(cnt["size"].to_numpy(dtype=np.int64)),
        })

    totals = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .sum("doc_freq")
    )

    def rename(tbl: pd.DataFrame) -> pd.DataFrame:
        return tbl.rename(columns={"sum(doc_freq)": "doc_freq"})

    totals = totals.map_batches(rename, batch_format="pandas")
    return grouped_topk(totals, group_col, "doc_freq", k=k,
                        extra_cols=("token",))


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_bytes(data: bytes) -> int:
    """FNV-1a 64-bit over raw bytes (vectorized via numpy cumulation)."""
    h = _FNV_OFFSET
    arr = np.frombuffer(data, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for b in arr.astype(np.uint64):
            h = (h ^ b) * _FNV_PRIME
    return int(h)


def fingerprint(batch: pa.Table, shingle: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint: doc_id, fp (int64 of min rolling hash).

    A content-defined fingerprint: the minimum of the 64-bit polynomial
    rolling hash over all byte shingles. Equal texts ⇒ equal fp; robust to
    being computed in any batch/block split.
    """
    texts = batch["text"].to_pylist()
    fps = np.empty(len(texts), dtype=np.uint64)
    base = np.uint64(1099511628211)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < shingle:
            fps[i] = np.uint64(_fnv1a_bytes(t.encode()))
            continue
        # polynomial rolling hash of each shingle, fully vectorized:
        # h(i) = sum b[i+k] * base^(shingle-1-k) mod 2^64
        powers = np.empty(shingle, dtype=np.uint64)
        powers[-1] = 1
        with np.errstate(over="ignore"):
            for k in range(shingle - 2, -1, -1):
                powers[k] = powers[k + 1] * base
            wins = np.lib.stride_tricks.sliding_window_view(b, shingle)
            hashes = (wins * powers[None, :]).sum(axis=1, dtype=np.uint64)
        fps[i] = hashes.min()
    return pa.table({
        "doc_id": batch["doc_id"],
        "fp": pa.array(fps.view(np.int64), pa.int64()),
    })
