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
    "heavy_hitters",
    "pack_sequences",
    "trigram_model_score",
    "repetition_stats",
    "dup_ngram_corpus",
    "decontaminate",
    "bigram_topk",
    "chunk_documents",
    "source_stats",
    "vocab_stats",
    "rare_term_score",
    "ngram_novelty",
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


def heavy_hitters(ds, k: int = 50, text_col: str = "text",
                  max_candidates: int = 100_000):
    """EXACT corpus heavy hitters: tokens with count > n_total/k, via the
    2-pass local-candidate protocol (Misra-Gries-style candidate pass +
    exact verification pass).

    Pass 1 never shuffles the vocabulary: each batch counts its own
    tokens in-batch and emits ONLY its local heavy hitters (cnt_b*k >
    n_b) — by pigeonhole at most k-1 rows per batch — plus one sentinel
    row carrying the batch token total. Pigeonhole also gives the
    exactness guarantee: a token with global cnt*k > n_total must be
    locally heavy in at least one batch (if cnt_b*k <= n_b everywhere,
    summing gives cnt*k <= n_total), so the candidate union is a strict
    superset of the true heavy hitters. The candidate union is
    vocabulary-of-locally-heavy-sized (stopword-scale, NOT corpus-scale;
    guarded by ``max_candidates`` so pathological corpora fail loudly
    instead of flooding the driver).

    Pass 2 broadcasts the candidate set once (``ray.put``) and counts
    ONLY candidate tokens per batch — a |C|-bounded exchange — then
    filters cnt*k > n_total exactly. All arithmetic is int64 counts, so
    the result is bit-reproducible under any partitioning and matches a
    full-scan SQL oracle exactly.

    Returns a pandas DataFrame (token, cnt, n_total) sorted by
    cnt desc, token asc.
    """
    import pandas as pd
    import ray

    def local_heavy(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])), r"\s+"
        )
        counted = pc.list_flatten(toks).value_counts()
        tok = np.asarray(counted.field("values"))
        cnt = np.asarray(counted.field("counts"), dtype=np.int64)
        keep = tok != ""
        tok, cnt = tok[keep], cnt[keep]
        n_b = int(cnt.sum())
        heavy = cnt * k > n_b
        return pa.table({
            "token": pa.array(
                np.concatenate((tok[heavy], [""])), pa.string()),
            "cnt": pa.array(
                np.concatenate((cnt[heavy], [n_b])), pa.int64()),
        })

    cand = (
        ds.map_batches(local_heavy, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .take_all()  # bounded: locally-heavy vocabulary + 1 sentinel
    )
    n_total = 0
    cand_set = set()
    for row in cand:
        if row["token"] == "":
            n_total = int(row["sum(cnt)"])
        else:
            cand_set.add(row["token"])
    if len(cand_set) > max_candidates:
        raise ValueError(
            f"heavy_hitters candidate union {len(cand_set)} exceeds "
            f"max_candidates={max_candidates}; raise k or the guard"
        )
    cand_ref = ray.put(np.array(sorted(cand_set), dtype=object))

    def count_candidates(batch: pa.Table) -> pa.Table:
        cand_arr = ray.get(cand_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])), r"\s+"
        )
        counted = pc.list_flatten(toks).value_counts()
        tok = np.asarray(counted.field("values"))
        cnt = np.asarray(counted.field("counts"), dtype=np.int64)
        keep = np.isin(tok, cand_arr)
        return pa.table({
            "token": pa.array(tok[keep], pa.string()),
            "cnt": pa.array(cnt[keep], pa.int64()),
        })

    exact = (
        ds.map_batches(count_candidates, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .take_all()  # bounded by |C|
    )
    df = pd.DataFrame(
        [(r["token"], int(r["sum(cnt)"])) for r in exact],
        columns=["token", "cnt"],
    )
    df = df[df["cnt"] * k > n_total]
    df["n_total"] = np.int64(n_total)
    return df.sort_values(
        ["cnt", "token"], ascending=[False, True]
    ).reset_index(drop=True)


def _char_trigram_ids(batch: pa.Table, text_col: str) -> list:
    """Per-doc char-trigram ids: lowercase, UTF-32 decode (one C call per
    doc), sliding 3-window packed into int64 (codepoints < 2^21, so
    c0<<42 | c1<<21 | c2 is exact and mirrors BIGINT arithmetic in SQL)."""
    out = []
    for t in pc.utf8_lower(batch[text_col]).to_pylist():
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        cp = cp.astype(np.int64)
        if cp.size < 3:
            out.append(np.empty(0, dtype=np.int64))
        else:
            out.append((cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:])
    return out


def trigram_model_score(ds, top_v: int = 4096, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Corpus-conditioned quality scoring — the two-pass shape behind
    CCNet/KenLM-style perplexity filtering, kept in exact integers:

    1. TRAIN: count char trigrams over the whole corpus (in-batch
       ``np.unique`` partials → vocabulary-bounded groupby) and keep the
       top ``top_v`` by (count desc, tri_id asc) — a deterministic
       reference model, broadcast once via ``ray.put``.
    2. SCORE: every doc gets n_tri (trigram positions), n_oov (positions
       whose trigram is OUTSIDE the model — the out-of-vocabulary rate a
       perplexity filter thresholds on) and evidence (sum of model
       counts over its positions).

    All outputs are int64 counts, so the result is bit-reproducible and
    matches a full SQL mirror (LATERAL trigram unnest + QUALIFY top-V +
    left join) exactly. Two passes over the text are the deliberate
    cost; the model itself is top_v-bounded regardless of corpus size.

    Returns a Dataset (doc_id, n_tri, n_oov, evidence).
    """
    import pandas as pd
    import ray

    def train_partial(batch: pa.Table) -> pa.Table:
        ids = _char_trigram_ids(batch, text_col)
        allids = (np.concatenate(ids) if ids
                  else np.empty(0, dtype=np.int64))
        uniq, cnt = np.unique(allids, return_counts=True)
        return pa.table({
            "tri_id": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    totals = (
        ds.map_batches(train_partial, batch_format="pyarrow")
        .groupby("tri_id")
        .sum("cnt")
    )

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(
            [c if c != "sum(cnt)" else "cnt" for c in tbl.column_names])

    top = (
        totals.map_batches(rename, batch_format="pyarrow")
        .sort(["cnt", "tri_id"], descending=[True, False])
        .limit(top_v)
        .take_all()
    )
    model_tri = np.array(sorted(r["tri_id"] for r in top), dtype=np.int64)
    order = np.argsort([r["tri_id"] for r in top], kind="mergesort")
    model_cnt = np.array([r["cnt"] for r in top],
                         dtype=np.int64)[order]
    model_ref = ray.put((model_tri, model_cnt))

    def score(batch: pa.Table) -> pd.DataFrame:
        tri, cnt = ray.get(model_ref)
        ids = _char_trigram_ids(batch, text_col)
        docs = np.asarray(batch[id_col])
        n_tri = np.array([len(a) for a in ids], dtype=np.int64)
        n_oov = np.zeros(len(ids), dtype=np.int64)
        evid = np.zeros(len(ids), dtype=np.int64)
        for i, a in enumerate(ids):
            if not len(a):
                continue
            pos = np.searchsorted(tri, a)
            pos_c = np.minimum(pos, len(tri) - 1) if len(tri) else pos
            hit = (tri[pos_c] == a) if len(tri) else np.zeros(len(a), bool)
            n_oov[i] = len(a) - int(hit.sum())
            evid[i] = int(cnt[pos_c[hit]].sum()) if len(tri) else 0
        keep = n_tri > 0            # mirror: docs shorter than 3 chars drop
        return pd.DataFrame({
            id_col: docs[keep],
            "n_tri": n_tri[keep],
            "n_oov": n_oov[keep],
            "evidence": evid[keep],
        })

    return ds.map_batches(score, batch_format="pyarrow")


def pack_sequences(ds, cap: int = 2048, num_buckets: int = 1024):
    """Global sequence packing for LLM training: assign every document
    its start offset in the concatenated token stream (ordered by
    doc_id) and the fixed-capacity training bin that offset lands in.

    This is a distributed PREFIX SUM — the op behind "pack documents
    into 2048-token sequences". Topology (no corpus-sized shuffle, no
    global sort):

    1. one tokenize pass → slim (doc_id, n_tokens) counts, materialized
       once (16 B/row — at 10^10 docs that is ~160 GB spread over the
       cluster's object store, the deliberate cost of consuming it
       thrice);
    2. min/max(doc_id) + per-RANGE-bucket token sums
       (``groupby(bucket).sum``) — a ``num_buckets``-row table whose
       running sum on the driver gives each bucket's base offset;
    3. one ``partitioned_group_map`` on the bucket: sort the bucket's
       docs by doc_id, local cumsum, add the broadcast base.

    All arithmetic is int64 token counts, so offsets and bin ids are
    bit-identical to the SQL window oracle
    (``SUM(n_tokens) OVER (ORDER BY doc_id ROWS ... 1 PRECEDING)``) at
    any partitioning. Buckets are doc_id ranges, so a skewed id space
    skews bucket sizes — acceptable because the per-bucket fold is a
    cumsum over a slim frame, not a kernel.

    Returns a Dataset (doc_id, n_tokens, start_offset, bin).
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    counts = ds.map_batches(token_count, batch_format="pyarrow")
    counts = counts.materialize()

    from ray.data.aggregate import Max, Min

    bounds = counts.aggregate(Min("doc_id"), Max("doc_id"))  # one pass
    lo = int(bounds["min(doc_id)"])
    hi = int(bounds["max(doc_id)"])
    span = max(hi - lo + 1, 1)
    nb = min(num_buckets, span)
    width = -(-span // nb)  # ceil; (d-lo)//width < nb, no int64 overflow

    def add_bucket(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        b = (d - lo) // width
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    with_bucket = counts.map_batches(add_bucket, batch_format="pyarrow")

    sums = with_bucket.groupby("bucket").sum("n_tokens").take_all()
    sums.sort(key=lambda r: r["bucket"])
    base = np.zeros(nb, dtype=np.int64)
    acc = 0
    for row in sums:
        base[int(row["bucket"])] = acc
        acc += int(row["sum(n_tokens)"])

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values("doc_id", kind="mergesort")
        n = part["n_tokens"].to_numpy(dtype=np.int64)
        b = part["bucket"].to_numpy(dtype=np.int64)
        cs = np.cumsum(n) - n
        # rebase each bucket's local prefix to the global base offset
        starts = np.ones(len(b), dtype=bool)
        starts[1:] = b[1:] != b[:-1]
        seg_start = np.flatnonzero(starts)
        seg_len = np.diff(np.append(seg_start, len(b)))
        local0 = np.repeat(cs[seg_start], seg_len)
        off = cs - local0 + base[b]
        return pd.DataFrame({
            "doc_id": part["doc_id"].to_numpy(dtype=np.int64),
            "n_tokens": n,
            "start_offset": off,
            "bin": off // cap,
        })

    return partitioned_group_map(with_bucket, ["bucket"], fold)


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


def _split_words_flat(batch: pa.Table, text_col: str = "text"):
    """Whitespace-tokenize a batch into (flat_tokens, doc_idx, lens).

    Same tokenization as :func:`term_df_top` minus the lowercasing:
    ``trim`` then split on ``\\s+`` — mirrored verbatim by the SQL
    oracles as ``string_split_regex(trim(text), '\\s+')``. Empty tokens
    are NOT filtered (an all-whitespace doc yields one empty token on
    both sides), keeping engine and oracle positional semantics equal.
    """
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), r"\s+"
    )
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = np.asarray(pc.list_flatten(toks))
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return flat, doc_idx, lens


def repetition_stats(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style within-document repetition stats, one row per doc.

    The repetition family of quality filters (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1) flags boilerplate-heavy web
    pages by the fraction of repeated words / word n-grams. Emitted
    columns (all exact-integer counts plus three single-division
    fractions, so the result is bit-reproducible under any batch split):

    - ``n_words`` / ``n_distinct_words`` and
      ``dup_word_frac = (n_words - n_distinct_words) / n_words``
    - ``n_bigrams`` / ``n_distinct_bigrams`` and
      ``dup_bigram_frac = (n_bigrams - n_distinct_bigrams) / n_bigrams``
    - ``top_bigram_n`` (count of the most frequent bigram) and
      ``top_bigram_frac = top_bigram_n / n_bigrams``

    Stateless and per-document, so it composes as a plain ``map_batches``
    with zero shuffle — the cheapest possible quality-filter shape at
    100 TB. Fully vectorized: one ``pd.factorize`` over the flat token
    array, then lexsort + first-occurrence masks + ``bincount`` /
    ``maximum.at`` for the per-doc distinct and mode counts (no Python
    loop over rows).
    """
    import pandas as pd

    n = batch.num_rows
    if n == 0:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "n_words": pa.array([], pa.int64()),
            "n_distinct_words": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "n_distinct_bigrams": pa.array([], pa.int64()),
            "top_bigram_n": pa.array([], pa.int64()),
            "dup_word_frac": pa.array([], pa.float64()),
            "dup_bigram_frac": pa.array([], pa.float64()),
            "top_bigram_frac": pa.array([], pa.float64()),
        })
    flat, doc_idx, lens = _split_words_flat(batch, text_col)
    codes, _ = pd.factorize(flat)
    codes = codes.astype(np.int64)

    # distinct words per doc: sort (doc, code), count first occurrences
    order = np.lexsort((codes, doc_idx))
    sc, sd = codes[order], doc_idx[order]
    first = np.ones(len(sc), dtype=bool)
    first[1:] = (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1])
    n_distinct_words = np.bincount(sd[first], minlength=n).astype(np.int64)

    # bigrams: adjacent token pairs within the same doc, encoded as one
    # int64 key (codes are < len(flat), so code*V + code never wraps)
    same = doc_idx[1:] == doc_idx[:-1]
    v = np.int64(len(flat) + 1)
    bg = codes[:-1][same] * v + codes[1:][same]
    bdoc = doc_idx[:-1][same]
    n_bigrams = np.maximum(lens - 1, 0)
    border = np.lexsort((bg, bdoc))
    bgs, bds = bg[border], bdoc[border]
    bfirst = np.ones(len(bgs), dtype=bool)
    if len(bgs):
        bfirst[1:] = (bgs[1:] != bgs[:-1]) | (bds[1:] != bds[:-1])
    n_distinct_bigrams = np.bincount(
        bds[bfirst], minlength=n).astype(np.int64) if len(bgs) else (
        np.zeros(n, dtype=np.int64))

    top = np.zeros(n, dtype=np.int64)
    if len(bgs):
        bounds = np.flatnonzero(bfirst)
        run_len = np.diff(np.append(bounds, len(bgs)))
        np.maximum.at(top, bds[bfirst], run_len)

    # single-division fractions of exact ints — IEEE correctly rounded,
    # so they match the SQL (a - b)::DOUBLE / a::DOUBLE bit-for-bit
    nw = lens.astype(np.float64)
    nb = n_bigrams.astype(np.float64)
    dup_word_frac = np.where(
        lens > 0,
        (lens - n_distinct_words).astype(np.float64) / np.where(nw > 0, nw, 1.0),
        0.0)
    dup_bigram_frac = np.where(
        n_bigrams > 0,
        (n_bigrams - n_distinct_bigrams).astype(np.float64)
        / np.where(nb > 0, nb, 1.0),
        0.0)
    top_bigram_frac = np.where(
        n_bigrams > 0,
        top.astype(np.float64) / np.where(nb > 0, nb, 1.0),
        0.0)
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(lens),
        "n_distinct_words": pa.array(n_distinct_words),
        "n_bigrams": pa.array(n_bigrams),
        "n_distinct_bigrams": pa.array(n_distinct_bigrams),
        "top_bigram_n": pa.array(top),
        "dup_word_frac": pa.array(dup_word_frac, pa.float64()),
        "dup_bigram_frac": pa.array(dup_bigram_frac, pa.float64()),
        "top_bigram_frac": pa.array(top_bigram_frac, pa.float64()),
    })


def _distinct_gram_pairs(batch: pa.Table, n: int, id_col: str,
                         text_col: str) -> pa.Table:
    """Distinct (word-n-gram, doc_id) pairs of one batch — the shared
    gram builder of :func:`dup_ngram_corpus` and :func:`ngram_novelty`.
    Vectorized: one flat tokenize, start positions whose whole n-window
    stays inside one doc, object-array string concat, drop_duplicates."""
    import pandas as pd

    flat, doc_idx, lens = _split_words_flat(batch, text_col)
    ids = np.asarray(batch[id_col]).astype(np.int64)
    m = len(flat)
    if m < n:
        return pa.table({
            "gram": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
        })
    # start positions whose whole n-window stays inside one doc
    starts = np.flatnonzero(doc_idx[: m - n + 1] == doc_idx[n - 1:])
    gram = flat[starts].astype(object)
    for k in range(1, n):
        gram = gram + " "
        gram = gram + flat[starts + k]
    pairs = pd.DataFrame({
        "gram": gram,
        id_col: ids[doc_idx[starts]],
    }).drop_duplicates()
    return pa.table({
        "gram": pa.array(pairs["gram"], pa.string()),
        id_col: pa.array(pairs[id_col].to_numpy(dtype=np.int64)),
    })


def dup_ngram_corpus(ds, n: int = 5, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Corpus-wide duplicate word-n-gram fraction per document.

    The n-gram-granular form of exact-substring deduplication (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): a document's 5-gram is *duplicated* when at least one
    OTHER document contains the same 5-gram. Returns one row per doc
    (only docs with >= n words): ``doc_id, n_grams`` (distinct n-grams
    in the doc), ``n_dup`` (those shared with another doc).

    Scale shape: the ONE wide exchange is the hash-partition of the
    distinct (gram, doc_id) pairs by gram — the same slim shuffle
    topology as MinHash banding (stages/dedup.py). Each gram partition
    counts distinct docs per gram vectorized and pre-aggregates its
    per-doc partials (two ints per doc per partition), so the second
    exchange is doc-cardinality-bounded, not token-bounded. No stage
    ever materializes the corpus.
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    def distinct_grams(batch: pa.Table) -> pa.Table:
        return _distinct_gram_pairs(batch, n, id_col, text_col)

    pairs = ds.map_batches(distinct_grams, batch_format="pyarrow")

    def per_gram_fold(part: pd.DataFrame) -> pd.DataFrame:
        # pairs are distinct per doc already (a doc lives in one batch);
        # defensive dedup is a no-op then, and keeps the fold correct if
        # a caller ever feeds non-distinct pairs
        part = part.drop_duplicates(["gram", id_col])
        ndocs = part.groupby("gram", sort=False)[id_col].transform("nunique")
        part = part.assign(dup=(ndocs >= 2).astype(np.int64))
        return part.groupby(id_col, as_index=False).agg(
            n_grams=("gram", "count"), n_dup=("dup", "sum"))

    partials = partitioned_group_map(pairs, ["gram"], per_gram_fold)

    def per_doc_fold(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(id_col, as_index=False).agg(
            n_grams=("n_grams", "sum"), n_dup=("n_dup", "sum"))

    return partitioned_group_map(partials, [id_col], per_doc_fold)


# two independent odd bases: odd => invertible mod 2^64, so window
# hashes normalize via prefix sums x inverse powers (no scalar loop)
_SPAN_B1 = np.uint64(0x9E3779B97F4A7C15)
_SPAN_B2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _inv_u64(b: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd b modulo 2^64 (Newton, 5 steps)."""
    x = b  # correct to 3 bits
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
        for _ in range(5):
            x = x * (np.uint64(2) - b * x)
    return x


def _rolling_hash_u64(cp: np.ndarray, L: int, base: np.uint64) -> np.ndarray:
    """All L-window polynomial hashes of codepoint array ``cp`` mod 2^64.

    h(i) = sum_{j<L} cp[i+j] * base^j, computed without a scalar loop:
    S[k] = sum_{j<k} cp[j] * base^j (prefix), then
    h(i) = (S[i+L] - S[i]) * base^{-i} — exact because odd bases are
    invertible mod 2^64 and numpy uint64 arithmetic wraps mod 2^64.
    """
    n = len(cp)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    pows = np.ones(n, dtype=np.uint64)
    if n > 1:
        np.cumprod(np.full(n - 1, base, dtype=np.uint64), out=pows[1:])
    inv_pows = np.ones(n, dtype=np.uint64)
    if n > 1:
        np.cumprod(np.full(n - 1, _inv_u64(base), dtype=np.uint64),
                   out=inv_pows[1:])
    pref = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(cp.astype(np.uint64) * pows, out=pref[1:])
    m = n - L + 1
    return (pref[L:] - pref[:m]) * inv_pows[:m]


def _span_gram_hashes(text: str, L: int) -> tuple[np.ndarray, np.ndarray]:
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    return (_rolling_hash_u64(cp, L, _SPAN_B1),
            _rolling_hash_u64(cp, L, _SPAN_B2))


def _pairs_member(d1: np.ndarray, d2: np.ndarray,
                  q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    """Membership of query (q1,q2) pairs in the lexsorted dup set
    (d1,d2): two searchsorteds on d1, exact h2 check; the rare h1-tie
    buckets (several dup grams sharing h1) fall back to a tiny loop."""
    if not len(d1) or not len(q1):
        return np.zeros(len(q1), dtype=bool)
    lo = np.searchsorted(d1, q1, side="left")
    hi = np.searchsorted(d1, q1, side="right")
    hit = np.zeros(len(q1), dtype=bool)
    single = hi - lo == 1
    hit[single] = d2[lo[single]] == q2[single]
    for i in np.flatnonzero(hi - lo > 1):
        hit[i] = bool((d2[lo[i]:hi[i]] == q2[i]).any())
    return hit


def dup_span_stats(ds, L: int = 20, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Character-level duplicated-substring span coverage per document —
    the ExactSubstr statistic of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", reference has no
    counterpart): a character is *duplicated* iff it lies inside some
    substring of length >= L that occurs at least twice in the corpus
    (counting repeats within the same document), which holds exactly
    when a duplicated L-gram covers it. Returns one row per document:
    ``doc_id, doc_len`` (codepoints), ``n_dup_chars`` (covered
    codepoints) and ``n_spans`` (maximal covered runs) — all exact
    int64, so ``doc_len - n_dup_chars`` is the post-dedup clean length.

    Scale shape: pass 1 ships distinct (h1, h2, count) gram-hash rows
    per batch (an in-batch combiner — never one row per character) into
    ONE hash-partition fold; the duplicated set broadcasts once via
    ``ray.put`` (its size is bounded by the corpus's duplicated-gram
    cardinality; if that ever rivals the corpus, route pass 2 through
    the :func:`dup_ngram_corpus` partition-join topology instead), and
    pass 2 is a zero-shuffle ``map_batches`` marking coverage with a
    diff/cumsum — no stage materializes text off-worker. Hashes are
    2 x 64-bit independent polynomials (collision odds ~ G^2 / 2^128
    for G distinct grams: negligible at any realistic corpus size).
    """
    import pandas as pd
    import ray

    from matrixprofile_ray.util import partitioned_group_map

    def gram_partial(batch: pa.Table) -> pa.Table:
        h1s, h2s = [], []
        for t in batch[text_col].to_pylist():
            a, b = _span_gram_hashes(t or "", L)
            h1s.append(a)
            h2s.append(b)
        h1 = (np.concatenate(h1s) if h1s
              else np.empty(0, dtype=np.uint64))
        h2 = (np.concatenate(h2s) if h2s
              else np.empty(0, dtype=np.uint64))
        # count occurrences (not distinct docs): same-doc repeats are
        # duplicates too, per the ExactSubstr definition
        pair = np.empty(len(h1), dtype=[("h1", "<u8"), ("h2", "<u8")])
        pair["h1"], pair["h2"] = h1, h2
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            "h1": pa.array(uniq["h1"], pa.uint64()),
            "h2": pa.array(uniq["h2"], pa.uint64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partials = ds.map_batches(gram_partial, batch_format="pyarrow")

    def dup_fold(part: pd.DataFrame) -> pd.DataFrame:
        tot = part.groupby(["h1", "h2"], as_index=False)["cnt"].sum()
        return tot.loc[tot["cnt"] >= 2, ["h1", "h2"]]

    dup = partitioned_group_map(
        partials, ["h1", "h2"], dup_fold).to_pandas()
    if len(dup):
        d1 = dup["h1"].to_numpy(dtype=np.uint64)
        d2 = dup["h2"].to_numpy(dtype=np.uint64)
        order = np.lexsort((d2, d1))
        d1, d2 = d1[order], d2[order]
    else:
        d1 = d2 = np.empty(0, dtype=np.uint64)
    dup_ref = ray.put((d1, d2))

    def mark(batch: pa.Table) -> pd.DataFrame:
        dd1, dd2 = ray.get(dup_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        texts = batch[text_col].to_pylist()
        doc_len = np.zeros(len(texts), dtype=np.int64)
        n_cov = np.zeros(len(texts), dtype=np.int64)
        n_spans = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            doc_len[i] = len(t)
            q1, q2 = _span_gram_hashes(t, L)
            if not len(q1):
                continue
            starts = np.flatnonzero(_pairs_member(dd1, dd2, q1, q2))
            if not len(starts):
                continue
            delta = np.zeros(doc_len[i] + 1, dtype=np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + L, -1)
            cov = np.cumsum(delta[:-1]) > 0
            n_cov[i] = int(cov.sum())
            n_spans[i] = int(cov[0]) + int(
                (cov[1:] & ~cov[:-1]).sum())
        return pd.DataFrame({
            id_col: ids,
            "doc_len": doc_len,
            "n_dup_chars": n_cov,
            "n_spans": n_spans,
        })

    return ds.map_batches(mark, batch_format="pyarrow")


def decontaminate(ds, n: int = 5, bench_mod: int = 97,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Benchmark decontamination by word-n-gram overlap (GPT-3 appendix C
    / The Pile shape): flag training docs sharing any n-gram with a
    held-out benchmark set. The benchmark here is carved deterministically
    from the corpus itself (docs with ``doc_id % bench_mod == 0``) so the
    operator is hermetic and its oracle exact; swap ``_bench_grams`` for a
    real eval-set reader in production.

    Scale shape: the benchmark side is SMALL by construction (eval suites
    are a few MB against a 100-TB corpus), so its distinct n-grams are
    collected once and broadcast with ``ray.put`` — scoring is then a
    zero-shuffle ``map_batches`` doing one sorted ``np.isin`` membership
    test per batch. No corpus-side shuffle at all; if the benchmark side
    ever grew corpus-sized, use the :func:`dup_ngram_corpus` gram-hash
    partition topology instead. All outputs are exact integers.
    """
    import pandas as pd
    import ray

    def _grams_of(batch: pa.Table, only_bench: bool):
        flat, doc_idx, lens = _split_words_flat(batch, text_col)
        ids = np.asarray(batch[id_col]).astype(np.int64)
        m = len(flat)
        if m < n:
            return np.array([], dtype=object), np.array([], dtype=np.int64)
        starts = np.flatnonzero(doc_idx[: m - n + 1] == doc_idx[n - 1:])
        if only_bench:
            starts = starts[ids[doc_idx[starts]] % bench_mod == 0]
            if not len(starts):
                return (np.array([], dtype=object),
                        np.array([], dtype=np.int64))
        gram = flat[starts].astype(object)
        for k in range(1, n):
            gram = gram + " "
            gram = gram + flat[starts + k]
        return gram, ids[doc_idx[starts]]

    def bench_partial(batch: pa.Table) -> pa.Table:
        gram, _ = _grams_of(batch, only_bench=True)
        return pa.table({"gram": pa.array(
            pd.unique(gram), pa.string())})

    # small side: distinct benchmark grams, collected once and broadcast
    bench = ds.map_batches(bench_partial, batch_format="pyarrow").to_pandas()
    bench_sorted = np.sort(bench["gram"].to_numpy(dtype=object))
    handle = ray.put(bench_sorted)

    def score(batch: pa.Table) -> pa.Table:
        bg = ray.get(handle)
        gram, gids = _grams_of(batch, only_bench=False)
        pairs = pd.DataFrame({"gram": gram, "doc": gids}).drop_duplicates()
        hit = np.isin(pairs["gram"].to_numpy(dtype=object), bg)
        agg = pairs.assign(hit=hit.astype(np.int64)).groupby(
            "doc", as_index=False).agg(
            n_grams=("gram", "count"), n_hit=("hit", "sum"))
        return pa.table({
            id_col: pa.array(agg["doc"].to_numpy(dtype=np.int64)),
            "n_grams": pa.array(agg["n_grams"].to_numpy(dtype=np.int64)),
            "n_hit": pa.array(agg["n_hit"].to_numpy(dtype=np.int64)),
            "contaminated": pa.array(
                (agg["n_hit"].to_numpy() > 0).astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_topk(ds, k: int = 20, text_col: str = "text"):
    """Global top-k word bigrams by exact count (collocation mining /
    boilerplate-phrase detection over a web corpus).

    Same partial-combine topology as :func:`token_histogram`: each batch
    builds its adjacent-pair bigrams vectorized (object-array concat of
    the flat token array shifted by one, doc-boundary-masked) and
    pre-aggregates counts IN-BATCH, so the groupby exchange is
    bigram-vocabulary-bounded, not corpus-bounded. All-integer counts;
    ties at the boundary break by bigram ascending (binary order — the
    corpus is ASCII, so numpy/pandas and SQL collation agree).
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, lens = _split_words_flat(batch, text_col)
        if len(flat) < 2:
            return pa.table({
                "bigram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            })
        same = doc_idx[1:] == doc_idx[:-1]
        bg = flat[:-1][same].astype(object) + " " + flat[1:][same]
        cnt = pd.Series(bg).value_counts()
        return pa.table({
            "bigram": pa.array(cnt.index.to_numpy(dtype=object),
                               pa.string()),
            "cnt": pa.array(cnt.to_numpy(dtype=np.int64)),
        })

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("cnt")
    )

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(
            [c if c != "sum(cnt)" else "cnt" for c in tbl.column_names]
        )

    return (
        totals.map_batches(rename, batch_format="pyarrow")
        .sort(["cnt", "bigram"], descending=[True, False])
        .limit(k)
    )


def chunk_documents(ds, size: int = 128, head: int = 8,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Fixed-size character chunking — the training-sequence prep step
    that splits long documents into ``size``-codepoint windows (the
    pre-tokenization analogue of context-length packing; see also
    :func:`pack_sequences` for the post-tokenization bin-pack).

    Emits one row per chunk: ``(doc_id, chunk_id, chunk_len,
    chunk_head)`` where ``chunk_head`` is the first ``head`` codepoints
    of the chunk (proves the slicing is real without shipping the full
    text twice). Zero-shuffle ``map_batches``; vectorized by chunk INDEX
    — the Python loop runs ``ceil(max_len/size)`` times per batch (a
    handful), each iteration one Arrow ``utf8_slice_codeunits`` over the
    whole column. Codepoint slicing matches SQL ``substr`` exactly on
    this ASCII corpus (and on any UTF-8 input both sides count
    codepoints).
    """
    def chunks(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lens = pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = np.asarray(batch[id_col]).astype(np.int64)
        out_id, out_cid, out_len, out_head = [], [], [], []
        max_chunks = int(np.ceil(lens.max() / size)) if len(lens) else 0
        for ci in range(max_chunks):
            sel = np.flatnonzero(lens > ci * size)
            if not len(sel):
                break
            # narrow to still-active docs BEFORE slicing: one finished
            # long doc must not force re-slicing the whole column every
            # iteration (O(n_docs × max_chunks) codepoint scans)
            if len(sel) < len(lens):
                text = text.take(pa.array(sel))
                lens, ids = lens[sel], ids[sel]
            heads = pc.utf8_slice_codeunits(
                text, start=ci * size, stop=ci * size + head)
            out_id.append(ids)
            out_cid.append(np.full(len(sel), ci, dtype=np.int64))
            out_len.append(np.minimum(size, lens - ci * size))
            out_head.append(heads)
        if not out_id:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "chunk_len": pa.array([], pa.int64()),
                "chunk_head": pa.array([], pa.string()),
            })
        return pa.table({
            id_col: pa.array(np.concatenate(out_id)),
            "chunk_id": pa.array(np.concatenate(out_cid)),
            "chunk_len": pa.array(np.concatenate(out_len)),
            "chunk_head": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_head]),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def source_stats(ds, keys: tuple = ("source", "lang"),
                 text_col: str = "text"):
    """Per-(source, lang) corpus inventory: doc count, total words,
    total chars, longest doc — the crawl-manifest rollup every corpus
    build starts with.

    In-batch combiner → ONE key-cardinality-bounded exchange
    (``partitioned_group_map``) → vectorized fold; word counts use the
    same tokenize as every text oracle (``trim`` + split ``\\s+``).
    All-integer output.
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        _, _, lens = _split_words_flat(batch, text_col)
        chars = pc.utf8_length(batch[text_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({k: np.asarray(batch[k]) for k in keys})
        df["n_docs"] = np.int64(1)
        df["sum_words"] = lens
        df["sum_chars"] = chars
        df["max_chars"] = chars
        agg = df.groupby(keys, as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_words=("sum_words", "sum"),
            sum_chars=("sum_chars", "sum"), max_chars=("max_chars", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(keys, as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_words=("sum_words", "sum"),
            sum_chars=("sum_chars", "sum"), max_chars=("max_chars", "max"))

    return partitioned_group_map(partials, keys, fold)


def vocab_stats(ds, group_col: str = "lang", text_col: str = "text"):
    """Per-group vocabulary size: total tokens and DISTINCT tokens per
    ``group_col`` (type/token inventory — the corpus-level lexical
    diversity statistic).

    One tokenize explode, then the shared exact-distinct topology of
    :func:`matrixprofile_ray.stages.relational.grouped_distinct_count`
    (in-batch combine → ONE token-hash exchange → local first-occurrence
    distinct). The explode fuses with the distinct-count partial in the
    same Ray map chain, so raw token rows never cross an exchange.
    All-integer output sorted by group.
    """
    from matrixprofile_ray.stages.relational import grouped_distinct_count

    def explode(batch: pa.Table) -> pa.Table:
        flat, doc_idx, lens = _split_words_flat(batch, text_col)
        groups = np.asarray(batch[group_col])[doc_idx]
        return pa.table({
            group_col: pa.array(groups, pa.string()),
            "tok": pa.array(flat, pa.string()),
        })

    toks = ds.map_batches(explode, batch_format="pyarrow")
    out = grouped_distinct_count(toks, group_col, "tok")
    return out.rename(columns={"n_rows": "n_tokens"})


def rare_term_score(ds, id_col: str = "doc_id", text_col: str = "text",
                    max_vocab: int = 2_000_000):
    """Document-frequency-weighted doc scoring (the integer-exact core
    of tf-idf / rare-word quality filters): per doc, the sum and min of
    the corpus document frequency of its tokens (with multiplicity).
    A low ``min_df`` flags docs containing corpus-rare terms; ``sum_df``
    is the unnormalized commonness mass.

    Two-pass broadcast topology: pass 1 computes the df table with the
    :func:`term_df_top` partial-combine (vocabulary-bounded exchange) and
    collects it ONCE to the driver (guarded by ``max_vocab`` so a
    pathological corpus fails loudly — at web scale cap the vocab with
    :func:`heavy_hitters`-style candidate pruning first); pass 2
    broadcasts the sorted vocab via ``ray.put`` and scores each batch
    zero-shuffle with one ``searchsorted`` + ``bincount``. All-integer
    output (df ≤ n_docs and words/doc are bounded, so the float64
    bincount accumulator stays exact below 2^53).
    """
    import pandas as pd
    import ray

    def partial_df(batch: pa.Table) -> pa.Table:
        flat, doc_idx, lens = _split_words_flat(batch, text_col)
        ids = np.asarray(batch[id_col]).astype(np.int64)
        pairs = pd.DataFrame({
            "doc": ids[doc_idx], "tok": flat}).drop_duplicates()
        cnt = pairs.groupby("tok", as_index=False).size()
        return pa.table({
            "tok": pa.array(cnt["tok"], pa.string()),
            "df": pa.array(cnt["size"].to_numpy(dtype=np.int64)),
        })

    totals = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("tok")
        .sum("df")
        .to_pandas()
    )
    if len(totals) > max_vocab:
        raise ValueError(
            f"vocabulary {len(totals)} exceeds max_vocab={max_vocab}; "
            "pre-prune with heavy_hitters or raise the guard")
    order = np.argsort(totals["tok"].to_numpy(dtype=object))
    toks_sorted = totals["tok"].to_numpy(dtype=object)[order]
    dfs_sorted = totals["sum(df)"].to_numpy(dtype=np.int64)[order]
    handle = ray.put((toks_sorted, dfs_sorted))

    def score(batch: pa.Table) -> pa.Table:
        toks, dfs = ray.get(handle)
        flat, doc_idx, lens = _split_words_flat(batch, text_col)
        ids = np.asarray(batch[id_col]).astype(np.int64)
        n = batch.num_rows
        pos = np.searchsorted(toks, flat)
        # vocabulary-mismatch guard: the df pass and this scoring pass must
        # see the same corpus; a token absent from `toks` would otherwise
        # read a neighbor's df (or IndexError at pos == len(toks))
        if len(flat):
            if len(toks) == 0:
                raise ValueError(
                    "rare_term_score: empty df-pass vocabulary but "
                    "non-empty scoring batch")
            pos = np.minimum(pos, len(toks) - 1)
            if not np.array_equal(toks[pos], flat):
                raise ValueError(
                    "rare_term_score: token absent from the df-pass "
                    "vocabulary — the scoring dataset must be the "
                    "df-pass dataset")
        dfv = dfs[pos]
        sum_df = np.bincount(
            doc_idx, weights=dfv.astype(np.float64), minlength=n
        ).astype(np.int64)
        min_df = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(min_df, doc_idx, dfv)
        return pa.table({
            id_col: pa.array(ids),
            "n_words": pa.array(lens),
            "sum_df": pa.array(sum_df),
            "min_df": pa.array(min_df),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def ngram_novelty(ds, n: int = 5, id_col: str = "doc_id",
                  text_col: str = "text"):
    """First-occurrence n-gram novelty per document (Lee et al. 2022
    §4 'train-test overlap over time' shape): a doc's distinct n-gram is
    *novel* when no doc with a smaller ``doc_id`` contains it — i.e. the
    doc is the corpus-min owner of the gram. Declining novelty across a
    crawl ordering is the classic duplication-growth diagnostic.

    Same slim topology as :func:`dup_ngram_corpus`: distinct (gram, doc)
    pairs hash-partition by gram (each gram's full group is local, so
    min-attribution is a partition-local ``transform('min')``), per-doc
    partials then fold in a doc-bounded second exchange. All-integer.
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    def distinct_grams(batch: pa.Table) -> pa.Table:
        return _distinct_gram_pairs(batch, n, id_col, text_col)

    pairs = ds.map_batches(distinct_grams, batch_format="pyarrow")

    def per_gram_fold(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates(["gram", id_col])
        md = part.groupby("gram", sort=False)[id_col].transform("min")
        part = part.assign(novel=(part[id_col] == md).astype(np.int64))
        return part.groupby(id_col, as_index=False).agg(
            n_grams=("gram", "count"), n_novel=("novel", "sum"))

    partials = partitioned_group_map(pairs, ["gram"], per_gram_fold)

    def per_doc_fold(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(id_col, as_index=False).agg(
            n_grams=("n_grams", "sum"), n_novel=("n_novel", "sum"))

    return partitioned_group_map(partials, [id_col], per_doc_fold)


def prefix_dup_groups(ds, prefix_len: int = 64, min_group: int = 2,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Shared-prefix duplicate groups — the boilerplate/template detector
    (docs emitted from one page template share their first N chars even
    when tails differ; catching them is cheaper than MinHash).

    Zero-copy Arrow prefix slice per batch, then ONE prefix-hash
    partition; per-partition vectorized group stats. Returns one row per
    prefix with >= ``min_group`` docs: prefix, n_docs, min_doc_id.
    """
    import pandas as pd

    from matrixprofile_ray.util import partitioned_group_map

    def prefixes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "prefix": pc.utf8_slice_codeunits(
                batch[text_col], start=0, stop=prefix_len),
            id_col: batch[id_col],
        })

    pairs = ds.map_batches(prefixes, batch_format="pyarrow")

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby("prefix", as_index=False).agg(
            n_docs=(id_col, "size"), min_doc_id=(id_col, "min"))
        return agg[agg["n_docs"] >= min_group]

    return partitioned_group_map(pairs, ["prefix"], fold)


def inverted_postings(ds, k: int = 20, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Inverted-index posting rows for the top-k terms by document
    frequency: (token, doc_id, doc_freq), one row per posting.

    Engine-added corpus operator (search-index build). Two passes, both
    vocabulary-bounded:

    1. Global df via the partial-combine topology (doc-unique tokens
       in-batch, then one vocabulary-bounded groupby) -> top-k terms
       (ties break token ascending), broadcast once via ``ray.put``.
    2. Zero-shuffle posting scan: each batch re-tokenizes its docs and
       emits (token, doc_id) rows only for the broadcast term set.

    At 100-TB scale the posting rows ARE the scalable index layout
    (hash-partition by token to build posting shards); k bounds the
    driver-visible result, not the topology.
    """
    import pandas as pd
    import ray

    def partial_df(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])), r"\s+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        pairs = pd.DataFrame({
            "doc": doc_idx,
            "token": np.asarray(pc.list_flatten(toks)),
        })
        pairs = pairs[pairs["token"] != ""].drop_duplicates(["doc", "token"])
        cnt = pairs.groupby("token", as_index=False).size()
        return pa.table({
            "token": pa.array(cnt["token"], pa.string()),
            "doc_freq": pa.array(cnt["size"].to_numpy(dtype=np.int64)),
        })

    totals = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .sum("doc_freq")
    )
    top = (
        totals.map_batches(
            lambda t: t.rename_columns(
                [c if c != "sum(doc_freq)" else "doc_freq"
                 for c in t.column_names]),
            batch_format="pyarrow")
        .sort(["doc_freq", "token"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    df_of = {r["token"]: int(r["doc_freq"]) for r in top}
    ref = ray.put(df_of)

    def postings(batch: pa.Table) -> pa.Table:
        terms = ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])), r"\s+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        pairs = pd.DataFrame({
            "doc_pos": doc_idx,
            "token": np.asarray(pc.list_flatten(toks)),
        }).drop_duplicates()
        pairs = pairs[pairs["token"].isin(terms)]
        ids = np.asarray(batch[id_col])[pairs["doc_pos"].to_numpy()]
        return pa.table({
            "token": pa.array(pairs["token"].to_numpy(), pa.string()),
            id_col: pa.array(ids, pa.int64()),
            "doc_freq": pa.array(
                pairs["token"].map(terms).to_numpy(dtype=np.int64)),
        })

    return ds.map_batches(postings, batch_format="pyarrow")


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_vocab: int = 1_000_000):
    """Highest-tf-idf term per document: (doc_id, token, tfidf).

    score = tf(doc, token) * ln(N / df(token)); ranking per doc breaks
    ties by ROUND(score, 6) DESC then token ASC so the winner is stable
    under last-ulp float drift. Topology: one vocabulary-bounded df
    groupby, the (token -> df) map broadcast ONCE via ``ray.put``
    (raising loudly if the vocabulary exceeds ``max_vocab`` — at true
    corpus scale cap the vocabulary by df before broadcasting), then a
    zero-shuffle scoring pass; each doc's top term resolves entirely
    in-batch because a document never spans rows.
    """
    import pandas as pd
    import ray

    n_docs = ds.count()

    def partial_df(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])), r"\s+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        pairs = pd.DataFrame({
            "doc": doc_idx,
            "token": np.asarray(pc.list_flatten(toks)),
        })
        pairs = pairs[pairs["token"] != ""].drop_duplicates(["doc", "token"])
        cnt = pairs.groupby("token", as_index=False).size()
        return pa.table({
            "token": pa.array(cnt["token"], pa.string()),
            "doc_freq": pa.array(cnt["size"].to_numpy(dtype=np.int64)),
        })

    totals = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .sum("doc_freq")
        .take_all()
    )
    if len(totals) > max_vocab:
        raise ValueError(
            f"vocabulary {len(totals)} exceeds max_vocab={max_vocab}; "
            "cap by df before broadcasting at corpus scale")
    df_of = {r["token"]: int(r["sum(doc_freq)"]) for r in totals}
    ref = ray.put(df_of)

    def score(batch: pa.Table) -> pa.Table:
        dfs = ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])), r"\s+"
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        pairs = pd.DataFrame({
            "doc_pos": doc_idx,
            "token": np.asarray(pc.list_flatten(toks)),
        })
        pairs = pairs[pairs["token"] != ""]
        tf = pairs.groupby(["doc_pos", "token"], as_index=False).size()
        dfv = tf["token"].map(dfs).to_numpy(dtype="d")
        raw = tf["size"].to_numpy(dtype="d") * np.log(n_docs / dfv)
        # half-away rounding (SQL ROUND semantics) BEFORE ranking
        f = np.floor(np.abs(raw) * 1e6)
        bump = (np.abs(raw) * 1e6 - f) >= 0.5
        tf["tfidf"] = np.sign(raw) * (f + bump) / 1e6
        tf = tf.sort_values(
            ["doc_pos", "tfidf", "token"],
            ascending=[True, False, True]).drop_duplicates(
            "doc_pos", keep="first")
        ids = np.asarray(batch[id_col])[tf["doc_pos"].to_numpy()]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "token": pa.array(tf["token"].to_numpy(), pa.string()),
            "tfidf": pa.array(tf["tfidf"].to_numpy(dtype="d"), pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
