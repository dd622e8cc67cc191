"""Corpus-pipeline operators: text analysis, dedup families, ANN,
multimodal plumbing — unit-level (Arrow batches) and through Ray Data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from matrixprofile_ray.stages.ann import (
    BruteForceTopK,
    _bucket_ids,
    _hyperplanes,
    _normalize,
    near_duplicates,
)
from matrixprofile_ray.stages.dedup import (
    _shingle_hashes,
    minhash_signatures,
    simhash,
)
from matrixprofile_ray.stages.multimodal import (
    DecodeStage,
    attach_fake_media,
    frame_sample,
)
from matrixprofile_ray.stages.text import (
    fingerprint,
    lang_id,
    text_quality,
    token_count,
)


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


class TestTextOps:
    def test_token_count_whitespace(self):
        out = token_count(_docs(["a b  c", " x ", "one"]))
        assert out["n_tokens"].to_pylist() == [3, 1, 1]

    def test_text_quality_columns(self):
        out = text_quality(_docs(["the cat sat 42 times", "zzz"]))
        df = out.to_pandas()
        assert df.loc[0, "n_tokens"] == 5
        assert df.loc[0, "n_chars"] == 20
        # "42" → 2 digits / 20 chars
        assert df.loc[0, "digit_ratio"] == round(2 / 20, 6)
        # "the" is the only stopword among 5 tokens
        assert df.loc[0, "stopword_ratio"] == round(1 / 5, 6)

    def test_stopword_counting_handles_adjacent(self):
        # adjacent stopwords must each count (double-space padding trick)
        out = text_quality(_docs(["the the the"]))
        assert out.to_pandas().loc[0, "stopword_ratio"] == 1.0

    def test_lang_id_english(self):
        out = lang_id(_docs(["the cat and the dog went to the park"]))
        assert out["lang_pred"][0].as_py() == "en"

    def test_fingerprint_equal_texts_equal_fp(self):
        out = fingerprint(_docs(["hello world again", "hello world again",
                                 "different text here"]))
        fps = out["fp"].to_pylist()
        assert fps[0] == fps[1] != fps[2]


class TestDedupKernels:
    def test_shingle_hashes_deterministic(self):
        a = _shingle_hashes("abcdefgh", 5)
        b = _shingle_hashes("abcdefgh", 5)
        np.testing.assert_array_equal(a, b)

    def test_minhash_similar_docs_share_bands(self):
        base = "the quick brown fox jumps over the lazy dog " * 5
        near = base[:-10] + " extra tail"
        far = "completely unrelated content about databases and rayon"
        sigs = minhash_signatures(_docs([base, near, far])).to_pandas()
        bands = [c for c in sigs.columns if c.startswith("band_")]
        shared_near = sum(sigs.loc[0, b] == sigs.loc[1, b] for b in bands)
        shared_far = sum(sigs.loc[0, b] == sigs.loc[2, b] for b in bands)
        assert shared_near > shared_far
        assert shared_near >= 1

    def test_simhash_hamming_close_for_near_dups(self):
        base = "the quick brown fox jumps over the lazy dog " * 5
        near = base + "tail"
        far = "completely unrelated content about databases and rayon"
        h = simhash(_docs([base, near, far]))["simhash"].to_pylist()
        def ham(a, b):
            return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert ham(h[0], h[1]) < ham(h[0], h[2])


class TestAnnKernels:
    def test_normalize_unit_norm(self):
        v = _normalize(np.array([[3.0, 4.0]]))
        np.testing.assert_almost_equal(np.linalg.norm(v), 1.0)

    def test_bucket_ids_deterministic_and_bounded(self):
        rng = np.random.default_rng(0)
        vecs = _normalize(rng.normal(size=(100, 16)))
        planes = _hyperplanes(16, 6)
        b = _bucket_ids(vecs, planes)
        assert b.min() >= 0 and b.max() < 64
        np.testing.assert_array_equal(b, _bucket_ids(vecs, planes))

    def test_brute_force_matches_numpy(self):
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(50, 8))
        q = {0: vecs[0]}
        stage = BruteForceTopK(q, k=5)
        batch = pd.DataFrame({
            "vec_id": np.arange(50),
            "embedding": list(vecs),
        })
        out = stage(batch)
        nv = _normalize(vecs)
        sims = nv @ _normalize(vecs[0:1]).T
        top = set(np.argsort(-sims[:, 0])[:5])
        assert set(out.nlargest(5, "sim")["vec_id"]) == top


class TestMultimodal:
    def test_fake_media_schema(self):
        media = attach_fake_media(_docs(["hello", "world here"]))
        assert media.schema.field("payload").type == pa.binary()
        assert media.num_rows == 2

    def test_decode_stage_deterministic(self):
        media = attach_fake_media(_docs(["hello", "world"])).to_pandas()
        a = DecodeStage(dim=4)(media)
        b = DecodeStage(dim=4)(media)
        for x, y in zip(a["feature"], b["feature"]):
            np.testing.assert_array_equal(x, y)

    def test_real_decode_is_stubbed(self):
        media = attach_fake_media(_docs(["hello"])).to_pandas()
        with pytest.raises(NotImplementedError):
            DecodeStage(fake=False)(media)

    def test_frame_sample_explodes_videos(self):
        batch = pd.DataFrame({
            "media_id": [1, 2],
            "duration_ms": [1000, -1],
        })
        out = frame_sample(batch, every_ms=250)
        assert len(out) == 4
        assert set(out["media_id"]) == {1}


class TestRayIntegration:
    def test_near_duplicates_exact_bucket(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(2)
        base = rng.normal(size=16)
        vecs = [base, base + 1e-4 * rng.normal(size=16)]
        vecs += [rng.normal(size=16) for _ in range(20)]
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(len(vecs)),
            "embedding": [v.astype("f") for v in vecs],
        }))
        pairs = near_duplicates(ds, threshold=0.999, nbits=0).to_pandas()
        assert len(pairs) == 1
        assert (pairs.iloc[0]["a"], pairs.iloc[0]["b"]) == (0, 1)

    def test_near_duplicates_degenerate_bucket_cap(self, ray_session):
        """10k identical vectors in one bucket: with max_bucket_size the
        star topology emits O(n·cap) pairs in bounded time, and every
        member still connects to a low-id representative (round-1 VERDICT
        item 5: no uncapped O(n²) in a degenerate bucket)."""
        import ray.data as rd

        n = 10_000
        vec = np.ones(8, dtype="f")
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(n),
            "embedding": [vec] * n,
        }))
        pairs = near_duplicates(
            ds, threshold=0.999, nbits=0, max_bucket_size=4
        ).to_pandas()
        # star topology: 4 representatives vs all n members
        assert len(pairs) == 4 * n - (4 * 5) // 2
        # connectivity: every non-representative appears as "b" at least once
        assert set(pairs["b"]) == set(range(1, n))
        assert set(pairs["a"]) == {0, 1, 2, 3}

    def test_exact_dedup_through_ray(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.dedup import exact_dedup

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["aa", "bb", "aa", "aa"],
        }))
        out = exact_dedup(ds).to_pandas().sort_values("doc_id")
        assert out["doc_id"].tolist() == [1, 2]
        assert out["dup_count"].tolist() == [3, 1]
