"""PNG and GIF codec tests: exact roundtrips across every decoder
path, corrupted-payload failure modes, DecodeStage dispatch and the
animated-GIF frame-sampling path."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from matrixprofile_ray.stages.gif import (
    decode_gif,
    encode_gif,
    parse_gif,
)
from matrixprofile_ray.stages.png import decode_png, encode_png


class TestPNGRoundtrip:
    def test_rgb_all_filters(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
        for ft in [0, 1, 2, 3, 4]:
            assert np.array_equal(
                decode_png(encode_png(img, filter_type=ft)), img)
        # one file exercising every filter type
        p = encode_png(img, filter_type=lambda y: y % 5)
        assert np.array_equal(decode_png(p), img)

    def test_gray(self):
        rng = np.random.default_rng(8)
        g = rng.integers(0, 256, (15, 31), dtype=np.uint8)
        p = encode_png(g, filter_type=lambda y: (y * 2) % 5)
        out = decode_png(p)
        assert out.ndim == 2
        assert np.array_equal(out, g)

    def test_rgba_alpha_drop_and_keep(self):
        rng = np.random.default_rng(9)
        a = rng.integers(0, 256, (9, 14, 4), dtype=np.uint8)
        p = encode_png(a, filter_type=4)
        assert np.array_equal(decode_png(p, keep_alpha=True), a)
        assert np.array_equal(decode_png(p), a[:, :, :3])

    def test_gray_alpha(self):
        rng = np.random.default_rng(10)
        ga = rng.integers(0, 256, (6, 5, 2), dtype=np.uint8)
        p = encode_png(ga, color_type=4)
        assert np.array_equal(decode_png(p, keep_alpha=True), ga)
        assert np.array_equal(decode_png(p), ga[:, :, 0])

    def test_palette_all_depths(self):
        rng = np.random.default_rng(11)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (21, 17), dtype=np.uint8)
        for d in (8, 4, 2, 1):
            ii = idx % (1 << d) if d < 8 else idx
            p = encode_png(ii, color_type=3, bit_depth=d, palette=pal,
                           filter_type=1)
            assert np.array_equal(decode_png(p, raw_indices=True), ii)
            assert np.array_equal(decode_png(p), pal[ii])

    def test_gray_subbyte_scaling(self):
        rng = np.random.default_rng(12)
        for d in (1, 2, 4):
            g = rng.integers(0, 1 << d, (13, 29), dtype=np.uint8)
            p = encode_png(g, color_type=0, bit_depth=d)
            want = (g.astype(np.uint16) * 255 // ((1 << d) - 1)
                    ).astype(np.uint8)
            assert np.array_equal(decode_png(p), want)

    def test_16bit_high_byte(self):
        rng = np.random.default_rng(13)
        h16 = rng.integers(0, 65536, (11, 7, 3), dtype=np.uint16)
        p = encode_png(h16, color_type=2, bit_depth=16, filter_type=3)
        assert np.array_equal(decode_png(p), (h16 >> 8).astype(np.uint8))

    def test_adam7_interlace(self):
        rng = np.random.default_rng(14)
        img = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
        g = rng.integers(0, 256, (15, 31), dtype=np.uint8)
        for im in (img, g):
            p = encode_png(im, interlace=True,
                           filter_type=lambda y: y % 5)
            assert np.array_equal(decode_png(p), im)

    def test_adam7_tiny_images_skip_empty_passes(self):
        # 1x1..4x4: most Adam7 passes are empty
        rng = np.random.default_rng(15)
        for h in (1, 2, 3, 4, 7):
            for w in (1, 2, 5):
                im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                p = encode_png(im, interlace=True, filter_type=2)
                assert np.array_equal(decode_png(p), im)

    def test_crc_corruption_raises(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        p = bytearray(encode_png(img))
        p[40] ^= 0xFF  # somewhere in IDAT
        with pytest.raises(ValueError, match="CRC|chunk|truncated"):
            decode_png(bytes(p))

    def test_not_png_raises(self):
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"GIF89a" + b"\x00" * 20)

    def test_truncated_raises(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        p = encode_png(img)
        with pytest.raises(ValueError):
            decode_png(p[:30])

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        seed=st.integers(0, 2**31), ft=st.integers(0, 4),
        inter=st.booleans(),
    )
    def test_property_rgb_roundtrip(self, h, w, seed, ft, inter):
        rng = np.random.default_rng(seed)
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = encode_png(im, filter_type=ft, interlace=inter)
        assert np.array_equal(decode_png(p), im)


class TestGIFRoundtrip:
    PAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [255, 255, 0]], np.uint8)

    def test_single_frame(self):
        rng = np.random.default_rng(11)
        img = self.PAL[rng.integers(0, 5, (33, 47), dtype=np.uint8)]
        assert np.array_equal(decode_gif(encode_gif([img])), img)

    def test_interlaced(self):
        rng = np.random.default_rng(12)
        img = self.PAL[rng.integers(0, 5, (29, 31), dtype=np.uint8)]
        assert np.array_equal(
            decode_gif(encode_gif([img], interlace=True)), img)

    def test_wide_codes_200_colors(self):
        rng = np.random.default_rng(13)
        pal = np.unique(rng.integers(0, 256, (200, 3)), axis=0
                        ).astype(np.uint8)
        img = pal[rng.integers(0, len(pal), (64, 64), dtype=np.uint8)]
        assert np.array_equal(decode_gif(encode_gif([img])), img)

    def test_lzw_table_full_clear(self):
        # 128x128 uniform-random 256-color image forces the 4096-entry
        # clear-and-restart path
        rng = np.random.default_rng(14)
        idx = rng.integers(0, 256, (128, 128), dtype=np.uint8)
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        g = encode_gif([idx], palette=pal)
        assert np.array_equal(decode_gif(g), pal[idx])

    def test_animation_frames_and_delays(self):
        rng = np.random.default_rng(15)
        frames = [self.PAL[rng.integers(0, 5, (20, 30), dtype=np.uint8)]
                  for _ in range(4)]
        w, h, out = parse_gif(encode_gif(frames, delays_cs=[5, 10, 15, 20]))
        assert (w, h) == (30, 20)
        assert [o["delay_cs"] for o in out] == [5, 10, 15, 20]
        for f, o in zip(frames, out):
            assert np.array_equal(o["pixels"], f)

    def test_transparency_composites_over_previous(self):
        f1 = np.full((10, 10), 1, np.uint8)
        f2 = np.zeros((10, 10), np.uint8)
        f2[5:, :] = 2
        g = encode_gif([f1, f2], palette=self.PAL, transparent=0,
                       disposal=1)
        _, _, out = parse_gif(g)
        exp2 = self.PAL[f1].copy()
        exp2[5:, :] = self.PAL[2]
        assert np.array_equal(out[0]["pixels"], self.PAL[f1])
        assert np.array_equal(out[1]["pixels"], exp2)

    def test_disposal_restore_background(self):
        # disposal 2: after each frame the region resets to background
        # (index 0 here), so frame 2's transparent pixels show bg, not
        # frame 1
        f1 = np.full((6, 6), 1, np.uint8)
        f2 = np.zeros((6, 6), np.uint8)
        f2[0, 0] = 2
        g = encode_gif([f1, f2], palette=self.PAL, transparent=0,
                       disposal=2)
        _, _, out = parse_gif(g)
        exp2 = np.zeros((6, 6, 3), np.uint8)  # bg = palette[0] = black
        exp2[0, 0] = self.PAL[2]
        assert np.array_equal(out[1]["pixels"], exp2)

    def test_two_color_min_code_size(self):
        rng = np.random.default_rng(16)
        palbw = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        bw = palbw[rng.integers(0, 2, (17, 13), dtype=np.uint8)]
        assert np.array_equal(decode_gif(encode_gif([bw])), bw)

    def test_not_gif_raises(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="256"):
            encode_gif([img])

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        ncol=st.integers(2, 17), seed=st.integers(0, 2**31),
        inter=st.booleans(),
    )
    def test_property_palette_roundtrip(self, h, w, ncol, seed, inter):
        rng = np.random.default_rng(seed)
        pal = np.unique(rng.integers(0, 256, (ncol, 3)), axis=0
                        ).astype(np.uint8)
        img = pal[rng.integers(0, len(pal), (h, w), dtype=np.uint8)]
        g = encode_gif([img], interlace=inter)
        assert np.array_equal(decode_gif(g), img)


class TestDecodeStageDispatch:
    def _run(self, payload, kind, ray_session):
        import ray.data as rd

        from matrixprofile_ray.stages.multimodal import DecodeStage

        media = pd.DataFrame({
            "media_id": [1], "kind": [kind],
            "payload": [payload], "mime": ["x"],
        })
        return (
            rd.from_pandas(media)
            .map_batches(
                DecodeStage,
                fn_constructor_kwargs={"dim": 8, "fake": False},
                batch_format="pandas", batch_size=4, concurrency=1,
            )
            .to_pandas()
        )

    def test_png_through_decode_stage(self, ray_session):
        from matrixprofile_ray.stages.multimodal import image_features

        rng = np.random.default_rng(21)
        px = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
        payload = encode_png(px, filter_type=lambda y: y % 5)
        out = self._run(payload, "image", ray_session)
        want = np.round(image_features(px.astype(np.float64), 8), 6)
        np.testing.assert_array_equal(
            np.asarray(out["feature"].iloc[0]), want)

    def test_gray_png_through_decode_stage(self, ray_session):
        from matrixprofile_ray.stages.multimodal import image_features

        rng = np.random.default_rng(22)
        g = rng.integers(0, 256, (10, 12), dtype=np.uint8)
        out = self._run(encode_png(g), "image", ray_session)
        px3 = np.repeat(g[:, :, None], 3, axis=2).astype(np.float64)
        want = np.round(image_features(px3, 8), 6)
        np.testing.assert_array_equal(
            np.asarray(out["feature"].iloc[0]), want)

    def test_gif_poster_through_decode_stage(self, ray_session):
        from matrixprofile_ray.stages.multimodal import image_features

        rng = np.random.default_rng(23)
        pal = np.unique(rng.integers(0, 256, (30, 3)), axis=0
                        ).astype(np.uint8)
        frames = [pal[rng.integers(0, len(pal), (12, 9), dtype=np.uint8)]
                  for _ in range(3)]
        payload = encode_gif(frames)
        out = self._run(payload, "video", ray_session)
        want = np.round(image_features(
            frames[0].astype(np.float64), 8), 6)
        np.testing.assert_array_equal(
            np.asarray(out["feature"].iloc[0]), want)


class TestGIFFrameSampling:
    def test_sample_every_other_gif_frame(self):
        from matrixprofile_ray.stages.multimodal import (
            image_features,
            sample_video_frames,
        )

        rng = np.random.default_rng(31)
        pal = np.unique(rng.integers(0, 256, (30, 3)), axis=0
                        ).astype(np.uint8)
        frames = [pal[rng.integers(0, len(pal), (16, 12), dtype=np.uint8)]
                  for _ in range(5)]
        payload = encode_gif(frames, delays_cs=[10] * 5)
        batch = pd.DataFrame({
            "media_id": [42], "kind": ["video"], "payload": [payload],
        })
        out = sample_video_frames(batch, every=2, dim=8)
        assert list(out["frame_idx"]) == [0, 2, 4]
        assert list(out["frame_ts_ms"]) == [0, 200, 400]
        for row_i, fi in enumerate([0, 2, 4]):
            want = np.round(image_features(
                frames[fi].astype(np.float64), 8), 6)
            np.testing.assert_array_equal(
                np.asarray(out["feature"].iloc[row_i]), want)

    def test_mixed_gif_and_avi_batch(self):
        from matrixprofile_ray.stages.multimodal import (
            encode_avi_mjpeg,
            sample_video_frames,
        )

        rng = np.random.default_rng(32)
        pal = np.unique(rng.integers(0, 256, (20, 3)), axis=0
                        ).astype(np.uint8)
        gif_frames = [pal[rng.integers(0, len(pal), (12, 9), dtype=np.uint8)]
                      for _ in range(3)]
        avi_frames = [rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
                      for _ in range(3)]
        batch = pd.DataFrame({
            "media_id": [1, 2, 3],
            "kind": ["video", "audio", "video"],
            "payload": [encode_gif(gif_frames),
                        b"not-a-video",
                        encode_avi_mjpeg(avi_frames, fps=4)],
        })
        out = sample_video_frames(batch, every=2, dim=4)
        # 2 sampled frames per 3-frame clip; audio row contributes none
        assert list(out["media_id"]) == [1, 1, 3, 3]
        assert list(out["frame_idx"]) == [0, 2, 0, 2]
