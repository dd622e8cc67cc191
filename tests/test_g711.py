"""G.711 μ-law / A-law codec tests (WAV format tags 7 / 6)."""
import numpy as np
import pytest

from matrixprofile_ray.stages.multimodal import (
    _ALAW_DECODE,
    _ULAW_DECODE,
    decode_g711,
    decode_wav,
    encode_g711,
    encode_wav_g711,
)


class TestG711:
    def test_alaw_involution_all_codes(self):
        codes = np.arange(256, dtype=np.uint8)
        re = np.frombuffer(encode_g711(_ALAW_DECODE[codes], "alaw"),
                           dtype=np.uint8)
        assert np.array_equal(re, codes)

    def test_ulaw_involution_all_codes(self):
        # μ-law has two codes for zero (0x7F = -0, 0xFF = +0); encoding
        # the decoded zero canonicalizes to 0xFF — every other code is
        # an exact fixed point
        codes = np.arange(256, dtype=np.uint8)
        re = np.frombuffer(encode_g711(_ULAW_DECODE[codes], "ulaw"),
                           dtype=np.uint8)
        mism = codes[re != codes]
        assert list(mism) == [0x7F]
        assert re[0x7F] == 0xFF and _ULAW_DECODE[0x7F] == 0

    def test_roundtrip_error_bound(self):
        x = (20000 * np.sin(np.arange(2000) / 7.7)).astype(np.int16)
        for law in ("ulaw", "alaw"):
            y = decode_g711(encode_g711(x, law), law)
            err = np.abs(y.astype(int) - x.astype(int))
            rel = err / np.maximum(np.abs(x.astype(int)), 64)
            assert rel.max() < 0.13, law  # companding SNR bound

    def test_clip_extremes(self):
        x = np.array([-32768, 32767, 0, -1, 1], dtype=np.int16)
        for law in ("ulaw", "alaw"):
            y = decode_g711(encode_g711(x, law), law)
            assert y[0] < -30000 and y[1] > 30000
            assert abs(int(y[2])) <= 8

    def test_wav_container_both_tags(self):
        x = (9000 * np.sin(np.arange(500) / 3.1)).astype(np.int16)
        for law, tag in (("ulaw", 7), ("alaw", 6)):
            w = encode_wav_g711(x, 8000, law)
            assert w[20] == tag  # fmt tag byte
            s, r = decode_wav(w)
            assert r == 8000
            assert np.array_equal(
                s, decode_g711(encode_g711(x, law), law))

    def test_unknown_law_raises(self):
        with pytest.raises(ValueError, match="unknown law"):
            encode_g711(np.zeros(4, dtype=np.int16), "blaw")

    def test_stereo_g711_rejected(self):
        import struct

        x = (1000 * np.sin(np.arange(100))).astype(np.int16)
        w = bytearray(encode_wav_g711(x, 8000, "ulaw"))
        # patch channel count to 2
        struct.pack_into("<H", w, 22, 2)
        with pytest.raises(ValueError, match="mono"):
            decode_wav(bytes(w))
