"""Pure-numpy JPEG codec (encoder + decoder), baseline AND progressive.

Closes the last honest stub in the multimodal plumbing (round-3 verdict
item 9): ``DecodeStage(fake=False)`` can now really decode ``image/jpeg``
payloads with no codec library. Spec scope (ITU-T T.81):

- sequential DCT (SOF0/1) and progressive DCT (SOF2) with spectral
  selection + successive approximation: DC first/refinement scans
  (interleaved or single-component), single-component AC first and
  refinement scans with EOBn run coding and buffered correction bits
  (the decode structure mirrors the public libjpeg algorithms); 8-bit
  precision, Huffman entropy coding
- 3-component YCbCr with 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 sampling on both
  sides (the decoder accepts any per-component sampling factors in
  {1,2}; real-web corpora are overwhelmingly 4:2:0) or 1-component
  grayscale; JFIF color transform; chroma downsample is a box mean over
  the sampling cell, upsample is pixel replication (both deterministic)
- the DECODER is generic over the tables carried in the stream (DQT/DHT
  are parsed, not assumed), handles 0xFF00 byte stuffing, multi-scan
  streams, and crops the MCU padding back to the SOF dimensions;
  single-component scans cover the T.81 ceil block grid, not the padded
  MCU grid
- the ENCODER writes Annex-K quantization tables scaled by a quality
  factor and fixed-length canonical Huffman tables (every DC category at
  5 bits, every AC (run,size) symbol at 9 bits — valid, prefix-free, no
  all-ones code, decodable by any baseline decoder; optimal-table
  construction is orthogonal to the pipeline and deliberately skipped);
  ``encode_jpeg_progressive`` emits a 4-scan-type script exercising
  every progressive decode path

Everything is vectorized across 8x8 blocks (DCT/quant via one einsum per
component); only the entropy coding walks blocks in Python, which is fine
for the actor-pool decode stage this feeds (small batches of payloads).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]

# ---------------------------------------------------------------- tables

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 / K.2 reference quantization tables
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# orthonormal 8-point DCT-II matrix: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# encoder Huffman tables: fixed-length canonical codes (see module doc)
_DC_SYMBOLS = list(range(12))                       # categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_SYMBOLS = sorted(set(_AC_SYMBOLS))              # 162 symbols


def _canonical_fixed(symbols: list[int], length: int):
    """(bits[1..16], values, symbol -> (code, length)) for a single-length
    canonical table. len(symbols) < 2**length keeps the all-ones code out.
    """
    assert len(symbols) < (1 << length)
    bits = [0] * 17
    bits[length] = len(symbols)
    enc = {s: (i, length) for i, s in enumerate(symbols)}
    return bits, list(symbols), enc

_DC_BITS, _DC_VALS, _DC_ENC = _canonical_fixed(_DC_SYMBOLS, 5)
_AC_BITS, _AC_VALS, _AC_ENC = _canonical_fixed(_AC_SYMBOLS, 9)

# progressive-scan AC table: adds the EOBn run-length symbols (n=1..14,
# symbol n<<4) the baseline table has no codewords for (176 symbols)
_ACP_SYMBOLS = sorted(set(_AC_SYMBOLS) | {n << 4 for n in range(1, 15)})
_ACP_BITS, _ACP_VALS, _ACP_ENC = _canonical_fixed(_ACP_SYMBOLS, 9)


# ---------------------------------------------------------------- bit io

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:            # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1           # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# --------------------------------------------------------------- helpers

def _bit_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128.0, px[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) 8-multiple plane → (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
                  .transpose(0, 2, 1, 3)
                  .reshape(h, w))


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of a base table (public libjpeg recipe)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = np.floor((q * s + 50) / 100)
    return np.clip(out, 1, 255)


# --------------------------------------------------------------- encoder

def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev_dc: list[int],
                  ci: int) -> None:
    """Huffman-encode one zigzagged 64-coefficient block."""
    diff = int(zz[0]) - prev_dc[ci]
    prev_dc[ci] = int(zz[0])
    size = _bit_size(diff)
    code, clen = _DC_ENC[size]
    bw.write(code, clen)
    if size:
        bw.write(_amplitude(diff, size), size)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, clen = _AC_ENC[0xF0]       # ZRL
            bw.write(code, clen)
            run -= 16
        size = _bit_size(v)
        code, clen = _AC_ENC[(run << 4) | size]
        bw.write(code, clen)
        bw.write(_amplitude(v, size), size)
        run = 0
    if last < 63:
        code, clen = _AC_ENC[0x00]           # EOB
        bw.write(code, clen)


def _pad_plane(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-pad a plane up to (ph, pw)."""
    h, w = plane.shape
    out = np.empty((ph, pw))
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:, :]
    out[:, w:] = out[:, w - 1: w]
    return out


def _prep_coefficients(pixels: np.ndarray, quality: int,
                       subsampling: str):
    """Shared encoder front half (baseline + progressive): color
    transform, chroma subsample, edge-pad, DCT, quantize → per-component
    zigzagged integer coefficient blocks on the MCU-padded grid."""
    pixels = np.asarray(pixels)
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, ncomp = pixels.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    factors = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in factors:
        raise ValueError("subsampling must be one of "
                         + "/".join(sorted(factors)))
    # luma sampling factors; chroma is always 1x1
    hl, vl = factors[subsampling] if ncomp == 3 else (1, 1)

    planes = (pixels[..., 0].astype(np.float64)[..., None]
              if ncomp == 1 else _rgb_to_ycbcr(pixels.astype(np.float64)))
    qtables = [_quality_scale(_QUANT_LUMA, quality),
               _quality_scale(_QUANT_CHROMA, quality)]

    mcu_w, mcu_h = 8 * hl, 8 * vl
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    comp_planes = []
    for ci in range(ncomp):
        plane = _pad_plane(planes[..., ci], ph, pw)
        if ci > 0 and (hl, vl) != (1, 1):
            # vl x hl box mean; padded dims are MCU multiples so the
            # chroma plane is an 8-multiple automatically
            plane = plane.reshape(ph // vl, vl, pw // hl, hl)
            plane = plane.mean(axis=(1, 3))
        comp_planes.append(plane)

    comp_coeffs = []
    comp_bw = []                   # component block-grid widths
    for ci, plane in enumerate(comp_planes):
        blocks = _to_blocks(plane - 128.0)
        dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = qtables[0 if ci == 0 else 1]
        coeffs = np.round(dct / q).astype(np.int64)
        comp_coeffs.append(coeffs.reshape(-1, 64)[:, _ZIGZAG])
        comp_bw.append(plane.shape[1] // 8)
    return h, w, ncomp, hl, vl, qtables, comp_coeffs, comp_bw, ph, pw


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 grayscale → baseline JPEG.

    ``subsampling``: "444" (one block per component per MCU), "420"
    (2x2 luma blocks + one Cb + one Cr per 16x16 MCU, 2x2 box-mean
    chroma — the dominant layout of real web imagery), "422" (2x1 luma
    per 16x8 MCU, horizontal box-mean chroma) or "440" (1x2 luma per
    8x16 MCU, vertical box-mean chroma)."""
    (h, w, ncomp, hl, vl, qtables, comp_coeffs, comp_bw, ph,
     pw) = _prep_coefficients(pixels, quality, subsampling)

    # ---- headers
    out = bytearray(b"\xff\xd8")                     # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtables[: 1 if ncomp == 1 else 2]):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xDB, bytes([tid]) + zz)
    sof = bytearray([8])                             # precision
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        samp = ((hl << 4) | vl) if ci == 0 else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    for tclass_tid, (bits, vals) in {
        (0, 0): (_DC_BITS, _DC_VALS), (1, 0): (_AC_BITS, _AC_VALS),
        (0, 1): (_DC_BITS, _DC_VALS), (1, 1): (_AC_BITS, _AC_VALS),
    }.items():
        tc, th = tclass_tid
        if ncomp == 1 and th == 1:
            continue
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits[1:17])
                    + bytes(vals))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    # ---- entropy-coded segment, MCU-interleaved per T.81 A.2.3:
    # each MCU carries hs x vs blocks per component in raster order
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    mcux, mcuy = pw // (8 * hl), ph // (8 * vl)
    samps = [(hl, vl)] + [(1, 1)] * (ncomp - 1)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * comp_bw[ci] + (mx * hs + bx)
                        _encode_block(bw, comp_coeffs[ci][bi], prev_dc, ci)
    out += bw.flush()
    out += b"\xff\xd9"                               # EOI
    return bytes(out)


# ---------------------------------------------------- progressive encoder

class _EobrunEmitter:
    """EOB-run + buffered-correction-bit state for progressive AC scans
    (the encode-side mirror of T.81 G.1.2.2/G.1.2.3; structure follows
    the public libjpeg emit_eobrun / encode_mcu_AC_* algorithms)."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.be: list[int] = []      # correction bits attached to the run

    def flush(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, clen = _ACP_ENC[nbits << 4]
            self.bw.write(code, clen)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.be:
            self.bw.write(b, 1)
        self.be = []

    def end_block(self, pending_bits: list[int]) -> None:
        self.eobrun += 1
        self.be.extend(pending_bits)
        if self.eobrun == 0x7FFF:    # EOB14 ceiling
            self.flush()


def _emit_ac_first(em: _EobrunEmitter, zz: np.ndarray, ss: int, se: int,
                   al: int) -> None:
    """One block of an AC first scan: point transform |v|>>al (sign
    kept), run/size coding, trailing zeros fold into the EOB run."""
    bw = em.bw
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = (abs(v) >> al) * (1 if v >= 0 else -1)
        if v == 0:
            run += 1
            continue
        em.flush()
        while run > 15:
            code, clen = _ACP_ENC[0xF0]
            bw.write(code, clen)
            run -= 16
        size = _bit_size(v)
        code, clen = _ACP_ENC[(run << 4) | size]
        bw.write(code, clen)
        bw.write(_amplitude(v, size), size)
        run = 0
    if run > 0:
        em.end_block([])


def _emit_ac_refine(em: _EobrunEmitter, zz: np.ndarray, ss: int, se: int,
                    al: int) -> None:
    """One block of an AC refinement scan (Ah = al+1 → Al = al): newly
    significant coefficients emit (run<<4)|1 + sign; already-significant
    ones contribute correction bits that ride along with the next code
    word or the EOB run."""
    bw = em.bw
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eobk = -1                        # band offset of last NEW significant
    for i, t in enumerate(absv):
        if t == 1:
            eobk = i
    run = 0
    pend: list[int] = []             # this block's buffered correction bits
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eobk:
            em.flush()
            code, clen = _ACP_ENC[0xF0]
            bw.write(code, clen)
            run -= 16
            for b in pend:
                bw.write(b, 1)
            pend = []
        if t > 1:                    # significant before this scan
            pend.append(t & 1)
            continue
        em.flush()
        code, clen = _ACP_ENC[(run << 4) | 1]
        bw.write(code, clen)
        bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in pend:
            bw.write(b, 1)
        pend = []
        run = 0
    if run > 0 or pend:
        em.end_block(pend)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) grayscale → progressive JPEG (SOF2).

    Scan script (exercises all four progressive scan types):
      1. DC first, interleaved, Al=1
      2. DC refinement, interleaved, Ah=1 → Al=0 (1 raw bit / block)
      3. per component: AC first Ss=1-5 then 6-63 at Al=1
      4. per component: AC refinement of both bands, Ah=1 → Al=0
    AC scans are single-component over the ceil block grid per T.81
    (MCU-padding blocks outside it are never coded), with EOBn run
    coding; same DCT/quant front half as :func:`encode_jpeg`."""
    (h, w, ncomp, hl, vl, qtables, comp_coeffs, comp_bw, ph,
     pw) = _prep_coefficients(pixels, quality, subsampling)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtables[: 1 if ncomp == 1 else 2]):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xDB, bytes([tid]) + zz)
    sof = bytearray([8])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        samp = ((hl << 4) | vl) if ci == 0 else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += _seg(0xC2, bytes(sof))                    # SOF2: progressive
    for tclass_tid, (bits, vals) in {
        (0, 0): (_DC_BITS, _DC_VALS), (1, 0): (_ACP_BITS, _ACP_VALS),
        (0, 1): (_DC_BITS, _DC_VALS), (1, 1): (_ACP_BITS, _ACP_VALS),
    }.items():
        tc, th = tclass_tid
        if ncomp == 1 and th == 1:
            continue
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits[1:17])
                    + bytes(vals))

    samps = [(hl, vl)] + [(1, 1)] * (ncomp - 1)
    mcux, mcuy = pw // (8 * hl), ph // (8 * vl)
    hmax, vmax = hl, vl
    # ceil block grids for the single-component (non-interleaved) scans
    ceil_grids = []
    for hs, vs in samps:
        cw_px = -(-w * hs // hmax)   # ceil(w * hs / hmax)
        ch_px = -(-h * vs // vmax)
        ceil_grids.append((-(-ch_px // 8), -(-cw_px // 8)))

    def sos(comps_td_ta: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytearray([len(comps_td_ta)])
        for cid, td, ta in comps_td_ta:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(body))

    # ---- scan 1: DC first, interleaved, Al=1
    out += sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)],
               0, 0, 0, 1)
    bw = _BitWriter()
    prev = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * comp_bw[ci] + (mx * hs + bx)
                        dc = int(comp_coeffs[ci][bi][0]) >> 1
                        diff = dc - prev[ci]
                        prev[ci] = dc
                        size = _bit_size(diff)
                        code, clen = _DC_ENC[size]
                        bw.write(code, clen)
                        if size:
                            bw.write(_amplitude(diff, size), size)
    out += bw.flush()

    # ---- scan 2: DC refinement, interleaved, Ah=1 → Al=0 (raw bits)
    out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * comp_bw[ci] + (mx * hs + bx)
                        bw.write(int(comp_coeffs[ci][bi][0]) & 1, 1)
    out += bw.flush()

    # ---- AC scans: first (Al=1) then refinement (Ah=1→Al=0), per
    # component, spectral bands 1-5 and 6-63
    for ah, al, emit in ((0, 1, _emit_ac_first), (1, 0, _emit_ac_refine)):
        for ci in range(ncomp):
            bh, bwid = ceil_grids[ci]
            for ss, se in ((1, 5), (6, 63)):
                out += sos([(ci + 1, 0, 0 if ci == 0 else 1)], ss, se,
                           ah, al)
                bw = _BitWriter()
                em = _EobrunEmitter(bw)
                for by in range(bh):
                    for bx in range(bwid):
                        emit(em, comp_coeffs[ci][by * comp_bw[ci] + bx],
                             ss, se, al)
                em.flush()
                out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- decoder

class _HuffTable:
    """Canonical Huffman decode table from a DHT (bits, values) spec."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(bits[length]):
                self.lookup[(length, code)] = values[vi]
                code += 1
                vi += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _scan_sequential(br: _BitReader, scan, huff, store, mcux: int,
                     mcuy: int) -> None:
    """Baseline/sequential entropy decode: one MCU-interleaved scan
    carrying DC+AC for every component (T.81 A.2.3)."""
    prev_dc = [0] * len(scan)
    for my in range(mcuy):
        for mx in range(mcux):
            for si, (comp, td, ta) in enumerate(scan):
                hs, vs = comp["hs"], comp["vs"]
                gw = comp["gw"]
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                for by in range(vs):
                    for bx in range(hs):
                        size = dc_t.decode(br)
                        diff = (_extend(br.read_bits(size), size)
                                if size else 0)
                        prev_dc[si] += diff
                        zz = store[comp["id"]][
                            (my * vs + by) * gw + (mx * hs + bx)]
                        zz[0] = prev_dc[si]
                        k = 1
                        while k <= 63:
                            sym = ac_t.decode(br)
                            if sym == 0x00:          # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16              # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1


def _scan_dc_progressive(br: _BitReader, scan, huff, store, mcux: int,
                         mcuy: int, ah: int, al: int) -> None:
    """Progressive DC scan, interleaved or single-component: first pass
    (Ah=0) Huffman-codes the point-transformed DC diffs; refinement
    passes read one raw bit per block (T.81 G.2)."""
    seq: list[tuple[dict, int, int]] = []   # (comp, td, block index)
    if len(scan) == 1:
        comp, td, _ = scan[0]
        for by in range(comp["ch_b"]):      # non-interleaved: ceil grid
            for bx in range(comp["cw_b"]):
                seq.append((comp, td, by * comp["gw"] + bx))
    else:
        for my in range(mcuy):              # MCU-interleaved
            for mx in range(mcux):
                for comp, td, _ in scan:
                    hs, vs = comp["hs"], comp["vs"]
                    for by in range(vs):
                        for bx in range(hs):
                            seq.append((comp, td, (my * vs + by)
                                        * comp["gw"] + (mx * hs + bx)))
    if ah == 0:
        prev_dc = {comp["id"]: 0 for comp, _, _ in scan}
        for comp, td, bi in seq:
            size = huff[(0, td)].decode(br)
            diff = _extend(br.read_bits(size), size) if size else 0
            prev_dc[comp["id"]] += diff
            store[comp["id"]][bi][0] = prev_dc[comp["id"]] << al
    else:
        for comp, _, bi in seq:
            if br.read_bit():
                store[comp["id"]][bi][0] |= 1 << al


def _block_ac_first(br: _BitReader, ac_t: _HuffTable, zz: np.ndarray,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first pass for one block (T.81 G.2.2): run/size
    with EOBn run-length symbols. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac_t.decode(br)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:
                k += 16              # ZRL
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.read_bits(r)
            return eobrun - 1        # current block is the run's first
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _block_ac_refine(br: _BitReader, ac_t: _HuffTable, zz: np.ndarray,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement for one block (T.81 G.2.3 / the public
    libjpeg decode_mcu_AC_refine structure): newly significant
    coefficients arrive as (run<<4)|1 + sign, already-nonzero ones
    absorb correction bits, EOBn runs refine whole block tails."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac_t.decode(br)
            r, s = sym >> 4, sym & 0xF
            newval = 0
            if s == 0:
                if r != 15:          # EOBn: run of blocks ending here
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients (s stays 0)
            else:
                if s != 1:
                    raise ValueError("bad refinement symbol")
                newval = p1 if br.read_bit() else m1
            # advance over r zero-history coefficients, refining any
            # already-nonzero ones passed over (they don't count)
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement past band end")
                zz[k] = newval
            k += 1
    if eobrun > 0:
        # EOB logic: refine every remaining nonzero coefficient
        while k <= se:
            if zz[k] != 0:
                if br.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → (H, W, 3) uint8 RGB ((H, W) gray).

    Supports 8-bit Huffman streams whose per-component sampling factors
    are in {1, 2} — 4:4:4, 4:2:0, 4:2:2, 4:4:0 and grayscale — as either
    a single interleaved baseline scan (SOF0/SOF1) or a progressive scan
    script (SOF2: DC first/refine interleaved or single-component, AC
    first/refine single-component with EOBn runs and spectral
    selection). No restart markers, no arithmetic coding, no 12-bit.
    Subsampled chroma is upsampled by pixel replication."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], _HuffTable] = {}
    h = w = 0
    comps: list[dict] = []
    progressive = False
    store: dict[int, np.ndarray] | None = None
    mcux = mcuy = hmax = vmax = 0
    nscans = 0

    def ensure_store() -> None:
        nonlocal store, mcux, mcuy, hmax, vmax
        if store is not None:
            return
        if not comps:
            raise ValueError("SOS before SOF")
        hmax = max(c["hs"] for c in comps)
        vmax = max(c["vs"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        store = {}
        for c in comps:
            c["gh"], c["gw"] = mcuy * c["vs"], mcux * c["hs"]
            # ceil grid: the blocks single-component scans actually code
            ch_px = -(-h * c["vs"] // vmax)   # ceil(h * vs / vmax)
            cw_px = -(-w * c["hs"] // hmax)
            c["ch_b"] = -(-ch_px // 8)
            c["cw_b"] = -(-cw_px // 8)
            store[c["id"]] = np.zeros((c["gh"] * c["gw"], 64),
                                      dtype=np.int64)

    while True:
        # tolerate 0xFF fill bytes before a marker
        while payload[pos] == 0xFF and payload[pos + 1] == 0xFF:
            pos += 1
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                           # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                                 # standalone markers
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + ln]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8)
                q = np.zeros(64)
                q[_ZIGZAG] = zz
                qtables[tq] = q.reshape(8, 8)
                off += 65
        elif marker in (0xC0, 0xC1, 0xC2):
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = samp >> 4, samp & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hs}x{vs} (only 1-2 supported)")
                comps.append({"id": cid, "tq": tq, "hs": hs, "vs": vs})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("unsupported SOF (lossless/"
                                      "arithmetic/differential)")
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = [0] + list(seg[off + 1 : off + 17])
                nval = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nval])
                hufftables[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + nval
        elif marker == 0xDD:
            if int.from_bytes(seg, "big") != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            ensure_store()
            br = _BitReader(payload, pos + ln)
            if not progressive:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad baseline scan header")
                if len(scan) != len(comps):
                    raise NotImplementedError(
                        "non-interleaved sequential scans")
                _scan_sequential(br, scan, hufftables, store, mcux, mcuy)
            elif ss == 0:                            # DC scan
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                if 1 < len(scan) < len(comps):
                    raise NotImplementedError("partial DC interleave")
                _scan_dc_progressive(br, scan, hufftables, store,
                                     mcux, mcuy, ah, al)
            else:                                    # AC scan
                if len(scan) != 1:
                    raise ValueError("AC scans must be single-component")
                comp, _, ta = scan[0]
                ac_t = hufftables[(1, ta)]
                zzs = store[comp["id"]]
                gw = comp["gw"]
                block_fn = _block_ac_first if ah == 0 else _block_ac_refine
                eobrun = 0
                for by in range(comp["ch_b"]):
                    for bx in range(comp["cw_b"]):
                        eobrun = block_fn(br, ac_t, zzs[by * gw + bx],
                                          ss, se, al, eobrun)
            nscans += 1
            pos = br.pos
            # resync: skip unconsumed pad/stuffing to the next marker
            while payload[pos] != 0xFF or payload[pos + 1] == 0x00:
                pos += 1
            continue
        pos += ln

    if store is None or nscans == 0:
        raise ValueError("EOI before SOS")

    # ---- dequantize + IDCT + reassemble (+ replication upsample)
    planes = []
    for comp in comps:
        gh, gw = comp["gh"], comp["gw"]
        q = qtables[comp["tq"]].reshape(-1)[_ZIGZAG]
        deq = (store[comp["id"]].astype(np.float64) * q)[:, _UNZIGZAG]
        deq = deq.reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", _C, deq, _C) + 128.0
        plane = _from_blocks(blocks, gh * 8, gw * 8)
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
