"""Pure-Python GIF codec (encode + decode) for the multimodal decode
stage.

GIF is the dominant short-animation format of real web corpora, so the
engine owns a real decoder: GIF87a/89a per the public CompuServe /
W3C specification — LZW with variable code width (3..12 bits,
LSB-first packing), global + local color tables, interlaced images,
frame composition with disposal methods 0/1 (leave), 2 (restore to
background) and 3 (restore to previous), transparency, and the
Netscape looping extension. No reference-repo counterpart exists (the
reference has no image support); this is engine-added corpus surface,
same contract as ``stages/jpeg.py`` / ``stages/png.py``.

Animated GIFs are videos for pipeline purposes: ``parse_gif`` yields
fully composited RGB frames + per-frame delays, and the decode stage
samples frames BEFORE pixel feature work (same rule as MJPEG-AVI).
The encoder exists to build deterministic fixtures exercising every
decoder path; output is spec-valid and opens in any viewer.
"""
from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order for an interlaced image (encode direction)."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, dtype=np.int64)


# ---------------------------------------------------------------- LZW

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over a uint8 index stream (LSB-first packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def code_of(seq: bytes) -> int:
        return table[seq] if len(seq) > 1 else seq[0]

    emit(clear, width)
    data = indices.tobytes()
    if data:
        prefix = data[0:1]
        for i in range(1, len(data)):
            ch = data[i:i + 1]
            cand = prefix + ch
            if cand in table:
                prefix = cand
                continue
            emit(code_of(prefix), width)
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            else:  # table full: emit clear, restart (codes stay 12-bit)
                emit(clear, width)
                table.clear()
                next_code = eoi + 1
                width = min_code_size + 1
            prefix = ch
        emit(code_of(prefix), width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """Decode a GIF LZW stream → uint8 index array of length ``expect``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # tolerate a missing explicit EOI at stream end
                if len(out) >= expect:
                    return np.frombuffer(
                        bytes(out[:expect]), dtype=np.uint8).copy()
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear streams stop adding
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("GIF LZW stream shorter than image")
    return np.frombuffer(bytes(out[:expect]), dtype=np.uint8).copy()


# ------------------------------------------------------------- encode

def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list]:
    """Exact global palette from the union of frame colors (≤256)."""
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, inv = np.unique(allpx, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"{len(pal)} distinct colors; GIF fixtures need <= 256 "
            "(quantize upstream)")
    idx_frames = []
    off = 0
    for f in frames:
        cnt = f.shape[0] * f.shape[1]
        idx_frames.append(
            inv[off:off + cnt].astype(np.uint8).reshape(f.shape[:2]))
        off += cnt
    return pal.astype(np.uint8), idx_frames


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        blk = data[i:i + 255]
        out.append(len(blk))
        out += blk
    out.append(0)
    return bytes(out)


def encode_gif(frames, palette: np.ndarray | None = None,
               delays_cs=None, interlace: bool = False,
               transparent: int | None = None,
               disposal: int = 1, loop: bool = True) -> bytes:
    """Encode frames as a spec-valid GIF89a.

    ``frames``: list of (H, W, 3) uint8 RGB arrays (exact palette is
    built from their color union, ≤256 colors) or, with ``palette``
    given as (N≤256, 3) uint8, a list of (H, W) uint8 index arrays.
    ``delays_cs``: per-frame delay in centiseconds (default 10).
    ``disposal``: GIF disposal method stamped on every frame.
    """
    if not frames:
        raise ValueError("need at least one frame")
    frames = [np.asarray(f) for f in frames]
    if palette is None:
        palette, idx_frames = _build_palette(frames)
    else:
        palette = np.asarray(palette, dtype=np.uint8)
        idx_frames = [f.astype(np.uint8) for f in frames]
    h, w = idx_frames[0].shape
    if any(f.shape != (h, w) for f in idx_frames):
        raise ValueError("all frames must share one size")
    if delays_cs is None:
        delays_cs = [10] * len(frames)

    # global color table size: 2^(n+1) entries, padded with black
    n = max(1, (len(palette) - 1).bit_length() - 1 + 1) - 1
    while (2 << n) < len(palette):
        n += 1
    gct = np.zeros((2 << n, 3), dtype=np.uint8)
    gct[:len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | n)  # GCT flag, color res 8, size n
    out += b"\x00\x00"               # bg index, aspect
    out += gct.tobytes()
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, n + 1)
    for fi, idx in enumerate(idx_frames):
        # graphic control extension
        packed = (disposal & 7) << 2
        tidx = 0
        if transparent is not None:
            packed |= 1
            tidx = transparent
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed,
                           int(delays_cs[fi]), tidx, 0)
        # image descriptor (always full canvas in the encoder)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0)
        rows = idx[_interlace_order(h)] if interlace else idx
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


# ------------------------------------------------------------- decode

def parse_gif(payload: bytes):
    """Parse a GIF → (width, height, frames) with ``frames`` a list of
    ``{"pixels": (H, W, 3) uint8 composited canvas, "delay_cs": int}``.

    Composition honors disposal methods 0/1/2/3, transparency and
    local color tables; interlaced images are de-interlaced. CRC-free
    format — structural errors raise ``ValueError``.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        gct = np.frombuffer(payload, dtype=np.uint8, count=size * 3,
                            offset=pos).reshape(-1, 3)
        pos += size * 3
    bg_index = payload[11]

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames = []
    delay_cs = 10
    transparent = None
    disposal = 0

    def read_sub_blocks(p):
        chunks = []
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            ln = payload[p]
            p += 1
            if ln == 0:
                break
            chunks.append(payload[p:p + ln])
            p += ln
        return b"".join(chunks), p

    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = read_sub_blocks(pos)
            if label == 0xF9 and len(data) >= 4:
                gpacked, delay_cs, tidx = struct.unpack_from(
                    "<BHB", data, 0)
                disposal = (gpacked >> 2) & 7
                transparent = tidx if gpacked & 1 else None
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB",
                                                        payload, pos)
        pos += 9
        if ipacked & 0x80:
            size = 2 << (ipacked & 7)
            lct = np.frombuffer(payload, dtype=np.uint8, count=size * 3,
                                offset=pos).reshape(-1, 3)
            pos += size * 3
        else:
            lct = gct
        if lct is None:
            raise ValueError("GIF image with no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = read_sub_blocks(pos)
        idx = _lzw_decode(data, mcs, iw * ih)
        if ipacked & 0x40:  # interlaced
            lin = np.empty((ih, iw), dtype=np.uint8)
            lin[_interlace_order(ih)] = idx.reshape(ih, iw)
            idx = lin
        else:
            idx = idx.reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("GIF color index out of range")

        prev_region = canvas[top:top + ih, left:left + iw].copy()
        region = canvas[top:top + ih, left:left + iw]
        rgb = lct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append({"pixels": canvas.copy(),
                       "delay_cs": int(delay_cs)})
        if disposal == 2:  # restore to background
            bg = (gct[bg_index] if gct is not None
                  and bg_index < len(gct) else np.zeros(3, np.uint8))
            canvas[top:top + ih, left:left + iw] = bg
        elif disposal == 3:  # restore to previous
            canvas[top:top + ih, left:left + iw] = prev_region
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image")
    return w, h, frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First (poster) frame of a GIF → (H, W, 3) uint8 RGB."""
    _, _, frames = parse_gif(payload)
    return frames[0]["pixels"]
