"""Pure-numpy PNG codec (encode + decode) for the multimodal decode
stage.

PNG is the second-dominant still-image format of real web corpora
(after JPEG), so the engine owns a real decoder for it instead of the
generic ``NotImplementedError`` codec boundary: W3C PNG spec (ISO/IEC
15948) — zlib/DEFLATE via the stdlib ``zlib`` module, all five scanline
filters (None/Sub/Up/Average/Paeth), bit depths 1/2/4/8/16, color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), and
Adam7 interlace. Everything here is public-spec knowledge only; no
reference-repo counterpart exists (the reference has no image support
at all) — this is engine-added corpus surface, same contract as
``stages/jpeg.py``.

Decode returns (H, W, 3) uint8 RGB for color inputs and (H, W) uint8
for grayscale inputs (matching ``jpeg.decode_jpeg``); 16-bit samples
are reduced to their high byte; alpha is dropped after decode (the
feature extractor is luminance-based).

The encoder exists to build deterministic fixtures that exercise every
decoder path (filter strategies, palettes, interlace) — it emits
spec-valid files any external viewer can open.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one pixel's channels (int16 in,
    uint8-valued out)."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to a raw scanline (encode direction)."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    ul = np.zeros_like(r)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - ((left + up) >> 1)
    elif ftype == 4:
        out = r - _paeth(left, up, ul)
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Invert filter ``ftype`` on one scanline (decode direction).

    Up is fully vectorized; Sub is a wrapping prefix-sum per channel
    phase; Average/Paeth carry a left dependency, so they loop over
    pixels but stay vectorized across the ``bpp`` channel lanes.
    """
    if ftype == 0:
        return row.copy()
    if ftype == 2:
        return (row.astype(np.int16) + prev).astype(np.uint8)
    n = len(row)
    if ftype == 1:
        out = row.copy()
        # wrapping cumulative sum along each channel phase
        for ph in range(bpp):
            lane = out[ph::bpp]
            np.add.accumulate(lane, out=lane, dtype=np.uint8)
        return out
    out = np.empty(n, dtype=np.uint8)
    pr = prev.astype(np.int16)
    rw = row.astype(np.int16)
    if ftype == 3:
        out[:bpp] = (rw[:bpp] + (pr[:bpp] >> 1)) & 0xFF
        for i in range(bpp, n, bpp):
            a = out[i - bpp:i].astype(np.int16)
            out[i:i + bpp] = (rw[i:i + bpp]
                              + ((a + pr[i:i + bpp]) >> 1)) & 0xFF
        return out
    if ftype == 4:
        zero = np.zeros(bpp, dtype=np.int16)
        out[:bpp] = (rw[:bpp] + _paeth(zero, pr[:bpp], zero)) & 0xFF
        for i in range(bpp, n, bpp):
            a = out[i - bpp:i].astype(np.int16)
            out[i:i + bpp] = (rw[i:i + bpp]
                              + _paeth(a, pr[i:i + bpp],
                                       pr[i - bpp:i])) & 0xFF
        return out
    raise ValueError(f"bad filter type {ftype}")


def _pack_bits(samples: np.ndarray, depth: int) -> bytes:
    """Pack sub-byte samples (one scanline) MSB-first, zero-padded."""
    per = 8 // depth
    n = len(samples)
    padded = np.zeros(((n + per - 1) // per) * per, dtype=np.uint8)
    padded[:n] = samples
    padded = padded.reshape(-1, per)
    out = np.zeros(len(padded), dtype=np.uint8)
    for k in range(per):
        out |= (padded[:, k] & ((1 << depth) - 1)) << (8 - depth * (k + 1))
    return out.tobytes()


def _unpack_bits(raw: np.ndarray, depth: int, count: int) -> np.ndarray:
    """Unpack MSB-first sub-byte samples from a scanline's bytes."""
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1) * depth
    vals = (raw[:, None] >> shifts[None, :]) & ((1 << depth) - 1)
    return vals.reshape(-1)[:count].astype(np.uint8)


def _scanline_bytes(w: int, channels: int, depth: int) -> tuple[int, int]:
    """(bytes per scanline, filter bpp offset) for the given geometry."""
    bits = w * channels * depth
    nbytes = (bits + 7) // 8
    bpp = max(1, (channels * depth + 7) // 8)
    return nbytes, bpp


def _encode_pass(img: np.ndarray, depth: int, filter_type) -> bytes:
    """Filter + serialize one image (or one Adam7 sub-image); ``img``
    has shape (h, w, channels) with samples already at ``depth``."""
    h, w, channels = img.shape
    if h == 0 or w == 0:
        return b""
    nbytes, bpp = _scanline_bytes(w, channels, depth)
    prev = np.zeros(nbytes, dtype=np.uint8)
    parts = []
    for y in range(h):
        if depth == 16:
            row = img[y].astype(">u2").tobytes()
            raw = np.frombuffer(row, dtype=np.uint8).copy()
        elif depth == 8:
            raw = img[y].astype(np.uint8).reshape(-1).copy()
        else:
            raw = np.frombuffer(
                _pack_bits(img[y].reshape(-1), depth), dtype=np.uint8
            ).copy()
        ft = filter_type(y) if callable(filter_type) else filter_type
        parts.append(bytes([ft]))
        parts.append(_filter_row(ft, raw, prev, bpp).tobytes())
        prev = raw
    return b"".join(parts)


def encode_png(pixels: np.ndarray, *, color_type: int | None = None,
               bit_depth: int = 8, filter_type=0,
               interlace: bool = False,
               palette: np.ndarray | None = None) -> bytes:
    """Encode an image as a spec-valid PNG.

    ``pixels``: (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA uint8 — or,
    for color type 3, an (H, W) array of palette indices with
    ``palette`` an (N<=256, 3) uint8 array. ``filter_type`` is an int
    0-4 or a callable ``y -> int`` (lets fixtures exercise every filter
    in one file). ``bit_depth`` 1/2/4 valid for gray and palette, 8/16
    for all types.
    """
    px = np.asarray(pixels)
    if color_type is None:
        if px.ndim == 2:
            color_type = 0
        else:
            color_type = {1: 0, 2: 4, 3: 2, 4: 6}[px.shape[2]]
    if color_type == 3:
        if palette is None:
            raise ValueError("color type 3 requires a palette")
        if px.ndim != 2:
            raise ValueError("palette image must be (H, W) indices")
    channels = _CHANNELS[color_type]
    if px.ndim == 2:
        img = px[:, :, None]
    else:
        img = px
    if img.shape[2] != channels:
        raise ValueError(
            f"color type {color_type} needs {channels} channels, "
            f"got {img.shape[2]}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad bit depth {bit_depth}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte depth only valid for gray/palette")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("palette images are 1/2/4/8-bit only")
    h, w = img.shape[:2]

    if interlace:
        raws = []
        for (x0, y0, dx, dy) in _ADAM7:
            sub = img[y0::dy, x0::dx]
            raws.append(_encode_pass(sub, bit_depth, filter_type))
        raw = b"".join(raws)
    else:
        raw = _encode_pass(img, bit_depth, filter_type)

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                       1 if interlace else 0)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if color_type == 3:
        out.append(_chunk(b"PLTE",
                          np.asarray(palette, dtype=np.uint8).tobytes()))
    comp = zlib.compress(raw, 6)
    # split IDAT to exercise multi-chunk reassembly in the decoder
    step = 8192
    for i in range(0, len(comp), step):
        out.append(_chunk(b"IDAT", comp[i:i + step]))
    if len(comp) == 0:
        out.append(_chunk(b"IDAT", b""))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _decode_pass(raw: bytes, off: int, h: int, w: int, channels: int,
                 depth: int) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image from the decompressed stream; returns
    ((h, w, channels) uint8 samples scaled to 8-bit, new offset)."""
    if h == 0 or w == 0:
        return np.zeros((h, w, channels), dtype=np.uint8), off
    nbytes, bpp = _scanline_bytes(w, channels, depth)
    need = h * (1 + nbytes)
    if len(raw) - off < need:
        raise ValueError("truncated PNG pixel data")
    buf = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off)
    buf = buf.reshape(h, 1 + nbytes)
    prev = np.zeros(nbytes, dtype=np.uint8)
    rows = np.empty((h, nbytes), dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(buf[y, 0]), buf[y, 1:], prev, bpp)
        rows[y] = prev
    if depth == 16:
        img = rows.reshape(h, w, channels, 2)[:, :, :, 0]  # high byte
    elif depth == 8:
        img = rows.reshape(h, w, channels)
    else:
        img = np.stack([
            _unpack_bits(rows[y], depth, w * channels) for y in range(h)
        ]).reshape(h, w, channels)
    return img, off + need


def decode_png(payload: bytes, *, keep_alpha: bool = False,
               raw_indices: bool = False) -> np.ndarray:
    """Decode a PNG → (H, W, 3) uint8 RGB ((H, W) for grayscale).

    Handles all five filters, bit depths 1/2/4/8/16 (16-bit reduced to
    the high byte), color types 0/2/3/4/6 and Adam7 interlace. CRCs are
    verified. ``keep_alpha`` returns (H, W, 4) / (H, W, 2) instead of
    dropping alpha; ``raw_indices`` returns palette indices without
    palette lookup (for exactness tests).
    """
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad PNG bit depth {depth}")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))

    if interlace == 1:
        img = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for (x0, y0, dx, dy) in _ADAM7:
            ph = len(range(y0, h, dy))
            pw = len(range(x0, w, dx))
            sub, off = _decode_pass(raw, off, ph, pw, channels, depth)
            img[y0::dy, x0::dx] = sub
    elif interlace == 0:
        img, _ = _decode_pass(raw, 0, h, w, channels, depth)
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")

    # scale sub-byte samples to full 8-bit range (gray); palette indices
    # stay raw
    if depth < 8 and color_type == 0:
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)
               ).astype(np.uint8)

    if color_type == 3:
        if raw_indices:
            return img[:, :, 0]
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if int(img.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[img[:, :, 0]]
    if color_type == 0:
        return img[:, :, 0]
    if color_type == 2:
        return img
    if color_type == 4:  # gray + alpha
        return img if keep_alpha else img[:, :, 0]
    # RGBA
    return img if keep_alpha else img[:, :, :3]
