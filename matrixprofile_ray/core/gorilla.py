"""Gorilla-style series compression: XOR floats + delta-of-delta timestamps.

Implements the two stream codecs from the Gorilla paper (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015 §4.1):

- values: float64 XOR with previous; '0' for identical, '10' reuse previous
  leading/meaningful-bit window, '11' + 5-bit leading + 6-bit length + bits.
- timestamps: int64 (µs) first value raw, then delta, then delta-of-delta
  bucketed into {0, 7, 9, 12, 64}-bit classes.

This is the engine's binary format for retention tiers (north rule); the
reference's protobuf format (io/protobuf/proto_messages.proto:9-80) plays the
equivalent role there. Bit-exact round-trip is required (FIXTURES.md F5),
including NaN payloads and constant runs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "gorilla_encode_floats",
    "gorilla_decode_floats",
    "timestamps_encode",
    "timestamps_decode",
]


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining:
            byte_idx, bit_idx = divmod(self.pos, 8)
            take = min(8 - bit_idx, remaining)
            chunk = self.data[byte_idx] >> (8 - bit_idx - take)
            out = (out << take) | (chunk & ((1 << take) - 1))
            self.pos += take
            remaining -= take
        return out


def gorilla_encode_floats(values: np.ndarray) -> bytes:
    """Encode a float64 array; returns bytes with a 4-byte length header.

    Hot path is the C codec (core/_native.py, bit-exact replica of the
    loop below — parity-tested); the Python loop remains as the
    no-compiler fallback and the format's reference implementation.
    """
    values = np.asarray(values, dtype="<f8")
    from matrixprofile_ray.core import _native

    enc = _native.native_gorilla_encode(values)
    if enc is not None:
        return enc
    bits = values.view("<u8")
    n = len(values)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()

    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        trail = (xor & -xor).bit_length() - 1
        if lead > 31:
            lead = 31
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= 64 - prev_lead - prev_len
        ):
            w.write(0b10, 2)
            w.write(xor >> (64 - prev_lead - prev_len), prev_len)
        else:
            mbits = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mbits - 1, 6)  # 1..64 stored as 0..63
            w.write(xor >> trail, mbits)
            prev_lead, prev_len = lead, mbits
    return w.getvalue()


def gorilla_decode_floats(data: bytes) -> np.ndarray:
    from matrixprofile_ray.core import _native

    dec = _native.native_gorilla_decode(data)
    if dec is not None:
        return dec
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype="<u8")
    if n == 0:
        return out.view("<f8")
    prev = r.read(64)
    out[0] = prev
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:
            lead, mbits = prev_lead, prev_len
        else:
            lead = r.read(5)
            mbits = r.read(6) + 1
            prev_lead, prev_len = lead, mbits
        xor = r.read(mbits) << (64 - lead - mbits)
        prev ^= xor
        out[i] = prev
    return out.view("<f8")


_DOD_CLASSES = (
    (63, 0b10, 2, 7),
    (255, 0b110, 3, 9),
    (2047, 0b1110, 4, 12),
)


def timestamps_encode(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (µs since epoch)."""
    ts = np.asarray(ts).astype(np.int64)
    from matrixprofile_ray.core import _native

    enc = _native.native_ts_encode(ts)
    if enc is not None:
        return enc
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]), 64)
    for dod in np.diff(deltas):
        dod = int(dod)
        if dod == 0:
            w.write(0, 1)
            continue
        for bound, prefix, pbits, vbits in _DOD_CLASSES:
            if -bound - 1 <= dod <= bound:
                w.write(prefix, pbits)
                w.write(dod, vbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod, 64)
    return w.getvalue()


def timestamps_decode(data: bytes) -> np.ndarray:
    from matrixprofile_ray.core import _native

    dec = _native.native_ts_decode(data)
    if dec is not None:
        return dec
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = _signed(r.read(64), 64)
    if n == 1:
        return out
    delta = _signed(r.read(64), 64)
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            cls = 0
            while cls < 3 and r.read(1) == 1:
                cls += 1
            vbits = (7, 9, 12, 64)[cls]
            dod = _signed(r.read(vbits), vbits)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _signed(value: int, bits: int) -> int:
    if value >= 1 << (bits - 1):
        value -= 1 << bits
    return value
