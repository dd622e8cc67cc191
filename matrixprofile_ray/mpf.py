"""The reference's ``.mpf`` binary format, wire-compatible, from scratch.

``to_mpf(profile) -> bytes`` / ``from_mpf(bytes) -> profile`` serialize a
MatrixProfile or Pan-MatrixProfile dict to the proto3 message the reference
defines (io/protobuf/proto_messages.proto:9-119) and converts
(io/protobuf/protobuf_utils.py:156-296, 411-476 — the parity target for
field mapping and round-trip semantics; tests/test_io.py:19-123 is the
behavioral model).

This is a hand-rolled proto3 WIRE codec for that fixed schema — no
protobuf runtime dependency, arrays packed via vectorized numpy byte
views. Wire compatibility is what matters (a reference user's .mpf files
load here and vice versa); the schema:

    DoubleMatrix { uint64 rows=1; uint64 cols=2; repeated double data=3 [packed] }
    IntMatrix    { uint64 rows=1; uint64 cols=2; repeated int64  data=3 [packed] }
    Location     { uint64 row=1; uint64 col=2 }
    Motif        { repeated Location motifs=1; repeated Location neighbors=2 }
    MatrixProfile{ DoubleMatrix mp=1; IntMatrix pi=2; DoubleMatrix lmp=3;
                   IntMatrix lpi=4; DoubleMatrix rmp=5; IntMatrix rpi=6;
                   uint64 ez=9; bool join=10 }
    PanMatrixProfile { DoubleMatrix pmp=1; IntMatrix pmpi=2 }
    MPFOutput    { string klass=1; string algorithm=2; string metric=3;
                   double sample_pct=4; repeated uint64 windows=5 [packed];
                   DoubleMatrix ts=6; DoubleMatrix query=7; MatrixProfile mp=8;
                   PanMatrixProfile pmp=9; repeated Motif motifs=10;
                   repeated Location discords=11; DoubleMatrix cmp=12;
                   DoubleMatrix av=13; string av_type=14 }

Proto3 conventions honored: little-endian fixed64 doubles, varint zig-zag-
free int64 (negative → 10-byte two's-complement varint), default-valued
scalar fields omitted on write, unknown fields skipped on read.
"""

from __future__ import annotations

import numpy as np

__all__ = ["to_mpf", "from_mpf", "to_mpf_file", "from_mpf_file"]

_VARINT = 0
_I64 = 1
_LEN = 2


# ------------------------------------------------------------ primitives

def _varint(value: int) -> bytes:
    """Unsigned LEB128; int64 negatives are encoded via their uint64 view."""
    value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & ((1 << 64) - 1), pos
        shift += 7


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == _VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == _I64:
        return pos + 8
    if wire == _LEN:
        ln, pos = _read_varint(buf, pos)
        return pos + ln
    if wire == 5:  # I32
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value_or_span) over one message."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == _VARINT:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == _I64:
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        else:
            pos = _skip(buf, pos, wire)


# ------------------------------------------------------------- matrices

def _matrix_bytes(arr, int_type: bool) -> bytes:
    """DoubleMatrix / IntMatrix message bytes from a 1-D or 2-D array.

    Mirrors reference get_matrix_attributes (protobuf_utils.py:19-43):
    rows = shape[0], cols = shape[1] if 2-D else 0 (omitted as default).
    """
    arr = np.asarray(arr)
    rows = arr.shape[0]
    cols = arr.shape[1] if arr.ndim > 1 else 0
    flat = arr.ravel()
    out = bytearray()
    if rows:
        out += _tag(1, _VARINT) + _varint(rows)
    if cols:
        out += _tag(2, _VARINT) + _varint(cols)
    if len(flat):
        if int_type:
            payload = b"".join(_varint(int(v)) for v in flat)
        else:
            payload = np.ascontiguousarray(flat, dtype="<f8").tobytes()
        out += _len_field(3, payload)
    return bytes(out)


def _parse_matrix(buf: bytes, int_type: bool):
    rows = cols = 0
    data = None
    for field, wire, val in _fields(buf):
        if field == 1 and wire == _VARINT:
            rows = val
        elif field == 2 and wire == _VARINT:
            cols = val
        elif field == 3 and wire == _LEN:
            if int_type:
                vals, pos = [], 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    if v >= 1 << 63:
                        v -= 1 << 64
                    vals.append(v)
                data = np.array(vals, dtype=np.int64)
            else:
                data = np.frombuffer(val, dtype="<f8").copy()
    if data is None or len(data) < 1:
        # Distinguish "field absent" (None) from "empty array serialized"
        # (rows header present, zero data bytes) so degenerate profiles
        # round-trip to an empty array rather than None.
        if rows:
            dtype = np.int64 if int_type else np.float64
            return np.empty(0, dtype=dtype)
        return None
    # reference from_proto_to_array keeps int data as float64 unless the
    # IntMatrix path is used; reshape only when 2-D
    if cols > 0:
        data = data.reshape(rows, cols)
    return data


def _location_bytes(row: int, col: int) -> bytes:
    out = bytearray()
    if row:
        out += _tag(1, _VARINT) + _varint(int(row))
    if col:
        out += _tag(2, _VARINT) + _varint(int(col))
    return bytes(out)


def _parse_location(buf: bytes) -> tuple[int, int]:
    row = col = 0
    for field, wire, val in _fields(buf):
        if field == 1:
            row = val
        elif field == 2:
            col = val
    return row, col


def _loc_of(index) -> tuple[int, int]:
    """(row, col) from a 1-D int index or a (row, col) pair — reference
    get_proto_motif/get_proto_discord semantics."""
    if np.ndim(index) > 0 or isinstance(index, (list, tuple)):
        return int(index[0]), int(index[1])
    return int(index), 0


# --------------------------------------------------------------- encode

def to_mpf(profile: dict) -> bytes:
    """Profile dict → ``.mpf`` bytes (reference protobuf_utils.to_mpf)."""
    klass = profile.get("class")
    out = bytearray()
    if klass:
        out += _len_field(1, klass.encode())
    if profile.get("algorithm"):
        out += _len_field(2, profile["algorithm"].encode())
    if profile.get("metric"):
        out += _len_field(3, profile["metric"].encode())
    sample_pct = float(profile.get("sample_pct", 0.0) or 0.0)
    if sample_pct != 0.0:
        out += _tag(4, _I64) + np.float64(sample_pct).tobytes()

    windows = (
        [profile["w"]] if klass == "MatrixProfile"
        else list(profile.get("windows", []))
    )
    if windows:
        out += _len_field(5, b"".join(_varint(int(w)) for w in windows))

    data = profile.get("data") or {}
    if data.get("ts") is not None and len(np.atleast_1d(data["ts"])):
        out += _len_field(6, _matrix_bytes(data["ts"], int_type=False))
    if data.get("query") is not None and len(np.atleast_1d(data["query"])):
        out += _len_field(7, _matrix_bytes(data["query"], int_type=False))

    if klass == "MatrixProfile":
        mp = bytearray()
        for field, key, int_type in (
            (1, "mp", False), (2, "pi", True), (3, "lmp", False),
            (4, "lpi", True), (5, "rmp", False), (6, "rpi", True),
        ):
            arr = profile.get(key)
            if arr is not None and len(np.atleast_1d(arr)):
                mp += _len_field(field, _matrix_bytes(arr, int_type))
        if profile.get("ez"):
            mp += _tag(9, _VARINT) + _varint(int(profile["ez"]))
        if profile.get("join"):
            mp += _tag(10, _VARINT) + _varint(1)
        out += _len_field(8, bytes(mp))
    elif klass == "PMP":
        pmp = bytearray()
        if profile.get("pmp") is not None:
            pmp += _len_field(1, _matrix_bytes(profile["pmp"], int_type=False))
        if profile.get("pmpi") is not None:
            pmp += _len_field(2, _matrix_bytes(profile["pmpi"], int_type=True))
        out += _len_field(9, bytes(pmp))
    else:
        raise ValueError(f"unsupported profile class: {klass!r}")

    for motif in profile.get("motifs") or []:
        m = bytearray()
        for idx in motif.get("motifs", []):
            m += _len_field(1, _location_bytes(*_loc_of(idx)))
        for idx in motif.get("neighbors", []):
            m += _len_field(2, _location_bytes(*_loc_of(idx)))
        out += _len_field(10, bytes(m))
    for discord in (
        profile["discords"] if profile.get("discords") is not None else []
    ):
        out += _len_field(11, _location_bytes(*_loc_of(discord)))

    if profile.get("cmp") is not None:
        out += _len_field(12, _matrix_bytes(profile["cmp"], int_type=False))
    if profile.get("av") is not None:
        out += _len_field(13, _matrix_bytes(profile["av"], int_type=False))
    if profile.get("av_type"):
        out += _len_field(14, profile["av_type"].encode())
    return bytes(out)


# --------------------------------------------------------------- decode

def from_mpf(payload: bytes) -> dict:
    """``.mpf`` bytes → profile dict (reference protobuf_utils.from_mpf)."""
    klass = algorithm = metric = av_type = ""
    sample_pct = 0.0
    windows: list[int] = []
    ts = query = cmp_ = av = None
    mp_msg = pmp_msg = None
    motifs_raw: list[bytes] = []
    discords_raw: list[bytes] = []

    for field, wire, val in _fields(payload):
        if field == 1:
            klass = val.decode()
        elif field == 2:
            algorithm = val.decode()
        elif field == 3:
            metric = val.decode()
        elif field == 4:
            sample_pct = float(np.frombuffer(val, dtype="<f8")[0])
        elif field == 5:
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                windows.append(v)
        elif field == 6:
            ts = _parse_matrix(val, int_type=False)
        elif field == 7:
            query = _parse_matrix(val, int_type=False)
        elif field == 8:
            mp_msg = val
        elif field == 9:
            pmp_msg = val
        elif field == 10:
            motifs_raw.append(val)
        elif field == 11:
            discords_raw.append(val)
        elif field == 12:
            cmp_ = _parse_matrix(val, int_type=False)
        elif field == 13:
            av = _parse_matrix(val, int_type=False)
        elif field == 14:
            av_type = val.decode()

    out: dict = {
        "class": klass,
        "algorithm": algorithm,
        "metric": metric,
        "sample_pct": sample_pct,
        "data": {"ts": ts, "query": query},
    }

    is_one_dimensional = False
    if klass == "MatrixProfile":
        sub = {"ez": 0, "join": False}
        parts: dict = {}
        for field, wire, val in _fields(mp_msg or b""):
            if field in (1, 3, 5):
                parts[{1: "mp", 3: "lmp", 5: "rmp"}[field]] = _parse_matrix(
                    val, int_type=False
                )
            elif field in (2, 4, 6):
                parts[{2: "pi", 4: "lpi", 6: "rpi"}[field]] = _parse_matrix(
                    val, int_type=True
                )
            elif field == 9:
                sub["ez"] = val
            elif field == 10:
                sub["join"] = bool(val)
        for key in ("mp", "pi", "lmp", "lpi", "rmp", "rpi"):
            out[key] = parts.get(key)
        out["ez"] = sub["ez"]
        out["join"] = sub["join"]
        out["w"] = windows[0] if windows else 0
        is_one_dimensional = out["mp"] is not None and out["mp"].ndim == 1
    elif klass == "PMP":
        parts = {}
        for field, wire, val in _fields(pmp_msg or b""):
            if field == 1:
                parts["pmp"] = _parse_matrix(val, int_type=False)
            elif field == 2:
                parts["pmpi"] = _parse_matrix(val, int_type=True)
        out["pmp"] = parts.get("pmp")
        out["pmpi"] = parts.get("pmpi")
        out["windows"] = np.array(windows)

    if discords_raw:
        locs = [_parse_location(b) for b in discords_raw]
        out["discords"] = np.array(
            [r for r, _ in locs] if is_one_dimensional else locs, dtype=int
        )
    if motifs_raw:
        motifs = []
        for raw in motifs_raw:
            tmp = {"motifs": [], "neighbors": []}
            for field, wire, val in _fields(raw):
                row, col = _parse_location(val)
                loc = row if is_one_dimensional else (row, col)
                (tmp["motifs"] if field == 1 else tmp["neighbors"]).append(loc)
            motifs.append(tmp)
        out["motifs"] = motifs
    if cmp_ is not None:
        out["cmp"] = cmp_
    if av is not None:
        out["av"] = av
    if av_type:
        out["av_type"] = av_type
    return out


def to_mpf_file(profile: dict, file_path: str) -> None:
    path = file_path if file_path.endswith(".mpf") else file_path + ".mpf"
    with open(path, "wb") as fh:
        fh.write(to_mpf(profile))


def from_mpf_file(file_path: str) -> dict:
    with open(file_path, "rb") as fh:
        return from_mpf(fh.read())
