"""WARC (Web ARChive, ISO 28500) source: the native file format of
Common-Crawl-style corpora.

The engine's input table (url, warc_ts, html, text, lang — see
BASELINE.json input_hint) is what a crawl looks like AFTER ingestion;
this module owns the ingestion itself so a user can point the engine at
raw ``*.warc.gz`` segments:

- ``write_warc(records, gzip_per_record=True)`` emits spec-valid
  WARC/1.0 ``response`` records, each its own gzip member when
  ``gzip_per_record`` — the Common Crawl convention that makes records
  independently decompressible.
- ``parse_warc(payload)`` walks single- or multi-member gzip (or plain)
  WARC bytes and yields ``(url, warc_ts_us, html)`` per response record,
  skipping warcinfo/request/metadata records like a crawl consumer
  does.
- ``read_warc(paths)`` is the Ray Data path: one read task per WARC
  file (Common Crawl segments are ~1 GB, a natural block size) →
  ``flat_map``-shaped batch parse → Arrow table in the engine's input
  schema. Downstream is the normal pipeline: ``extract_text`` →
  lang-id → rollups.

Pure stdlib (``zlib``) + pyarrow; the WARC/1.0 layout and the
HTTP-response embedding follow the public ISO 28500 / IIPC spec only.
"""
from __future__ import annotations

import zlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"

SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
])


def _fmt_ts(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_ts(s: str) -> int:
    dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def write_warc(records, gzip_per_record: bool = True) -> bytes:
    """Serialize ``(url, warc_ts_us, html_bytes)`` triples as WARC/1.0.

    Each record is a ``response`` with an embedded HTTP/1.1 200 reply
    (Common Crawl layout). With ``gzip_per_record`` every record is its
    own gzip member; otherwise the output is uncompressed WARC.
    """
    out = bytearray()
    for i, (url, ts_us, html) in enumerate(records):
        if isinstance(html, str):
            html = html.encode("utf-8")
        http = (b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html" + _CRLF
                + b"Content-Length: " + str(len(html)).encode() + _CRLF
                + _CRLF + html)
        hdr = (b"WARC/1.0" + _CRLF
               + b"WARC-Type: response" + _CRLF
               + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
               + b"WARC-Date: " + _fmt_ts(int(ts_us)).encode() + _CRLF
               + b"WARC-Record-ID: <urn:uuid:%08x-0000-0000-0000-%012x>"
               % (zlib.crc32(url.encode()), i) + _CRLF
               + b"Content-Type: application/http; msgtype=response"
               + _CRLF
               + b"Content-Length: " + str(len(http)).encode() + _CRLF
               + _CRLF)
        rec = hdr + http + _CRLF + _CRLF
        if gzip_per_record:
            comp = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
            out += comp.compress(rec) + comp.flush()
        else:
            out += rec
    return bytes(out)


def _gunzip_all(payload: bytes) -> bytes:
    """Decompress every gzip member of a multi-member stream."""
    out = bytearray()
    rest = payload
    while rest:
        d = zlib.decompressobj(16 + 15)
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    return bytes(out)


def parse_warc(payload: bytes):
    """Yield ``(url, warc_ts_us, html_bytes)`` per response record.

    Accepts gzip (single- or multi-member, the Common Crawl layout) or
    uncompressed WARC/1.0; non-response records (warcinfo, request,
    metadata) are skipped.
    """
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_all(payload)
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines
        while payload[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if payload[pos:pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC record header at offset {pos}")
        hdr_end = payload.index(_CRLF + _CRLF, pos)
        headers = {}
        for line in payload[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers[b"content-length"])
        body = payload[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers[b"warc-target-uri"].decode("utf-8")
        ts_us = _parse_ts(headers[b"warc-date"].decode("ascii"))
        # strip the embedded HTTP response headers
        sep = body.find(_CRLF + _CRLF)
        html = body[sep + 4:] if sep >= 0 else body
        yield url, ts_us, html


def warc_batch_to_table(payloads) -> pa.Table:
    """Parse a batch of WARC payloads into one Arrow table (flat_map
    shape: N files → M records)."""
    if hasattr(payloads, "to_pylist"):  # Arrow (Chunked)Array
        payloads = payloads.to_pylist()
    urls, tss, htmls = [], [], []
    for payload in payloads:
        for url, ts_us, html in parse_warc(payload):
            urls.append(url)
            tss.append(ts_us)
            htmls.append(html)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(
            np.asarray(tss, dtype=np.int64), pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
    })


def read_warc(paths, *, concurrency: int | None = None):
    """``*.warc`` / ``*.warc.gz`` files → ``ray.data.Dataset`` in the
    engine input schema (url, warc_ts, html).

    One read task per file (a Common Crawl segment is ~1 GB — already
    the right block granularity for a 256-node cluster); record parsing
    runs inside ``map_batches`` on the worker that read the bytes, so
    raw archives never concentrate on the driver.
    """
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    return ds.map_batches(
        lambda b: warc_batch_to_table(b["bytes"]),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}),
    )
