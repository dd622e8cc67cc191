"""WARC source tests: record roundtrip, multi-member gzip, HTTP body
stripping, skip of non-response records, and the Ray Data read path."""
import gzip
import os

import numpy as np
import pytest

from matrixprofile_ray.sources.warc import (
    parse_warc,
    read_warc,
    warc_batch_to_table,
    write_warc,
)

RECS = [
    ("http://example.com/a", 1_490_205_251_000_000,
     b"<html><body>hello world</body></html>"),
    ("http://example.org/b", 1_490_205_252_000_000,
     "<html><body>unicode éè</body></html>"),
    ("http://x.net/c", 1_490_205_253_000_000,
     b"<html><body>third</body></html>"),
]


def _html_bytes(h):
    return h.encode("utf-8") if isinstance(h, str) else h


class TestWarcRoundtrip:
    @pytest.mark.parametrize("gz", [True, False])
    def test_roundtrip(self, gz):
        out = list(parse_warc(write_warc(RECS, gzip_per_record=gz)))
        assert len(out) == len(RECS)
        for (u, t, h), (u2, t2, h2) in zip(RECS, out):
            assert (u, t, _html_bytes(h)) == (u2, t2, h2)

    def test_multi_member_gzip_stdlib_compat(self):
        # one gzip member per record (Common Crawl layout): stdlib
        # gzip reads the concatenation, and each member is standalone
        payload = write_warc(RECS, gzip_per_record=True)
        raw = gzip.decompress(payload)
        assert raw.count(b"WARC/1.0") == 3
        # single-record slice decompresses on its own
        first_len = len(write_warc(RECS[:1], gzip_per_record=True))
        assert list(parse_warc(payload[:first_len]))[0][0] == RECS[0][0]

    def test_non_response_records_skipped(self):
        plain = write_warc(RECS, gzip_per_record=False)
        info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"WARC-Date: 2017-03-22T17:54:11Z\r\n"
                b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n")
        out = list(parse_warc(info + plain))
        assert len(out) == 3

    def test_http_headers_stripped(self):
        (_, _, html), = list(parse_warc(write_warc(RECS[:1])))
        assert html == _html_bytes(RECS[0][2])
        assert b"HTTP/1.1" not in html

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            list(parse_warc(b"NOTAWARC" + b"\x00" * 32))

    def test_truncated_gzip_raises(self):
        payload = write_warc(RECS, gzip_per_record=True)
        with pytest.raises(ValueError, match="truncated gzip"):
            list(parse_warc(payload[: len(payload) // 2]))

    def test_batch_to_table_schema(self):
        t = warc_batch_to_table(
            [write_warc(RECS[:2]), write_warc(RECS[2:])])
        assert t.num_rows == 3
        assert t.column_names == ["url", "warc_ts", "html"]
        assert t["warc_ts"].type == "timestamp[us]"


class TestWarcRayPath:
    def test_read_warc_dataset(self, ray_session, tmp_path):
        for i in range(3):
            shard = [(f"http://d{j % 4}.com/{i * 10 + j}",
                      1_490_000_000_000_000 + (i * 10 + j) * 1_000_000,
                      f"<html><body>doc {i * 10 + j}</body></html>")
                     for j in range(10)]
            with open(tmp_path / f"part-{i}.warc.gz", "wb") as f:
                f.write(write_warc(shard))
        ds = read_warc(sorted(str(p) for p in tmp_path.glob("*.warc.gz")))
        df = ds.to_pandas()
        assert len(df) == 30
        assert set(df.columns) == {"url", "warc_ts", "html"}
        # timestamps arrive as us-resolution datetimes in doc order
        got = sorted(df["url"].str.rsplit("/", n=1).str[1].astype(int))
        assert got == list(range(10)) + list(range(10, 20)) + list(
            range(20, 30))

    def test_extraction_byte_identity(self, ray_session, tmp_path):
        from matrixprofile_ray.stages.extract import extract_text

        texts = [f"doc body {i} with words" for i in range(20)]
        shard = [(f"http://d.com/{i}",
                  1_490_000_000_000_000 + i * 1_000_000,
                  f"<html><body>{t}</body></html>")
                 for i, t in enumerate(texts)]
        p = tmp_path / "x.warc.gz"
        with open(p, "wb") as f:
            f.write(write_warc(shard))
        ds = read_warc([str(p)]).map_batches(
            extract_text, batch_format="pyarrow")
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        order = np.argsort([f"http://d.com/{i}" for i in range(20)])
        for row_text, want in zip(df["text"],
                                  [texts[i] for i in order]):
            assert row_text == want
