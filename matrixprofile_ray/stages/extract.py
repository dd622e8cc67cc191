"""Stateless html→text extraction + url→domain projection.

Fully vectorized over Arrow batches (RE2 via pyarrow.compute): no Python
row loop. The extraction contract (north rule / input_hint) is
*byte-identical text per url* versus the corpus' own ``text`` column — the
``verify_extraction`` helper asserts it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_text", "add_domain", "verify_extraction"]

_BODY_PATTERN = r"(?s)<body>(?P<body>.*)</body>"
_TAG_PATTERN = r"<[^>]*>"
_DOMAIN_PATTERN = r"^[a-z]+://(?P<domain>[^/]+)"


def extract_text(batch: pa.Table) -> pa.Table:
    """Replace/add the ``text`` column extracted from ``html``.

    Body contents with markup tags stripped and surrounding whitespace
    trimmed; deterministic, order-independent.
    """
    html_str = pc.cast(batch["html"], pa.string())
    body = pc.struct_field(pc.extract_regex(html_str, _BODY_PATTERN), "body")
    text = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(body, _TAG_PATTERN, "")
    )
    out = batch
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    return out.append_column("text", text)


def add_domain(batch: pa.Table) -> pa.Table:
    """Project the registrable host out of the url (no join needed)."""
    domain = pc.struct_field(
        pc.extract_regex(batch["url"], _DOMAIN_PATTERN), "domain"
    )
    return batch.append_column("domain", domain)


def verify_extraction(batch: pa.Table) -> pa.Table:
    """Count rows whose extracted text mismatches the oracle column."""
    expected = batch["text"]
    actual = extract_text(batch)["text"]
    bad = pc.sum(pc.cast(pc.not_equal(expected, actual), pa.int64())).as_py() or 0
    return pa.Table.from_pydict(
        {"rows": [batch.num_rows], "mismatched": [bad]}
    )
