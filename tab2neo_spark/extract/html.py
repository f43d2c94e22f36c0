"""Byte-identical html -> text extraction (the S1/S2 analog).

The reference's loader harmonizes many input formats into one tabular shape
(data_loaders/file_data_loader.py:30-121).  Our input is Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)`` (BASELINE input_hint); the loader
analog is extracting the text payload out of the raw html bytes.

The BASELINE north rule demands the extracted text be **byte-identical per
url** to the reference extractor.  We guarantee that by construction: the
"reference extractor" and the Spark-side extractor are literally the same
pure-Python function (``extract_text``) — deterministic, dependency-free,
no locale/encoding ambiguity — executed on Spark through a vectorized
Arrow ``pandas_udf`` (never per-row Python).  Tests compare sha256 of the
bytes, not equality of str objects.

Extraction semantics (deterministic, documented):

1. decode bytes as UTF-8 (``errors="replace"`` — malformed bytes map to
   U+FFFD deterministically);
2. drop ``<script>``, ``<style>``, ``<noscript>``, ``<template>`` elements
   and HTML comments entirely (case-insensitive);
3. strip all remaining tags;
4. unescape HTML entities (``html.unescape`` — the full HTML5 table);
5. normalize whitespace: every maximal run of Unicode whitespace becomes a
   single ASCII space; strip leading/trailing.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_ELEMENTS_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+", re.UNICODE)


def extract_text(html_bytes: bytes | None) -> str | None:
    """The extractor. Pure, deterministic, total.

    This single function IS the reference semantics — both the pandas
    oracle used in tests and the Spark execution path call it, so the
    byte-identical-per-url invariant holds by construction.
    """
    if html_bytes is None:
        return None
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _COMMENT_RE.sub(" ", raw)
    raw = _DROP_ELEMENTS_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    raw = _html.unescape(raw)
    return _WS_RE.sub(" ", raw).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized wrapper around :func:`extract_text`.

    Arrow ships the binary column batch-wise; Python cost is one call per
    value inside a C-looped ``Series.map`` — no per-row serde round trip.
    """
    return html.map(extract_text, na_action="ignore")


def with_extracted_text(pages: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """``pages`` with ``out_col`` = extracted text of ``html_col``.

    Narrow (per-partition) transform: no shuffle, scales linearly with
    input splits; the html binary column is only read when this is in the
    plan (Parquet column projection prunes it otherwise).
    """
    return pages.withColumn(out_col, extract_text_udf(F.col(html_col)))


# ---------------------------------------------------------------------------
# Deterministic html synthesis (for the seeded pages generator & tests)
# ---------------------------------------------------------------------------

_PAGE_TEMPLATE = (
    "<!DOCTYPE html><html lang=\"{lang}\"><head>"
    "<title>{title}</title>"
    "<style>body{{margin:0;font-family:serif}}</style>"
    "<script>var t={{a:1,b:\"&amp;ignored\"}};</script>"
    "</head><body>"
    "<!-- crawler:{url} -->"
    "<nav><a href=\"/\">home</a> &middot; <a href=\"/about\">about</a></nav>"
    "<article><h1>{title}</h1><p>{body}</p></article>"
    "<footer>&copy; example</footer>"
    "</body></html>"
)


def build_html(url: str, title: str, body: str, lang: str = "en") -> bytes:
    """Render a deterministic page around ``body`` text.

    Inverse-compatible with :func:`extract_text`: extraction of the result
    yields ``"{title} home · about {title} {body} © example"`` (head title,
    nav, h1, body, footer) — body text survives byte-identically (given
    single-space-normalized input).
    """
    return _PAGE_TEMPLATE.format(url=url, title=title, body=body, lang=lang).encode("utf-8")


def build_html_native(url, title, body, lang):
    """JVM-side twin of :func:`build_html`: the same template rendered with
    ``format_string`` + ``encode`` — zero Python per row, so page synthesis
    scales to millions of rows for throughput benchmarking.  Byte-equality
    with :func:`build_html` is asserted in tests."""
    from pyspark.sql import functions as F

    template = (
        _PAGE_TEMPLATE.replace("%", "%%")
        .replace("{lang}", "\x00")
        .replace("{title}", "\x01")
        .replace("{url}", "\x02")
        .replace("{body}", "\x03")
        .replace("{{", "{")
        .replace("}}", "}")
        .replace("\x00", "%s")
        .replace("\x01", "%s")
        .replace("\x02", "%s")
        .replace("\x03", "%s")
    )
    # placeholder order in the template: lang, title, (style/script), url,
    # title again, body
    return F.encode(F.format_string(template, lang, title, url, title, body), "utf-8")


def extracted_from_built(title: str, body: str) -> str:
    """Expected extractor output for a page built by :func:`build_html` —
    the pandas-side golden used in tests."""
    return _WS_RE.sub(" ", f"{title} home \u00b7 about {title} {body} \u00a9 example").strip()
