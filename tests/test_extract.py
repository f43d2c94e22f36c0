"""Extractor tests: the byte-identical-per-url invariant (BASELINE input_hint).

The invariant is checked on BYTES (sha256 of utf-8), not str equality, and
against the same pure function run outside Spark — the 'reference
extractor' of SURVEY §5."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tab2neo_spark.datagen import pages_from_documents, synthetic_pages
from tab2neo_spark.extract.html import (
    build_html,
    extract_text,
    extract_text_udf,
    extracted_from_built,
)


def sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def test_extract_text_pure():
    html = build_html("u", "doc 1", "spark join merge", "en")
    assert extract_text(html) == extracted_from_built("doc 1", "spark join merge")
    # script/style/comments dropped, entities unescaped, whitespace collapsed
    assert extract_text(b"<p>a&amp;b   c\n\td</p><script>x<1</script>") == "a&b c d"
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    # malformed utf-8 is deterministic (replacement char)
    assert extract_text(b"<p>\xff</p>") == "�"


def test_extract_byte_identical_vs_reference(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir).limit(200)
    got = (
        pages.select("url", "html", extract_text_udf(F.col("html")).alias("extracted"))
        .toPandas()
    )
    assert len(got) > 0
    for _, r in got.iterrows():
        ref = extract_text(r["html"])  # reference extractor, driver-side
        assert sha(r["extracted"]) == sha(ref), r["url"]


def test_pages_deterministic(spark, sf_dir):
    a = pages_from_documents(spark, sf_dir).orderBy("url").limit(5).toPandas()
    b = pages_from_documents(spark, sf_dir).orderBy("url").limit(5).toPandas()
    assert list(a["url"]) == list(b["url"])
    assert list(a["warc_ts"]) == list(b["warc_ts"])
    assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]


def test_synthetic_pages_schema_and_determinism(spark):
    p1 = synthetic_pages(spark, 50).orderBy("url").toPandas()
    p2 = synthetic_pages(spark, 50).orderBy("url").toPandas()
    assert p1.shape[0] == 50
    assert set(p1.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert list(p1["text"]) == list(p2["text"])
    # extraction round-trips the synthetic body
    row = p1.iloc[0]
    assert row["text"] in extract_text(bytes(row["html"]))


def test_native_html_builder_byte_identical(spark):
    """build_html_native (JVM format_string) must render byte-identical
    pages to the Python builder — the bench generates with the JVM path
    while extraction tests trust the Python one."""
    from pyspark.sql import functions as F

    from tab2neo_spark.extract.html import build_html, build_html_native

    rows = [
        ("https://a/1", "doc 1", "spark join merge", "en"),
        ("https://a/2", "t % weird {x}", "body with % and {braces}", "de"),
        ("https://a/3", "", "", "fr"),
    ]
    df = spark.createDataFrame(rows, "url string, title string, body string, lang string")
    got = df.select(
        "url", "title", "body", "lang",
        build_html_native(F.col("url"), F.col("title"), F.col("body"), F.col("lang")).alias("h"),
    ).collect()
    for r in got:
        assert bytes(r["h"]) == build_html(r["url"], r["title"], r["body"], r["lang"]), r["url"]
