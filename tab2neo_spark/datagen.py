"""Deterministic synthetic pages (the north-rule input table).

BASELINE input_hint fixes the input shape:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.
No external data is allowed, so pages are synthesized two ways, both
seed-free-deterministic (pure functions of row identity — safe to
regenerate on resume, identical across cluster sizes):

- :func:`pages_from_documents` wraps the driver-provided deterministic
  ``documents.parquet`` (TESTDATA.md) into full html pages; the original
  ``text`` column is kept as the extraction ground truth.
- :func:`synthetic_pages` generates any number of pages from
  ``spark.range`` with JVM-only expressions (word choice via
  ``xxhash64(id, k) % |vocab|``) — used by the bench to scale beyond the
  5k documents in sf0.1.

Hot-domain skew (FIXTURES.md §1): document ``source`` becomes the url
domain; synthetic pages hash-assign domains with a zipf-ish split where
~25% of pages land on 3 domains.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tab2neo_spark.extract.html import build_html

# Same flavor of vocabulary as the driver's synthetic documents.
VOCAB = [
    "the", "a", "fast", "slow", "big", "small", "key", "order", "sort",
    "table", "scan", "merge", "part", "window", "hash", "join", "batch",
    "stream", "spark", "dup", "group", "query", "row", "data", "filter",
    "customer", "line", "value", "agg", "column", "vector",
]
LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]


@F.pandas_udf(T.BinaryType())
def _build_html_udf(url: pd.Series, title: pd.Series, body: pd.Series, lang: pd.Series) -> pd.Series:
    pdf = pd.DataFrame({"url": url, "title": title, "body": body, "lang": lang})
    return pdf.apply(lambda r: build_html(r.url, r.title, r.body, r.lang), axis=1)


def _finish_pages(df: DataFrame, native_html: bool = True) -> DataFrame:
    """Attach url/warc_ts/html to a df with (page_id, domain, title, text, lang).

    ``native_html=True`` renders the page template JVM-side
    (extract.html.build_html_native — byte-identical to the Python builder,
    asserted in tests); False exercises the Arrow-UDF path."""
    from tab2neo_spark.extract.html import build_html_native

    url = F.concat_ws(
        "", F.lit("https://"), F.col("domain"), F.lit(".example.com/doc/"), F.col("page_id")
    )
    # crawl timestamps spread deterministically over ~30 days
    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(F.xxhash64(F.col("page_id")), F.lit(30 * 86400))
    )
    df = df.withColumn("url", url).withColumn("warc_ts", warc_ts)
    if native_html:
        html = build_html_native(F.col("url"), F.col("title"), F.col("text"), F.col("lang"))
    else:
        html = _build_html_udf(F.col("url"), F.col("title"), F.col("text"), F.col("lang"))
    return df.withColumn("html", html).select("url", "warc_ts", "html", "text", "lang")


def pages_from_documents(
    spark: SparkSession, sf_dir: str, replicate: int = 1, balance: bool = False
) -> DataFrame:
    """Wrap the driver's documents table into pages; ``text`` is the ground
    truth for the byte-identical extraction check (after re-adding the
    deterministic page chrome — see extract.html.extracted_from_built).

    ``replicate`` > 1 fans each document out into distinct urls
    (deterministic copy index) so the bench can scale input without
    external data.

    ``balance=True`` repartitions an under-split documents scan up to the
    default parallelism BEFORE the html-build/extract pipeline (the
    driver's documents.parquet is one row group — a single task otherwise
    runs the whole per-page chain; session.ensure_min_partitions). Off by
    default so zero-shuffle plan tests and real many-row-group inputs
    see the unchanged narrow plan.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if balance:
        from tab2neo_spark.session import ensure_min_partitions

        docs = ensure_min_partitions(docs)
    if replicate > 1:
        copies = spark.range(replicate).withColumnRenamed("id", "copy")
        docs = docs.crossJoin(copies).withColumn(
            "doc_id", F.col("doc_id") * replicate + F.col("copy")
        )
    return _finish_pages(
        docs.select(
            F.col("doc_id").cast("string").alias("page_id"),
            F.col("source").alias("domain"),
            F.concat_ws(" ", F.lit("doc"), F.col("doc_id")).alias("title"),
            "text",
            "lang",
        )
    )


def synthetic_pages(spark: SparkSession, n: int, words_per_doc: int = 60) -> DataFrame:
    """``n`` fully synthetic pages, all-JVM generation (no Python in the
    text path; html assembly is one Arrow UDF).

    Deterministic: text = vocab[xxhash64(id, k) % |vocab|] for k in
    0..len-1; doc length varies 20..``words_per_doc`` by id hash. Domain
    skew: ids hashing into the top quartile collapse onto 3 hot domains.
    """
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    langs = F.array(*[F.lit(x) for x in LANGS])
    df = spark.range(n).withColumnRenamed("id", "page_id")
    nwords = (F.pmod(F.xxhash64("page_id", F.lit(-1)), F.lit(words_per_doc - 20)) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), nwords - 1),
        lambda k: F.element_at(vocab, (F.pmod(F.xxhash64(F.col("page_id"), k), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    dom_h = F.pmod(F.xxhash64("page_id", F.lit(7)), F.lit(100))
    domain = (
        F.when(dom_h < 10, F.lit("hot0"))
        .when(dom_h < 18, F.lit("hot1"))
        .when(dom_h < 25, F.lit("hot2"))
        .otherwise(F.concat_ws("", F.lit("src"), F.pmod(dom_h, F.lit(16))))
    )
    lang = F.element_at(langs, (F.pmod(F.xxhash64("page_id", F.lit(3)), F.lit(len(LANGS))) + 1).cast("int"))
    return _finish_pages(
        df.select(
            F.col("page_id").cast("string").alias("page_id"),
            domain.alias("domain"),
            F.concat_ws(" ", F.lit("doc"), F.col("page_id")).alias("title"),
            F.array_join(words, " ").alias("text"),
            lang.alias("lang"),
        )
    )
