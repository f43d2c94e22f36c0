"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting — the per-document scoring pass of a training-data pipeline.

Everything is built-in column expressions (split / regexp / size /
array_intersect): the whole scoring pass fuses into the document scan with
zero shuffles and zero Python. The reference has no text analytics; these
are the webtext-tier additions mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tab2neo_spark.operators.numeric import det_round

# tiny deterministic stopword sets per language — heuristic lang-ID only.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "que", "es", "una"],
}

WORD_SPLIT = r"[^a-zA-Z0-9]+"


def _words(text_col: str) -> Column:
    w = F.split(F.lower(F.col(text_col)), WORD_SPLIT)
    return F.filter(w, lambda x: x != "")


def token_count(df: DataFrame, text_col: str, out_col: str = "n_tokens") -> DataFrame:
    """Whitespace/punctuation token count (the BPE-ish regex tokenizer:
    alnum runs count as tokens; everything else separates)."""
    return df.withColumn(out_col, F.size(_words(text_col)))


# GPT-2-style pre-tokenization units (contractions, space-prefixed letter /
# digit / symbol runs, whitespace runs), restricted to the RE2-safe subset
# (the canonical pattern's (?!\S) lookahead is dropped — it only changes
# how trailing-space runs split, not unit counts' order of magnitude).
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(
    df: DataFrame, text_col: str, out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """Pre-tokenizer unit count under the GPT-2-ish regex — the standard
    cheap proxy for a trained BPE tokenizer's budget (actual merges only
    ever SPLIT these units further, so this lower-bounds token counts with
    a stable ratio per language). Pure regexp over the scan; identical
    pattern semantics on RE2 engines for oracle checks."""
    return df.withColumn(
        out_col,
        F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit(BPE_PRETOKEN_PATTERN), 0)),
    )


def lang_scores(text_col: str) -> dict[str, Column]:
    """Per-language marker-hit counts over the distinct word set."""
    words = F.array_distinct(_words(text_col))
    return {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def detect_language(
    df: DataFrame, text_col: str, out_col: str = "lang_pred"
) -> DataFrame:
    """Argmax over marker-hit counts; ties and zero-hit -> 'und'.

    Deterministic tiebreak: language order as declared in LANG_MARKERS."""
    scores = lang_scores(text_col)
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed so the FIRST declared language wins ties
    for lang in reversed(list(scores)):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def quality_score(
    df: DataFrame, text_col: str, out_col: str = "quality"
) -> DataFrame:
    """Composite [0,1] quality: length band + alpha ratio + stopword ratio +
    mean word length band. Columns ``q_*`` keep the components inspectable
    (pipelines filter on components, not just the blend)."""
    n_chars = F.length(F.col(text_col))
    words = _words(text_col)
    n_words = F.size(words)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    all_stop = F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), all_stop))
    mean_wlen = F.when(n_words > 0, alpha_chars / n_words).otherwise(F.lit(0.0))
    q_len = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(
        F.when(n_chars > 0, 0.5).otherwise(0.0)
    )
    q_alpha = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    q_stop = F.least(F.lit(1.0), n_stop / F.lit(3.0))
    q_wlen = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.5)
    return (
        df.withColumn("q_len", q_len)
        .withColumn("q_alpha", det_round(q_alpha, 6))
        .withColumn("q_stop", det_round(q_stop, 6))
        .withColumn("q_wlen", q_wlen)
        .withColumn(
            out_col,
            det_round((F.col("q_len") + F.col("q_alpha") + F.col("q_stop") + F.col("q_wlen")) / 4.0, 6),
        )
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Canonical document fingerprint: md5 over the normalized token stream
    (case-folded, punctuation-collapsed) — robust to whitespace/punct noise,
    portable to any engine for verification."""
    normalized = F.array_join(_words(text_col), " ")
    return df.withColumn(out_col, F.md5(normalized))


def ngram_counts(
    df: DataFrame, text_col: str, n: int = 2, min_count: int = 1
) -> DataFrame:
    """Corpus n-gram frequency table: tokens slide into n-grams with a
    JVM ``transform(sequence(...))`` (no Python), one explode, one
    partial-aggregating groupBy — the LM-statistics pass of a
    training-data pipeline. Returns ``(ngram, n_count)``."""
    # projection boundary: the token array must be materialized before
    # the slice lambda references it — inlined, Catalyst re-evaluates the
    # whole split/filter once per position (O(len²); the decontam /
    # word_shingles trap, docs/PLANS.md §17)
    step = df.select(_words(text_col).alias("_w"))
    toks = F.col("_w")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        step.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_count"))
    )
    if min_count > 1:
        out = out.filter(F.col("n_count") >= min_count)
    return out


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, dp: int = 6
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    tf = term count within the document; idf = ln(N / df_t). One explode
    + two aggregations + a broadcast-sized idf join (vocabulary-scale) +
    a per-document window top-k. Scores are det_round'ed BEFORE ranking,
    ties break on the term, so the top-k SET is engine-independent.
    Returns ``(id_col, term, score)``.

    N rides along as a broadcast one-row aggregate (the oracle's scalar
    subquery shape) rather than an eager ``df.count()``: no driver-blocking
    action at plan-build time, and the count scans only at execution.
    ``count(*)::double / df_t`` is the same IEEE arithmetic as the old
    ``lit(float(n)) / df_t``."""
    from pyspark.sql import Window

    from tab2neo_spark.operators.numeric import det_round

    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    terms = df.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        F.col(id_col),
        "term",
        det_round(
            F.col("tf")
            * F.log(F.col("_n_docs").cast("double") / F.col("df_t")),
            dp,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
