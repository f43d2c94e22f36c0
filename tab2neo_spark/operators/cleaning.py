"""Corpus cleaning: PII redaction and Gopher-style repetition rules
(engine additions — standard webtext-pipeline stages; no reference
counterpart).

Both are pure column expressions (regexp / array functions) that fuse into
the document scan — zero shuffle, zero Python. Regex patterns are kept to
the RE2-compatible subset (char classes, bounded repetition, no
backreferences/lookaround) so DuckDB oracles evaluate them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns shared verbatim with the SQL oracles. Phone separators
# deliberately EXCLUDE '.': dotted phone numbers are rare while dotted
# quads are everywhere — '.' in the class made 192.168.100.123-style IPs
# match as phones (double-counted and redacted under the wrong class).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_redact(
    df: DataFrame,
    text_col: str,
    out_col: str = "redacted",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace each PII class with ``<CLASS>`` and count matches per class
    (``n_<class>`` columns). Order of application = dict order; counts are
    measured on the ORIGINAL text so later redactions can't hide earlier
    classes."""
    patterns = patterns or PII_PATTERNS
    out = df
    red = F.col(text_col)
    for name, pat in patterns.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return out.withColumn(out_col, red)


def repetition_stats(df: DataFrame, text_col: str, dp: int = 6) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_line_frac``: 1 - distinct/total over non-empty LINES;
    - ``dup_line_char_frac``: fraction of line characters belonging to
      lines that occur more than once (chars of (occurrences-1) copies);
    - ``top_word_frac``: occurrences of the most frequent WORD / total
      words.

    All array/map expressions; det-rounded for cross-engine equality."""
    from tab2neo_spark.operators.numeric import det_round

    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda w: w != ""
    )
    n_lines = F.size(lines)
    n_words = F.size(words)

    dup_line_frac = F.when(n_lines > 0,
                           1.0 - F.size(F.array_distinct(lines)) / n_lines
                           ).otherwise(F.lit(0.0))
    # chars in duplicate copies: sum(len(line)) - sum over distinct(len)
    total_chars = F.aggregate(lines, F.lit(0), lambda a, s: a + F.length(s))
    distinct_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, s: a + F.length(s)
    )
    dup_char_frac = F.when(total_chars > 0,
                           (total_chars - distinct_chars) / total_chars
                           ).otherwise(F.lit(0.0))
    # top word frequency via the sorted word array: longest equal run
    top_count = F.aggregate(
        F.array_sort(words),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_word_frac = F.when(n_words > 0, top_count / n_words).otherwise(F.lit(0.0))

    return df.withColumns({
        "dup_line_frac": det_round(dup_line_frac, dp),
        "dup_line_char_frac": det_round(dup_char_frac, dp),
        "top_word_frac": det_round(top_word_frac, dp),
    })


def gopher_filter(
    df: DataFrame,
    text_col: str,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_word_frac: float = 0.20,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Keep documents passing the repetition + length rules (the
    Gopher/MassiveText quality-filter shape). Pure filter over the
    repetition_stats columns — pushdown-friendly."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda w: w != ""
    )
    out = repetition_stats(df, text_col)
    return out.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top_word_frac") <= max_top_word_frac)
        & (F.size(words) >= min_words)
        & (F.size(words) <= max_words)
    )
