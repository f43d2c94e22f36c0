"""End-to-end training-corpus selection: the composition every pretraining
pipeline runs over raw documents — language filter, quality threshold,
exact dedup, token accounting — in ONE pass shape.

Composes the per-document operators (textstats: all zero-shuffle column
expressions that fuse into the scan) with a single shuffle on the 32-byte
content fingerprint for the keep-one-per-duplicate-group step. At corpus
scale the plan is: scan -> fused scoring -> filter (pushdown-friendly:
the lang/quality predicates prune before the shuffle) -> one exchange on
the digest -> window-min -> output. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tab2neo_spark.operators.textstats import (
    detect_language,
    fingerprint,
    quality_score,
    token_count,
)


def select_training_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang: str = "en",
    min_quality: float = 0.7,
) -> DataFrame:
    """Select documents for a training corpus.

    Keeps documents that (1) are predicted to be in ``lang``, (2) score at
    least ``min_quality``, and (3) are the minimum-id representative of
    their exact-duplicate group (fingerprint = md5 of the normalized token
    stream). Returns ``(id_col, lang_pred, quality, n_tokens)``.
    """
    scored = fingerprint(
        quality_score(detect_language(token_count(df, text_col), text_col), text_col),
        text_col,
    )
    filtered = scored.filter(
        (F.col("lang_pred") == lang) & (F.col("quality") >= min_quality)
    )
    # exact dedup: keep the min id per fingerprint — one shuffle on the
    # digest (never on document bodies)
    w = Window.partitionBy("fingerprint")
    return (
        filtered.withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .select(id_col, "lang_pred", "quality", "n_tokens")
    )
