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


def split_by_hash(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — a pure function of the
    row id, so it is stable across runs, cluster sizes, and engines (no
    randomness, no global sort, no shuffle at all).

    The id hashes (md5 — cross-engine, unlike xxhash64) into one of 10,000
    buckets; ``weights`` (fractions summing to <= 1) carve the bucket
    range. Rows past the last boundary get the LAST named split.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))), 1, 15), 16, 10)
        .cast("long") % 10000
    )
    expr = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        cond = bucket < F.lit(int(round(upper * 10000)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def sample_to_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    order_col: str | None = None,
) -> DataFrame:
    """Keep the best documents until a token budget is hit: rows ordered
    by ``order_col`` DESC (quality score; default = ``token_col``) with
    deterministic id tiebreak; a running token sum admits every row whose
    PRECEDING total stays under ``budget`` (so the budget may be exceeded
    by at most one document — the standard greedy fill).

    One global window — at corpus scale, pre-aggregate per quality band
    and binary-search the cutoff instead; this operator is the exact
    small-N / per-shard form.
    """
    from pyspark.sql import Window

    order = order_col or token_col
    w = (
        Window.orderBy(F.desc(order), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("_prev_tokens", running)
        .filter(F.col("_prev_tokens") < budget)
        .drop("_prev_tokens")
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
