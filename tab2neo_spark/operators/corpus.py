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

from tab2neo_spark.operators.hashing import md5_rank_key
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
        F.conv(F.substring(md5_rank_key(id_col, salt), 1, 15), 16, 10)
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
    num_bands: int = 1024,
) -> DataFrame:
    """Keep the best documents until a token budget is hit: rows ordered
    by ``order_col`` DESC (quality score; default = ``token_col``) with
    deterministic id tiebreak; a row is admitted iff the token total of
    every PRECEDING row stays under ``budget`` (so the budget may be
    exceeded by at most one document — the standard greedy fill).

    Scale-safe banded form (no corpus-wide single-partition window):

    1. equal-width bands over the order key (band edges = driver-side
       constants from one min/max agg);
    2. per-band token sums — ONE partial-aggregated shuffle of <=
       ``num_bands`` tiny rows, collected to the driver;
    3. driver prefix-scan finds the boundary band: bands before it are
       admitted wholesale (pure filter, zero shuffle), bands after it are
       rejected wholesale;
    4. the exact running-sum window runs ONLY inside the boundary band
       (~n/num_bands rows), seeded with the admitted bands' token total.

    The two driver collects are metadata-scale (1 row; <= num_bands rows).
    Worst case — every row shares one order value — degenerates to the
    exact single-band window, which is then unavoidable for these
    semantics. NULL order keys sort last (Spark/SQL DESC NULLS LAST) and
    are assigned to the last band.
    """
    order = order_col or token_col

    def _exact(part: DataFrame, offset: int) -> DataFrame:
        w = (
            Window.orderBy(F.desc(order), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.lit(offset) + F.coalesce(F.sum(token_col).over(w), F.lit(0))
        return (
            part.withColumn("_prev_tokens", prev)
            .filter(F.col("_prev_tokens") < budget)
            .drop("_prev_tokens")
        )

    r = df.agg(F.min(order).alias("lo"), F.max(order).alias("hi")).collect()[0]
    if r["lo"] is None:
        # empty input OR an all-NULL order column: the exact window's
        # semantics (DESC NULLS LAST, id tiebreak) still apply — fall back
        # rather than silently dropping everything
        return _exact(df, 0).select(*df.columns)
    try:
        lo, hi = float(r["lo"]), float(r["hi"])
    except (TypeError, ValueError):
        # non-numeric order key (string tiers): equal-width banding does
        # not apply; keep the exact semantics
        return _exact(df, 0).select(*df.columns)
    if hi == lo:
        return _exact(df, 0).select(*df.columns)

    width = (hi - lo) / num_bands
    band_expr = F.when(
        F.col(order).isNull(), F.lit(num_bands - 1)
    ).otherwise(
        F.least(
            F.lit(num_bands - 1),
            F.floor((F.lit(hi) - F.col(order).cast("double")) / F.lit(width)).cast("int"),
        )
    )
    banded = df.withColumn("_band", band_expr)
    per_band = {
        row["_band"]: row["_tok"]
        for row in banded.groupBy("_band").agg(F.sum(token_col).alias("_tok")).collect()
    }
    admitted: list[int] = []
    boundary = None
    cum = 0
    for b in sorted(per_band):
        if cum + per_band[b] < budget:
            admitted.append(b)
            cum += per_band[b]
        else:
            # rows past this band have preceding totals >= cum + this
            # band's sum >= budget -> rejected wholesale
            boundary = b
            break

    full = banded.filter(F.col("_band").isin(admitted)) if admitted else None
    if boundary is None:
        out = full
    else:
        edge = _exact(banded.filter(F.col("_band") == boundary), cum)
        out = edge if full is None else full.unionByName(edge)
    return out.drop("_band").select(*df.columns)


def stratified_cap(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    cap: int,
    salt: str = "cap",
    threshold_slack: float = 0.25,
) -> DataFrame:
    """At most ``cap`` rows per stratum (source/language mixing control),
    chosen DETERMINISTICALLY: rows rank by the md5 of (salt, id) inside
    each stratum, so the sample is a pure function of row identity —
    stable across runs, engines, and cluster sizes, and unbiased w.r.t.
    any data ordering.

    Scale shape — TWO-PHASE, so a hot stratum never funnels through one
    window task (at 100 TB with strata = language, "en" is most of the
    corpus; ``row_number().over(partitionBy(lang))`` alone would put all
    of it in a single partition):

    1. a per-stratum hash-threshold pre-filter: the md5 rank key is
       uniform on [0, 2^128), so a stratum of ``n`` rows keeps its
       cap-ranked prefix under key <= (cap/n)·(1+slack)·2^128 with
       overwhelming probability (Chernoff: slack 0.25 at cap >= 1000 has
       failure odds < 1e-12). One cheap ``groupBy(strata).count()`` agg
       (metadata-scale: one row per stratum) sizes the thresholds; the
       pre-filter itself is a scan-fused column predicate — zero extra
       shuffle, and it discards ~(1 - cap/n) of every hot stratum BEFORE
       the window's exchange.
    2. the exact ``row_number`` window over the ~cap·(1+slack) survivors
       per stratum — small, bounded partitions regardless of input skew.

    Correctness is EXACT, not approximate: a deterministic guard
    (column-pruned survivor-count check, strata+id only) detects any
    stratum whose survivor set could miss part of the cap-ranked prefix
    — survivor count < min(cap, n) — and falls back to the unfiltered
    stratum for exactly those strata, so under-selection is impossible.
    The slack auto-widens for small caps (``max(slack, sqrt(56/cap))``)
    so the guard's fallback branch almost never materializes rows
    (Chernoff failure odds < 1e-12 per stratum).
    """
    rank_key = md5_rank_key(id_col, salt)
    # rank-key prefix as a uniform fraction of the key space: 15 hex
    # chars = 60 bits, plenty of resolution, fits a long exactly
    key_frac = F.conv(F.substring(rank_key, 1, 15), 16, 10).cast("long") / F.lit(
        float(16 ** 15)
    )
    slack = max(threshold_slack, (56.0 / max(cap, 1)) ** 0.5)

    strata = list(strata_cols)
    # NULL strata are first-class partitions (undetected language is a
    # real stratum at web scale): all broadcast joins below use <=>
    # (eqNullSafe) on renamed key columns — a plain `on=strata` equi-join
    # silently drops every NULL-stratum row (never matches), which the
    # pre-r5 form did. eqNullSafe is still recognized as an equi-join
    # predicate, so the broadcast hash join is preserved.
    import functools
    import operator

    def _nullsafe(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
        r = right.select(
            *[F.col(c).alias(f"_cap_k_{i}") for i, c in enumerate(strata)],
            *[c for c in right.columns if c not in strata],
        )
        cond = functools.reduce(
            operator.and_,
            [left[c].eqNullSafe(r[f"_cap_k_{i}"]) for i, c in enumerate(strata)],
        )
        return left.join(r, cond, how).drop(
            *[f"_cap_k_{i}" for i in range(len(strata))]
        )

    # pruned scan #1 (strata cols only): per-stratum row counts size the
    # tentative thresholds — keep fraction (cap/n)·(1+slack), clamped to
    # 1.0 so strata at or under the cap pass untouched
    counts = df.groupBy(*strata).agg(F.count("*").alias("_cap_n"))
    thr = F.least(
        F.lit(1.0), F.lit(float(cap)) * F.lit(1.0 + slack) / F.col("_cap_n")
    )
    tentative_thr = counts.select(*strata, "_cap_n", thr.alias("_thr0"))

    # deterministic exactness guard (pruned scan #2, strata+id only): a
    # stratum is SHORT if its survivor count under _thr0 fell below
    # min(cap, n) — the threshold cut into the cap-ranked prefix. Short
    # strata get threshold 1.0 (no filtering); everything stays lazy
    # inside the broadcast subtree, so the FINAL plan scans df once at
    # full width.
    surv = (
        _nullsafe(df, F.broadcast(tentative_thr), "inner")
        .filter(key_frac <= F.col("_thr0"))
        .groupBy(*strata)
        .agg(F.count("*").alias("_cap_s"))
    )
    eff = (
        _nullsafe(tentative_thr, F.broadcast(surv), "left")
        .select(
            *strata,
            F.when(
                F.coalesce(F.col("_cap_s"), F.lit(0))
                < F.least(F.lit(cap), F.col("_cap_n")),
                F.lit(1.0),
            )
            .otherwise(F.col("_thr0"))
            .alias("_cap_thr"),
        )
    )
    survivors = _nullsafe(df, F.broadcast(eff), "inner").filter(
        key_frac <= F.col("_cap_thr")
    )

    w = Window.partitionBy(*strata).orderBy(rank_key, F.col(id_col))
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
        .select(*df.columns)
    )


def pack_token_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document to a fixed-size training sequence: documents
    are laid out in a deterministic global order (md5 of the id — i.e. a
    reproducible shuffle) and concatenated; a document belongs to the
    sequence where it STARTS (``seq_id = floor(start_offset /
    max_tokens)``), the standard boundary-respecting packing assignment.

    The global prefix sum — inherently sequential — is computed WITHOUT a
    single-partition window: the first md5 byte buckets rows into 256
    uniform bands whose ordering equals the global order; per-band token
    sums (one tiny-row shuffle) prefix-scan on the driver into per-band
    offsets, and the exact window runs per band (``partitionBy(band)``,
    ~n/256 rows each) seeded with its band offset. Output:
    ``(row, seq_id, start_offset)``.
    """
    key = md5_rank_key(id_col, salt)
    band = F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
    banded = df.withColumn("_key", key).withColumn("_band", band)

    sums = {
        r["_band"]: r["_tok"]
        for r in banded.groupBy("_band").agg(F.sum(token_col).alias("_tok")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    if not offsets:
        return df.withColumn("seq_id", F.lit(0).cast("long")).withColumn(
            "start_offset", F.lit(0).cast("long")
        )
    # the 256 per-band offsets render as ONE parsed array literal indexed
    # by band (bands are dense 0..255) — a create_map of 256 pairs built
    # lit-by-lit cost ~512 py4j calls and a far larger codegen unit;
    # element_at returns NULL only for bands absent from the input, whose
    # rows don't exist by construction
    dense = [offsets.get(b, 0) for b in range(256)]
    offset_arr = F.expr(
        "array(" + ",".join(f"{v}L" for v in dense) + ")"
    )
    w = (
        Window.partitionBy("_band")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum(token_col).over(w), F.lit(0))
        + F.element_at(offset_arr, F.col("_band") + 1)
    ).cast("long")
    return (
        banded.withColumn("start_offset", start)
        .withColumn("seq_id", F.floor(F.col("start_offset") / max_tokens))
        .drop("_key", "_band")
    )


def domain_mixing_weights(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled source-mixing weights — the standard
    pretraining data-mixing recipe: a domain holding share ``p_d`` of
    corpus tokens is sampled with probability ``w_d ∝ p_d^alpha``
    (alpha < 1 upweights small sources, alpha = 1 is natural
    proportions). Returns ``(domain, n_docs, n_tokens, weight)`` with
    weights summing to 1.

    Scale shape: ONE partial-aggregated shuffle on the domain key; the
    two corpus-wide totals (token sum, normalizer Z) are 1-row aggregates
    of the domain-level result attached via broadcast cross-joins — no
    single-partition window over the domain table (web corpora have
    millions of domains)."""
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"), F.sum(token_col).alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    scored = per.crossJoin(F.broadcast(tot)).withColumn(
        "_pa", F.pow(F.col("n_tokens") / F.col("_tot"), F.lit(alpha))
    )
    z = scored.agg(F.sum("_pa").alias("_z"))
    return (
        scored.crossJoin(F.broadcast(z))
        .select(
            domain_col,
            "n_docs",
            "n_tokens",
            (F.col("_pa") / F.col("_z")).alias("weight"),
        )
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
