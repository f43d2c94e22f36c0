"""Benchmark decontamination: n-gram collision detection between a training
corpus and an evaluation set (engine addition — standard pretraining
hygiene; the reference has no counterpart).

The canonical recipe: every training document sharing at least one
``n``-gram (n≈8-13 words) with any benchmark document is flagged/dropped.

Scale shape (100 TB corpus vs MB-scale benchmark):

- both sides reduce to **digests** of their n-grams — the join shuffles
  8-byte (xxhash64, default) or 32-byte (md5, oracle mode) keys, never
  text. A 64-bit digest false-positive wrongly flags ~1e-18 of probes —
  harmless over-dropping for a hygiene filter (see operators/hashing.py);
- the benchmark side is tiny by definition -> its digest set broadcasts,
  so the corpus side is a map-only probe (no corpus shuffle at all when
  Catalyst picks broadcast, which the explicit ``F.broadcast`` forces);
- dropping flagged docs is a ``left_anti`` on doc_id.

Everything is column expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tab2neo_spark.operators.hashing import (
    digest,
    ngram_digest,
    ngram_positions,
    word_hashes,
)


def _ngram_digests(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, digest) — one row per DISTINCT word n-gram of each document.
    Tokenization matches textstats (lower, [^a-z0-9]+ splits).

    xxhash64 mode digests by HASH COMBINATION: each word hashes once
    into a materialized array column, and an n-gram's digest is
    xxhash64 over its n word-hash longs — no per-position string
    building (the ``array_join(slice(...))`` form allocates an
    n-word string per position, which measured 7-9x slower than the
    combine at sf0.1). The projection boundary around ``_wh`` is
    LOAD-BEARING: inlined, Catalyst re-evaluates the whole word-hash
    transform once per element_at and the plan goes O(len·n) ->
    O(len²). md5 mode keeps the string form — the DuckDB oracle must
    reproduce digests exactly."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda w: w != ""
    )
    if hash_fn == "xxhash64":
        step = df.select(F.col(id_col), word_hashes(words).alias("_wh"))
        grams = F.transform(
            ngram_positions(F.col("_wh"), n),
            lambda i: ngram_digest(F.col("_wh"), i, n),
        )
        return step.select(
            F.col(id_col), F.explode(F.array_distinct(grams)).alias("digest")
        )
    # md5 mode: the digest is over the JOINED WORD STRING (the oracle
    # recomputes it), but the word array STILL needs the projection
    # boundary — inlined, Catalyst re-evaluates the whole
    # split/lower/filter once per slice() element and the pass goes
    # O(len·n) -> O(len²) (the same trap the xxhash64 branch guards;
    # measured 33 s -> ~3 s at sf1.0). ngram_positions guards short docs
    # (sequence(1, 0) DESCENDS).
    step = df.select(F.col(id_col), words.alias("_w"))
    grams = F.transform(
        ngram_positions(F.col("_w"), n),
        lambda i: digest(F.array_join(F.slice(F.col("_w"), i, n), " "), hash_fn),
    )
    return step.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("digest")
    )


def ngram_collisions(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_id_col: str | None = None,
    n: int = 8,
    hash_fn: str = "xxhash64",
    bench_digests: DataFrame | None = None,
) -> DataFrame:
    """(corpus id, bench id, n_shared) per colliding document pair —
    the audit view (who leaked what). ``bench_digests`` (columns
    ``(bench_id, digest)`` from :func:`bench_digest_table`) skips
    recomputing the static side — pass a persisted table when probing
    repeatedly (micro-batches, multiple corpora against one benchmark)."""
    bench_id_col = bench_id_col or id_col
    # under-split corpus scans (single-row-group files) would run the whole
    # tokenize+digest pass in one task — balance BEFORE digesting (no-op on
    # real many-row-group inputs; session.ensure_min_partitions)
    from tab2neo_spark.session import ensure_min_partitions

    c = _ngram_digests(
        ensure_min_partitions(corpus), text_col, id_col, n, hash_fn
    ).withColumnRenamed(id_col, "corpus_id")
    b = (
        bench_digests
        if bench_digests is not None
        else bench_digest_table(bench, text_col, bench_id_col, n, hash_fn)
    )
    return (
        c.join(F.broadcast(b), "digest")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


def bench_digest_table(
    bench: DataFrame,
    text_col: str,
    bench_id_col: str,
    n: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The static benchmark side as a reusable ``(bench_id, digest)``
    table — compute once, ``persist()``, probe many times (the streaming
    path does exactly this per micro-batch)."""
    return _ngram_digests(bench, text_col, bench_id_col, n, hash_fn).withColumnRenamed(
        bench_id_col, "bench_id"
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_shared: int = 1,
    hash_fn: str = "xxhash64",
    bench_digests: DataFrame | None = None,
) -> DataFrame:
    """Corpus rows with FEWER than ``min_shared`` distinct n-grams shared
    with ANY single benchmark document. The contaminated-id set is
    digest-probe + groupBy — corpus text never shuffles."""
    hits = (
        ngram_collisions(corpus, bench, text_col, id_col, n=n, hash_fn=hash_fn,
                         bench_digests=bench_digests)
        .filter(F.col("n_shared") >= min_shared)
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(hits, id_col, "left_anti")
