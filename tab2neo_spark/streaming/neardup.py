"""Streaming near-duplicate suppression: per-row minhash signature +
in-flight signature dedup (engine addition — the streaming counterpart of
operators/dedup.py's batch LSH family).

The batch path computes signatures with explode + groupBy (a shuffle);
a stream cannot afford a stateful pre-aggregation per row, so here the
ENTIRE signature is one column expression: for each seed,
``array_min(transform(shingles, sh -> hash(sh || '#' || seed)))`` —
O(|doc| × num_hashes) work fused into the stream's map stage, zero
shuffle, no state beyond the final ``dropDuplicates`` keyed by the
signature (hash selected by ``hash_fn``: xxhash64 default / md5 oracle
mode, operators/hashing.py). Two documents with identical signatures (exact dups and
aggressive near-dups at k=1 shingles) collapse to the first arrival.

At scale the dedup state must be bounded: a plain
``dropDuplicates(["signature"])`` keeps every distinct signature FOREVER
(Spark only evicts dropDuplicates state when the event-time column is part
of the dedup subset). Pass ``within_watermark=True`` (after an upstream
``withWatermark``) to use ``dropDuplicatesWithinWatermark`` instead —
state for a signature is dropped once it ages past the watermark, trading
"dedup across all time" for "dedup within the watermark window", which is
the only semantics that survives an unbounded corpus. The signature
expression is also useful in batch: it trades the signature shuffle for
per-row CPU, the right call when documents are small and the cluster is
network-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tab2neo_spark.operators.hashing import digest


def minhash_signature_expr(
    text_col: str, num_hashes: int = 8, hash_fn: str = "xxhash64"
) -> Column:
    """One pipe-joined minhash signature per row, as a single expression.
    Tokenization (lower, [^a-z0-9]+, distinct) and hash construction
    (hash(shingle || '#' || seed)) match operators/dedup.minhash_signatures
    exactly — same ``hash_fn`` on both sides — so batch and stream agree
    on signatures."""
    shingles = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                 lambda w: w != "")
    )
    if hash_fn == "xxhash64":
        # hash each shingle ONCE, then combine with every seed — without
        # the sharing, the stream's map stage hashes the text num_hashes
        # times. The transform-over-a-1-element-array binds the word-hash
        # array to a lambda variable so it is evaluated once per row
        # (referencing it num_hashes times through a plain subexpression
        # would be re-inlined by Catalyst — same load-bearing boundary as
        # decontam._ngram_digests). Construction = batch
        # minhash_signatures' xxhash64 mode exactly.
        wh = F.transform(shingles, lambda sh: F.xxhash64(sh))
        sig = F.transform(
            F.array(wh),
            lambda a: F.concat_ws(
                "|",
                *[
                    F.array_min(
                        F.transform(a, lambda h: F.xxhash64(h, F.lit(s)))
                    ).cast("string")
                    for s in range(num_hashes)
                ],
            ),
        )
        return F.element_at(sig, 1)
    # same lambda-binding boundary as the xxhash64 branch: referencing
    # `shingles` once per seed re-inlines (and re-evaluates) the whole
    # tokenize+distinct num_hashes times per row; binding it to a lambda
    # variable evaluates it once (r6 — values unchanged, same digests)
    sig = F.transform(
        F.array(shingles),
        lambda a: F.concat_ws(
            "|",
            *[
                F.array_min(
                    F.transform(
                        a,
                        lambda sh: digest(
                            F.concat_ws("#", sh, F.lit(str(s))), hash_fn
                        ),
                    )
                ).cast("string")
                for s in range(num_hashes)
            ],
        ),
    )
    return F.element_at(sig, 1)


def stream_signature_dedup(
    stream: DataFrame,
    text_col: str,
    num_hashes: int = 8,
    within_watermark: bool = False,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """First-arrival-wins signature dedup over a stream.

    ``within_watermark=False``: global dedup, state grows with distinct
    signatures — fine for bounded replays, NOT for unbounded streams.
    ``within_watermark=True``: requires an upstream ``withWatermark``;
    state is evicted as signatures age out (see module docstring)."""
    sig = stream.withColumn(
        "signature", minhash_signature_expr(text_col, num_hashes, hash_fn)
    )
    if within_watermark:
        return sig.dropDuplicatesWithinWatermark(["signature"])
    return sig.dropDuplicates(["signature"])


def stream_decontaminate(
    stream: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    sink,
    checkpoint_dir: str,
    n: int = 8,
    min_shared: int = 1,
    hash_fn: str = "xxhash64",
    trigger_available_now: bool = True,
):
    """Streaming benchmark decontamination: every micro-batch runs the
    BATCH ``operators/decontam.decontaminate`` against the static
    benchmark side and hands the surviving rows to ``sink(df, epoch_id)``.

    foreachBatch is the right composition here — the per-document
    contamination decision needs a digest-level join THEN a per-doc
    re-aggregation, which as a pure streaming plan would be a
    stream-stream self-join; per micro-batch it is the same broadcast
    digest probe the batch path uses (zero corpus shuffle, plan-tested
    there). The checkpoint gives at-least-once delivery; pair with
    idempotent sinks (GraphStore keyed writes) for exactly-once effect.

    The persisted benchmark digest table is exposed as
    ``query.bench_digests`` on the returned handle (ADVICE r4: the caller
    must be able to release executor storage in a long-lived session) —
    ``availableNow`` callers should ``query.awaitTermination()`` then
    ``query.bench_digests.unpersist()``; :func:`release` does both.
    """
    from tab2neo_spark.operators.decontam import bench_digest_table, decontaminate

    # the static side is computed and persisted ONCE — a continuous
    # stream must not re-tokenize/re-hash the benchmark every micro-batch
    bench_dig = bench_digest_table(bench, text_col, id_col, n, hash_fn).persist()
    bench_dig.count()

    def _batch(df: DataFrame, epoch_id: int) -> None:
        sink(
            decontaminate(
                df, bench, text_col, id_col, n=n,
                min_shared=min_shared, hash_fn=hash_fn,
                bench_digests=bench_dig,
            ),
            epoch_id,
        )

    writer = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.bench_digests = bench_dig
    return query


def release(query, stop: bool = False, timeout: float | None = None) -> None:
    """Release a streaming query's cached static-side tables
    (``bench_digests``): await termination, then unpersist.

    A CONTINUOUS query (``trigger_available_now=False``) never terminates
    on its own — pass ``stop=True`` to stop it first, or a ``timeout``
    (seconds) to bound the wait; a bare ``release(q)`` on a continuous
    query would block forever. The unpersist runs even when a timed wait
    expires (the cache is safe to drop at any point — it only costs
    recompute)."""
    if stop:
        query.stop()
    if timeout is not None:
        query.awaitTermination(timeout)
    else:
        query.awaitTermination()
    dig = getattr(query, "bench_digests", None)
    if dig is not None:
        dig.unpersist()
