"""Graph analytics over the edge tables (engine addition; the reference
has no graph algorithms beyond traversal).

PageRank: FIXED-iteration power method as an iterative DataFrame loop —
one join + one partial-aggregating groupBy per round, ``localCheckpoint``
truncating the lineage each round (the same iterative-loop discipline as
kg/canon.py's connected components). Per round the shuffle keys are node
ids, never payloads; skewed in-degree (head entities) is handled by
Spark's partial aggregation of ``sum`` — an algebraic aggregate — plus
AQE skew splitting.

Determinism contract: a fixed iteration count makes the result an exact
polynomial of the edge list, identical on any engine up to float
summation order; ``det_round`` at the end gives cross-engine equality.
No dangling-mass redistribution (rank leaks at sinks) — both sides of
the oracle compute the identical recurrence, and relative ordering (the
use case: entity importance) is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    dp: int = 6,
) -> DataFrame:
    """``(id, rank)`` after ``iterations`` rounds of
    ``rank = (1-d)/n + d * sum(in-neighbor rank / out-degree)``."""
    from tab2neo_spark.operators.numeric import det_round

    e = (
        edges.select(F.col(src).alias("esrc"), F.col(dst).alias("edst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("esrc").alias("id"))
        .union(e.select(F.col("edst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    # out-degree is loop-invariant: join it onto the edge list ONCE and
    # checkpoint, so each round pays one join + one partial-agg groupBy —
    # not a recomputed degree aggregation + second join per iteration
    e_od = (
        e.join(
            e.groupBy(F.col("esrc").alias("osrc")).agg(F.count("*").alias("outdeg")),
            F.col("esrc") == F.col("osrc"),
        )
        .select("esrc", "edst", "outdeg")
        .localCheckpoint(eager=True)
    )
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for it in range(iterations):
        contrib = (
            e_od.join(ranks, e_od["esrc"] == ranks["id"], "inner")
            .select(
                F.col("edst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = verts.join(summed, "id", "left").select(
            "id",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        # lineage cut every SECOND round: each eager localCheckpoint is a
        # blocking job, and at bench scale those fixed job costs dominate
        # the loop; a two-round-deep plan (two joins + one agg per round)
        # is still trivially plannable. Values are checkpoint-invariant —
        # the recurrence is the same polynomial either way.
        if it % 2 == 1 and it != iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", det_round(F.col("rank"), dp).alias("rank"))


def co_mention_edges(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    mention_pred: str = "MENTIONS",
) -> DataFrame:
    """Project the bipartite page->entity MENTIONS graph into the
    entity-entity CO-MENTION graph: ``(a, b, weight)`` with ``a < b``,
    weight = number of pages mentioning both (the standard KG
    co-occurrence projection feeding similarity/community analytics).

    Scale shape: NO self-join of the mention table (that would shuffle it
    twice and square the hot-page skew). Each page's entity set collects
    into one sorted array (bounded by the per-page mention count — dozens
    at web scale), the i<j pairs generate INSIDE the array as a fused
    flatten(transform x transform) expression, and the only shuffle
    carries the exploded (a, b) pairs into a partial-aggregated count.
    A page with k entities contributes k*(k-1)/2 rows — bounded by the
    extractor's per-page cap, not by corpus size."""
    ments = (
        triples.filter(F.col(pred) == F.lit(mention_pred))
        .select(F.col(subj).alias("_pg"), F.col(obj).alias("_ent"))
        .distinct()
    )
    per_page = (
        ments.groupBy("_pg")
        .agg(F.array_sort(F.collect_set("_ent")).alias("_ents"))
        .filter(F.size("_ents") >= 2)  # also guards sequence(1, 0) DESCENT
    )
    n = F.size("_ents")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("_ents"), i + 1, n),
                lambda b: F.struct(
                    F.element_at(F.col("_ents"), i).alias("a"), b.alias("b")
                ),
            ),
        )
    )
    return (
        per_page.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("weight"))
    )


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts ``(id, n_triangles)`` over
    an undirected edge list (canonicalized to ``a < b`` internally, so
    each triangle x<y<z enumerates exactly once via the two-join chain).

    Scale note: triangle enumeration is inherently O(m^1.5)-ish; at
    corpus scale run it on a PRUNED projection (e.g. co-mention weight >=
    k) — the shuffles carry only (node, node) pairs, and AQE broadcasts
    the edge list outright when it fits."""
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
