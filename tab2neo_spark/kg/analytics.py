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
    for _ in range(iterations):
        contrib = (
            e_od.join(ranks, e_od["esrc"] == ranks["id"], "inner")
            .select(
                F.col("edst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            verts.join(summed, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", det_round(F.col("rank"), dp).alias("rank"))
