"""Similarity search over embedding columns (``array<float>``).

Two tiers, both pure DataFrame expressions (``F.zip_with``/``F.aggregate``
compute dot products JVM-side; no Python in the hot path):

- brute-force cosine top-k: the exact baseline; one narrow pass + a top-k.
- sign-LSH bucketed ANN: candidates restricted to vectors agreeing with the
  query on the signs of the first ``b`` dimensions (a deterministic
  hyperplane family = the coordinate axes). Bucketing is a plain equality
  predicate, so Catalyst pushes it into the scan — at 100 TB the index is
  "partition the vector table by sign-prefix"; queries read 1/2^b of data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    dp: int = 6,
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    Similarity is det_round-ed to ``dp`` BEFORE ranking and ties broken by
    id, so the top-k set itself is engine-independent (raw-double ordering
    would make the k-boundary depend on last-ulp noise). orderBy+limit
    compiles to TakeOrderedAndProject — per-partition top-k then a k-row
    merge, not a global sort."""
    from tab2neo_spark.operators.numeric import det_round, sql_double

    # one F.expr call instead of one py4j call per literal (and `q` is
    # referenced twice in cosine() — dot + norm — so the per-call saving
    # doubles); identical doubles via exact CAST literals
    q = F.expr("array(" + ",".join(sql_double(float(x)) for x in query) + ")")
    sim = det_round(cosine(F.col(vec_col).cast("array<double>"), q), dp)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def sign_bucket(vec: Column, b: int) -> Column:
    """Sign-prefix bucket id: bit i = (vec[i] >= 0)."""
    bucket = F.lit(0)
    for i in range(b):
        bucket = bucket + F.when(F.element_at(vec, i + 1) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket


def cosine_topk_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    bucket_bits: int = 4,
    dp: int = 6,
) -> DataFrame:
    """ANN: exact cosine ranking restricted to the query's sign bucket.

    Approximate by construction (recall < 1 near hyperplanes); the scale
    path — the bucket predicate prunes ~(1 - 2^-b) of the corpus before
    any arithmetic. Returns the same schema as :func:`cosine_topk`."""
    qbucket = 0
    for i in range(bucket_bits):
        if float(query[i]) >= 0:
            qbucket += 2 ** i
    filtered = df.filter(sign_bucket(F.col(vec_col), bucket_bits) == F.lit(qbucket))
    return cosine_topk(filtered, vec_col, id_col, query, k, dp)


def ivf_centroids(df: DataFrame, vec_col: str, cell_col: str) -> DataFrame:
    """Per-cell centroid = element-wise mean of member vectors.

    The inverted-file (IVF) coarse quantizer: any cell assignment works
    (a clustering, a label column, a hash); centroids are one aggregation.
    Mean per dimension via posexplode + groupBy — partial aggregation
    keeps the shuffle at |cells| x dim rows."""
    exploded = df.select(
        F.col(cell_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    per_dim = exploded.groupBy(cell_col, "dim").agg(F.avg("v").alias("m"))
    return (
        per_dim.groupBy(cell_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def cosine_topk_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    dp: int = 6,
) -> DataFrame:
    """IVF ANN: rank cells by centroid-query cosine, exact-search the top
    ``nprobe`` cells only.

    At corpus scale the cell column is a partition key, so probing
    ``nprobe`` cells reads ``nprobe/|cells|`` of the data via partition
    pruning — the IVF index IS the table layout. Recall < 1 when the true
    neighbor lives in an unprobed cell (the standard IVF trade-off)."""
    cents = ivf_centroids(df, vec_col, cell_col).collect()
    import math

    qv = [float(x) for x in query]
    qn = math.sqrt(sum(x * x for x in qv)) or 1.0

    def cent_sim(c):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(c, qv)) / (cn * qn)

    ranked = sorted(
        ((cent_sim(r["centroid"]), r[cell_col]) for r in cents),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cells = [cell for _, cell in ranked[:nprobe]]
    return cosine_topk(
        df.filter(F.col(cell_col).isin(probe_cells)), vec_col, id_col, query, k, dp
    )


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    path: str,
) -> None:
    """Materialize the IVF index AS the table layout: vectors written
    cell-partitioned (so a probe is a partition-pruned read) plus a tiny
    centroid sidecar. This is the 100 TB shape of
    :func:`cosine_topk_ivf` — the 'index' is nothing but directory
    structure + a |cells|-row table."""
    df.select(id_col, vec_col, cell_col).write.mode("overwrite").partitionBy(
        cell_col
    ).parquet(f"{path}/vectors")
    ivf_centroids(df, vec_col, cell_col).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )


def cosine_topk_ivf_indexed(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    cell_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    dp: int = 6,
) -> DataFrame:
    """Query a materialized IVF index: rank the sidecar centroids on the
    driver (|cells| rows), then exact-search ONLY the top ``nprobe``
    cells — the ``isin`` predicate on the partition column prunes to
    nprobe directories at the source (verify with
    ``PartitionFilters`` in the scan)."""
    import math

    cents = spark.read.parquet(f"{path}/centroids").collect()
    qv = [float(x) for x in query]
    qn = math.sqrt(sum(x * x for x in qv)) or 1.0

    def cent_sim(c):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(c, qv)) / (cn * qn)

    ranked = sorted(
        ((cent_sim(r["centroid"]), r[cell_col]) for r in cents),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cells = [cell for _, cell in ranked[:nprobe]]
    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col(cell_col).isin(probe_cells)
    )
    return cosine_topk(vectors, vec_col, id_col, query, k, dp)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_bits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, banded sign-LSH blocking
    (the minhash-LSH shape, applied to hyperplane signs).

    All-pairs cosine is O(n^2). A single sign bucket of b bits either
    under-blocks (small b: ~n^2/2^b in-bucket pairs — a scale-killer) or
    under-recalls (large b: one flipped sign loses the pair). Banding fixes
    both: the first ``num_bits`` sign bits split into ``bands`` bands of
    r = num_bits/bands bits; two vectors are candidates iff they agree on
    EVERY bit of at least ONE band. Near-identical vectors disagree on few
    signs, so some band stays clean (multiprobe recall), while each band
    has 2^r buckets (strong blocking). Candidates verify with exact cosine.

    At corpus scale: bucket join shuffles (id, vec, band, sig) — bump
    num_bits/bands so 2^(num_bits/bands) ~ corpus_size/10^4 to keep bucket
    self-joins bounded."""
    if num_bits % bands:
        raise ValueError("num_bits must divide evenly into bands")
    r = num_bits // bands
    bits = F.transform(
        F.slice(F.col(vec_col), 1, num_bits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    # dim < num_bits would make F.slice return short arrays: trailing bands
    # get an empty-string signature shared by EVERY vector, silently turning
    # the banded blocking into a full O(n^2) self-join. Per-row lazy guard
    # (assert_true evaluates during execution, covers EVERY row, adds no
    # eager job and stays streaming-compatible).
    guard = F.assert_true(
        F.size(F.col(vec_col)) >= num_bits,
        F.lit(f"embedding dimension < num_bits={num_bits}; pass num_bits "
              "<= the vector dimension (banded LSH would degenerate to an "
              "all-pairs join)"),
    )
    with_bits = df.select(
        F.col(id_col), F.col(vec_col), F.when(guard.isNull(), bits).alias("__bits")
    )
    banded = with_bits.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.array_join(F.slice(F.col("__bits"), i * r + 1, r), "").alias("sig"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("__bb"),
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__bb.band").alias("__band"),
        F.col("__bb.sig").alias("__sig"),
    )
    a = banded.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "__band", "__sig"
    )
    b = banded.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "__band", "__sig"
    )
    from tab2neo_spark.operators.numeric import det_round

    sim = det_round(
        cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 6
    )
    return (
        a.join(b, ["__band", "__sig"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])  # a pair may collide in several bands
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )
