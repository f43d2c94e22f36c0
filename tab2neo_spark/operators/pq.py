"""Product quantization (PQ) for embedding columns — the compressed-
domain scale path for similarity search (engine addition; complements
operators/similarity.py's exact top-k and sign-LSH/IVF ANN).

At 100 TB an ``array<float>`` embedding column dominates storage and
scan cost; PQ splits each d-dim vector into ``m`` subvectors and stores
only the index of the nearest of ``k`` per-subspace centroids — d floats
become m small ints (e.g. 64x4B -> 8x1B, a 32x compression). Search uses
an asymmetric distance computation (ADC): the query's distance to every
centroid of every subspace is a tiny driver-side lookup table, and a
vector's approximate distance is the sum of m table lookups over its
codes — no float math against the original vectors at all.

Spark shapes (all scale-safe):

- **train** (:func:`pq_train`): k-means per subspace over a DETERMINISTIC
  sample — the ``sample`` rows with the smallest ``md5(salt # id)``
  (a reproducible uniform draw; no RNG, and hashlib-replicable so the
  oracle rebuilds the identical codebook without Spark), initialized
  from the k hash-smallest sample points and run a fixed number of Lloyd
  iterations driver-side in numpy. Metadata-scale: the sample is
  thousands of rows, the codebook is m*k small vectors.
- **assign** (:func:`pq_assign`): the codebook renders as a literal
  nested-array expression; per subspace the code is the argmin of k
  squared-L2 distances — pure fused column expressions, zero shuffle,
  zero Python. Distances are det-rounded before the argmin so the code
  assignment is engine-reproducible (the DuckDB oracle recomputes the
  identical argmin; raw-double ties would be last-ulp lottery).
- **search** (:func:`pq_search_topk`): ADC lookup tables render as
  literal arrays; the score is m array lookups + en route sum, ranked by
  TakeOrderedAndProject (per-partition top-k, no global sort).

Codebooks are plain ``list[list[list[float]]]`` (m x k x d/m) so they
serialize into checkpoints/tests trivially.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import math

from tab2neo_spark.operators.hashing import md5_rank_key
from tab2neo_spark.operators.numeric import det_round
from tab2neo_spark.operators.numeric import sql_double as _sql_double


def kmeans_codebook(
    X: np.ndarray, m: int, k: int, iters: int
) -> list[list[list[float]]]:
    """Pure-numpy per-subspace Lloyd k-means over a HASH-ORDERED sample
    matrix — shared verbatim by the Spark trainer and the correctness
    oracle (same floats in, same ops, bit-identical codebook out). Init
    = the first k sample points per subspace; empty clusters keep their
    previous centroid (deterministic fixed-point handling)."""
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    codebook: list[list[list[float]]] = []
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        C = Xj[: min(k, len(Xj))].copy()
        if len(C) < k:  # tiny inputs: pad by repeating the last point
            C = np.vstack([C, np.repeat(C[-1:], k - len(C), axis=0)])
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
        codebook.append([[float(x) for x in row] for row in C])
    return codebook


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    salt: str = "pq",
) -> list[list[list[float]]]:
    """Deterministic per-subspace k-means codebook (m x k x d/m).

    The training sample is the ``sample`` rows with the smallest
    ``md5(salt # id)`` — a pure function of row identity (md5, not
    xxhash64: hashlib replicates it exactly, so the correctness oracle
    can rebuild the identical sample without Spark), so the codebook is
    identical across runs, cluster sizes, input partitionings, AND
    engines. Lloyd iterations run driver-side on the sample
    (metadata-scale) via :func:`kmeans_codebook`."""
    key = md5_rank_key(id_col, salt)
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"), key.alias("_k"))
        .orderBy("_k")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty input")
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    return kmeans_codebook(X, m, k, iters)


def pq_assign(
    df: DataFrame,
    vec_col: str,
    codebook: list[list[list[float]]],
    out_col: str = "pq_codes",
    dp: int = 6,
) -> DataFrame:
    """Append ``out_col``: array of m centroid indices (0-based). Pure
    column expressions; the argmin takes the LOWEST index on det-rounded
    distance ties so the assignment is engine-reproducible.

    Plan shape: the codebook enters as literal ARRAY values and the
    per-centroid distance is a ``transform``/``zip_with``/``aggregate``
    fold — NOT an unrolled m*k*subdim arithmetic tree, which at the
    default 8x16x8 already produced a 4.8 MB task binary and multi-second
    first-use codegen (same steady-state speed once compiled; measured).
    Subvectors are projected once per row (attribute references are free
    to reuse — recomputed expressions are not, the Catalyst CSE gotcha)."""
    m = len(codebook)
    sub = len(codebook[0][0])
    # an under-split vector scan (single-row-group file) would evaluate
    # every per-row argmin in ONE task; balance to default parallelism
    # first (no-op on real many-row-group inputs — the assignment itself
    # stays a fused, shuffle-free projection, plan-tested on balanced
    # input)
    from tab2neo_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    vec = F.col(vec_col).cast("array<double>")
    step = df.withColumns(
        {f"_s{j}": F.slice(vec, j * sub + 1, sub) for j in range(m)}
    )

    # The per-subspace distance array renders as ONE SQL string per
    # subspace (F.expr), not nested Column calls: the m·k·(d/m)-literal
    # tree built literal-by-literal costs one py4j round trip per node —
    # ~0.9 s of pure driver time at m=8,k=16, and multiples of that at
    # the gate family's m=16,k=128. The SQL text parses in a single JVM
    # call into the IDENTICAL expression: CAST('<repr>' AS DOUBLE)
    # round-trips every IEEE double exactly, the fold shape
    # (zip_with -> aggregate left fold -> det_round floor formula)
    # matches the old Column construction op-for-op, and the distance
    # array sits behind its own projection so the argmin's two consumers
    # (array_position + array_min) reference the attribute, never
    # re-inline the tree.
    def _dist_sql(j: int) -> str:
        cb_sql = "array(" + ",".join(
            "array(" + ",".join(_sql_double(v) for v in c) + ")"
            for c in codebook[j]
        ) + ")"
        inner = (
            f"aggregate(zip_with(`_s{j}`, c, (a, b) -> (a - b) * (a - b)), "
            f"{_sql_double(0.0)}, (acc, v) -> acc + v)"
        )
        scale = _sql_double(float(10 ** dp))
        return (
            f"transform({cb_sql}, c -> floor(({inner}) * {scale} + "
            f"{_sql_double(0.5)}) / {scale})"
        )

    step = step.withColumns({f"_d{j}": F.expr(_dist_sql(j)) for j in range(m)})
    codes = []
    for j in range(m):
        dists = F.col(f"_d{j}")
        # array_position returns the FIRST match (1-based) -> lowest index
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return step.withColumn(out_col, F.array(*codes)).drop(
        *[f"_s{j}" for j in range(m)], *[f"_d{j}" for j in range(m)]
    )


def pq_search_topk(
    df: DataFrame,
    codes_col: str,
    id_col: str,
    query: Sequence[float],
    codebook: list[list[list[float]]],
    topk: int = 10,
    dp: int = 6,
) -> DataFrame:
    """Approximate nearest neighbours by ADC: per subspace, the query's
    det-rounded squared distance to each centroid is a literal lookup
    array; a row's score is the sum of m ``element_at`` lookups over its
    codes. Ranked ascending with id tiebreak via TakeOrderedAndProject."""
    m = len(codebook)
    sub = len(codebook[0][0])
    q = [float(x) for x in query]
    # the ADC score renders as ONE SQL expression (same py4j-chatter
    # reasoning as pq_assign's distance arrays); the explicit leading
    # 0.0 preserves the exact left-fold addition shape of the previous
    # Column construction
    terms = []
    for j in range(m):
        qj = q[j * sub : (j + 1) * sub]
        # det_round's floor(x*10^dp+0.5)/10^dp formula, NOT Python
        # round() (half-even) — the repo's cross-engine rounding rule
        lut = [
            math.floor(sum((a - b) ** 2 for a, b in zip(qj, c)) * 10**dp + 0.5)
            / 10**dp
            for c in codebook[j]
        ]
        lut_sql = "array(" + ",".join(_sql_double(v) for v in lut) + ")"
        terms.append(
            f"element_at({lut_sql}, element_at(`{codes_col}`, {j + 1}) + 1)"
        )
    score = F.expr(" + ".join([_sql_double(0.0)] + terms))
    return (
        df.select(F.col(id_col), det_round(score, dp).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col))
        .limit(topk)
    )


def sq_l2(a, b):
    """Det-roundable squared-L2 between two array columns (zip_with +
    aggregate fold — JVM-side, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_rerank_topk(
    df: DataFrame,
    vec_col: str,
    codes_col: str,
    id_col: str,
    query: Sequence[float],
    codebook: list[list[list[float]]],
    topk: int = 10,
    rerank: int = 200,
    dp: int = 6,
) -> DataFrame:
    """Two-stage PQ search — the recall-quality serving shape: a
    compressed-domain ADC scan picks ``rerank`` candidates (codes column
    only — at 100 TB this reads m bytes/vector, not d floats), then ONLY
    those candidates are exactly re-scored against the raw vectors and
    the det-rounded squared-L2 top-``topk`` returned.

    Plan shape: stage 1 is :func:`pq_search_topk`'s TakeOrderedAndProject
    over the codes column (the vector column is pruned from that scan);
    stage 2 is a broadcast semi-join of the ``rerank``-row candidate set
    back to the table — ``rerank`` full vectors cross the wire, never the
    corpus. On the synthetic 64-dim corpus, m=16/k=128 codes with
    rerank=200 measure recall@10 = 1.0 vs exact (the ann_recall gate
    asserts >= 0.9 end-to-end)."""
    cand = pq_search_topk(df, codes_col, id_col, query, codebook, rerank, dp)
    q = F.expr("array(" + ",".join(_sql_double(float(x)) for x in query) + ")")
    exact = det_round(sq_l2(F.col(vec_col).cast("array<double>"), q), dp)
    return (
        df.join(F.broadcast(cand.select(id_col)), on=id_col, how="inner")
        .select(F.col(id_col), exact.alias("l2_dist"))
        .orderBy(F.asc("l2_dist"), F.col(id_col))
        .limit(topk)
    )


def _rank_cells_by_query(cents, cell_col: str, query: Sequence[float], dp: int):
    """Driver-side cell ranking by det-rounded squared-L2 centroid
    distance (metadata-scale: one row per cell), cell-id tiebreak —
    engine-reproducible with the SQL oracle's floor-formula ORDER BY."""
    q = [float(x) for x in query]
    ranked = sorted(
        (
            math.floor(
                sum((a - b) ** 2 for a, b in zip(r["centroid"], q)) * 10**dp + 0.5
            )
            / 10**dp,
            r[cell_col],
        )
        for r in cents
    )
    return [cell for _, cell in ranked]


def pq_ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    query: Sequence[float],
    codebook: list[list[list[float]]],
    topk: int = 10,
    nprobe: int = 2,
    dp: int = 6,
    centroids: list | None = None,
) -> DataFrame:
    """IVFPQ: coarse cells prune the corpus (IVF), PQ codes score what
    remains (ADC) — the composition that serves at 100 TB where neither
    alone does (IVF still reads raw floats; flat PQ still scans every
    row). Cells rank by det-rounded centroid squared-L2 to the query
    driver-side; the ``nprobe`` nearest cells are filtered (a partition-
    pruned read when ``cell_col`` is the partition key — see
    :func:`build_ivfpq_index`), codes are assigned and ADC-ranked inside.

    NOTE (r5 ADVICE): this INLINE form computes the cell centroids with a
    full-corpus aggregation per query. Pass ``centroids`` (rows with
    ``cell_col`` + ``centroid``, e.g. the materialized index's sidecar
    collected once, or ``ivf_centroids(df, ...).collect()`` persisted by
    the caller) to make the cell ranking metadata-scale; repeated serving
    should use :func:`pq_ivf_topk_indexed`, which reads the sidecar."""
    from tab2neo_spark.operators.similarity import ivf_centroids

    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(df, vec_col, cell_col).collect()
    )
    probe = _rank_cells_by_query(cents, cell_col, query, dp)[:nprobe]
    probed = df.filter(F.col(cell_col).isin(probe))
    coded = pq_assign(probed, vec_col, codebook)
    return pq_search_topk(coded, "pq_codes", id_col, query, codebook, topk, dp)


def build_ivfpq_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    path: str,
    codebook: list[list[list[float]]] | None = None,
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    salt: str = "pq",
) -> list[list[list[float]]]:
    """Materialize the IVFPQ index: codes written CELL-PARTITIONED and
    WITHOUT the raw vector column (the 100 TB point — the searchable
    artifact is m small ints per vector under a partition layout), plus
    the centroid sidecar and the codebook as JSON. A probe is then a
    partition-pruned, column-narrow scan of ``nprobe/|cells|`` of an
    already-32x-compressed table."""
    import json

    from tab2neo_spark.operators.similarity import ivf_centroids

    cb = codebook or pq_train(df, vec_col, id_col, m, k, sample, iters, salt)
    coded = pq_assign(df, vec_col, cb)
    coded.select(id_col, "pq_codes", cell_col).write.mode("overwrite").partitionBy(
        cell_col
    ).parquet(f"{path}/codes")
    ivf_centroids(df, vec_col, cell_col).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    spark = df.sparkSession
    spark.createDataFrame([(json.dumps(cb),)], "codebook string").coalesce(
        1
    ).write.mode("overwrite").json(f"{path}/codebook")
    return cb


def pq_ivf_topk_indexed(
    spark,
    path: str,
    id_col: str,
    cell_col: str,
    query: Sequence[float],
    topk: int = 10,
    nprobe: int = 2,
    dp: int = 6,
) -> DataFrame:
    """Query a materialized IVFPQ index: rank the centroid sidecar
    driver-side, read ONLY the ``nprobe`` nearest cell partitions of the
    codes table (verify ``PartitionFilters`` in the scan; the raw vector
    column does not exist in the index at all), ADC-score and return the
    top-k."""
    import json

    cb = json.loads(
        spark.read.json(f"{path}/codebook").collect()[0]["codebook"]
    )
    cents = spark.read.parquet(f"{path}/centroids").collect()
    probe = _rank_cells_by_query(cents, cell_col, query, dp)[:nprobe]
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col(cell_col).isin(probe)
    )
    return pq_search_topk(codes, "pq_codes", id_col, query, cb, topk, dp)
