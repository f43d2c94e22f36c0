"""SparkSession factory tuned for the KG-construction workload.

Local-mode defaults mirror what we would set fleet-wide on a real
multi-executor cluster: AQE on (runtime re-plan + skew-join splitting),
Arrow on (every Python island is a vectorized pandas/Arrow UDF — the
engine has no per-row Python UDFs), UTC session timezone (oracle
comparisons), and shuffle partitions sized to cores rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def shuffle_partitions_for(
    n_rows: int, rows_per_partition: int = 2_000_000, floor: int = 8
) -> int:
    """Shuffle-partition count for a job whose widest shuffle carries
    ``n_rows`` (input rows x per-row expansion — e.g. ~40 window digests
    per page in the substring-dedup chain).

    The rule this encodes (docs/PLANS.md §20, measured): per-partition
    aggregation state must fit execution memory, so partition count
    scales with DATA VOLUME, never with the machine shape — sizing to
    cores put 12M digest-agg entries per partition at 10M pages and
    spilled 174 GB; sizing by volume ran the same job 3.4x faster with
    zero spill. Over-partitioning is free under AQE coalescing, so when
    unsure round UP."""
    import math

    return max(floor, math.ceil(max(n_rows, 1) / rows_per_partition))


def ensure_min_partitions(df, min_parts: int | None = None):
    """Guard against pathologically under-split inputs (optimization guide
    §2.5 "input skew": one huge unsplittable file -> repartition right
    after the read).

    Parquet row groups are the parallelism floor of a scan: a single-row-
    group file runs every downstream narrow expression (tokenize, digest,
    regex, PQ assignment) in ONE task no matter how many cores are idle.
    When the plan's partition count is below the session's default
    parallelism, round-robin repartition to it — EXPLICIT numPartitions so
    AQE's partition coalescing respects the user-specified count. The
    shuffle moves the raw rows once (MBs at the scales where the branch can
    fire); at production scale a real table carries more row groups than
    the cluster has cores, the branch is a no-op, and the zero-shuffle
    plan shapes the tests assert are unchanged.

    Streaming DataFrames pass through untouched (no .rdd on a stream)."""
    if getattr(df, "isStreaming", False):
        return df
    n = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def get_spark(
    app_name: str = "tab2neo_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` may be an int (-> ``local[n]``), ``"*"`` or None
    (-> ``local[*]`` / $SPARK_GRAFT_CPUS when set).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    ncores = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, ncores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # ~cores, not 200: local shuffles are driver-disk bound; on a real
        # cluster this is overridden per-job by AQE coalescing anyway.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # skew from head entities / hot domains (north rule): let AQE split
        # oversized post-shuffle partitions in joins.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
