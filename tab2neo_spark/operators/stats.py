"""apply_stat analog: named statistics over dimension combinations (A4-A6).

The reference's ApplyStat supermethod groups value columns by dimension
columns and computes named statistics via a remote ``group_by`` script
(derivation_method/super_method.py:391-878; params :615-637), loops one
pass per optional-dimension subset (:606-658, :870-878), and computes
percentages by joining a numerator branch to a denominator branch
(:659-829).  Spark collapses all of that:

- the stat registry maps to built-in aggregate expressions (JVM, partial
  aggregation / map-side combine for free);
- the optional-dimension powerset is ONE pass via ``GROUPING SETS``
  instead of N sequential jobs;
- percentages are a window-sum over the denominator dimensions — no
  branch save/load/combine machinery needed.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# named statistics (super_method.py:661 lists the valid pct stats)
STAT_FNS = {
    "n": lambda c: F.count(c),
    "n_distinct": lambda c: F.countDistinct(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "median": lambda c: F.median(c),
    "stddev": lambda c: F.stddev_samp(c),
}


def stat_exprs(value_col: str, stats: Sequence[str]) -> list[Column]:
    return [STAT_FNS[s](F.col(value_col)).alias(f"{s}_{value_col}") for s in stats]


def group_stats(
    df: DataFrame, by: Sequence[str], value_col: str, stats: Sequence[str]
) -> DataFrame:
    """One grouped pass of named stats (the ``group_by`` script analog)."""
    return df.groupBy(*by).agg(*stat_exprs(value_col, stats))


def all_dimension_combinations(
    required: Sequence[str], optional: Sequence[str]
) -> list[list[str]]:
    """required dims always; powerset of optional dims
    (super_method.py:870-878)."""
    out = []
    for k in range(len(optional) + 1):
        for subset in combinations(optional, k):
            out.append(list(required) + list(subset))
    return out


def dimension_combination_stats(
    df: DataFrame,
    required: Sequence[str],
    optional: Sequence[str],
    value_col: str,
    stats: Sequence[str],
) -> DataFrame:
    """A5 as ONE job: GROUPING SETS over required+powerset(optional).

    The reference runs one remote group_by per subset; a single
    grouping-sets pass shares the scan and lets Catalyst expand partial
    aggregates — at 100 TB this is the difference between 2^k scans and 1.
    Absent optional dims come back NULL (plus a ``grouping_id`` to
    disambiguate NULL-as-rolled-up from NULL data).
    """
    sets = [tuple(c) for c in all_dimension_combinations(required, optional)]
    all_dims = list(required) + list(optional)
    gs = df.groupingSets(sets, *[F.col(c) for c in all_dims])
    return gs.agg(F.grouping_id().alias("grouping_id"), *stat_exprs(value_col, stats))


def percentage_of_total(
    df: DataFrame,
    dims: Sequence[str],
    denominator_dims: Sequence[str],
    value_col: str,
    dp: int = 2,
    out_col: str = "pct",
) -> DataFrame:
    """A6: count per ``dims`` as a percentage of the count per
    ``denominator_dims`` (the reference's numerator/denominator branch
    dance, super_method.py:659-829), via one aggregation + one window —
    the denominator never rescans the input."""
    num = df.groupBy(*dims).agg(F.count(value_col).alias("__n"))
    w = Window.partitionBy(*[F.col(d) for d in denominator_dims])
    return (
        num.withColumn("__d", F.sum("__n").over(w))
        .withColumn(out_col, F.round(F.col("__n") * 100.0 / F.col("__d"), dp))
        .drop("__n", "__d")
    )
