"""Whitelisted transform registry — replaces RunScript/CallAPI dynamic eval.

The reference executes pipeline transforms by importing a scripts package
and ``eval``-ing a function call string (derivation_method/action.py:
692-786, exec/eval at :730-731), or POSTing the df as JSON to a remote
Python/R executor with dtype-preservation bookkeeping (action.py:867-1258).
Both are driver-side, row-materialized, and unsafe.

Here transforms are a REGISTRY of named, whitelisted DataFrame->DataFrame
functions built from native column expressions (no eval, no JSON
round-trip; dtype preservation is Arrow/Catalyst schema fidelity, free).
The known script library (scripts/basic_df_ops.py:4-6;
super_method.py:323-339,576-592,615-637,719-783) maps one-to-one:
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transform = Callable[..., DataFrame]

_REGISTRY: dict[str, Transform] = {}


def register(name: str):
    def deco(fn: Transform) -> Transform:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_transform(name: str) -> Transform:
    if name not in _REGISTRY:
        raise KeyError(
            f"transform {name!r} not registered; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def registered() -> list[str]:
    return sorted(_REGISTRY)


# -- the reference's script library, Spark-native ---------------------------


@register("multiply_cols")
def multiply_cols(df: DataFrame, columns: list[str], new_column: str, **_) -> DataFrame:
    """scripts/basic_df_ops.py:4-6 (prod over columns)."""
    out = F.col(columns[0])
    for c in columns[1:]:
        out = out * F.col(c)
    return df.withColumn(new_column, out)


@register("divide")
def divide(df: DataFrame, numerator: str, denominator: str, new_column: str,
           decimal_places: int | None = None, **_) -> DataFrame:
    """super_method.py:751-783; '&100'-style literal operands supported via
    the multiply transform."""
    out = F.col(numerator) / F.col(denominator)
    if decimal_places is not None:
        out = F.round(out, decimal_places)
    return df.withColumn(new_column, out)


@register("multiply")
def multiply(df: DataFrame, column: str, by: float = 1.0,
             new_column: str | None = None, decimal_places: int | None = None, **_) -> DataFrame:
    out = F.col(column) * F.lit(by)
    if decimal_places is not None:
        out = F.round(out, decimal_places)
    return df.withColumn(new_column or column, out)


@register("rename_columns")
def rename_columns(df: DataFrame, mapping: dict[str, str], **_) -> DataFrame:
    """super_method.py:323-339."""
    return df.withColumnsRenamed(mapping)


@register("head_tail")
def head_tail(df: DataFrame, n: int = 5, order_by: list[str] | None = None, **_) -> DataFrame:
    """first/last n rows per the given order (deterministic — order_by
    required for a distributed engine; defaults to all columns)."""
    cols = order_by or df.columns
    asc = df.orderBy(*[F.col(c) for c in cols]).limit(n)
    desc = df.orderBy(*[F.col(c).desc() for c in cols]).limit(n)
    return asc.unionByName(desc).dropDuplicates()


@register("group_by")
def group_by(df: DataFrame, by: list[str], value_cols: list[str],
             stats: list[str] = ("n",), **_) -> DataFrame:
    """the remote basic_df_ops.group_by analog (super_method.py:615-637)."""
    from tab2neo_spark.operators.stats import STAT_FNS

    aggs = []
    for v in value_cols:
        for s in stats:
            aggs.append(STAT_FNS[s](F.col(v)).alias(f"{s}_{v}"))
    return df.groupBy(*by).agg(*aggs)


@register("remap_term_values")
def remap_term_values(df: DataFrame, column: str, mapping: dict[str, str],
                      new_column: str | None = None, **_) -> DataFrame:
    """decode supermethod's SAME_AS term remap (super_method.py:281-388):
    values found in the mapping are replaced, others pass through."""
    expr = None
    col = F.col(column)
    for k, v in sorted(mapping.items()):
        branch = F.when(col == F.lit(k), F.lit(v))
        expr = branch if expr is None else expr.when(col == F.lit(k), F.lit(v))
    out = expr.otherwise(col) if expr is not None else col
    return df.withColumn(new_column or column, out)


@register("ct_cartesian_product")
def ct_cartesian_product(df: DataFrame, values: list[str], column: str, **_) -> DataFrame:
    """cross df with a controlled-terminology value list
    (super_method.py:576-592) — explode of a literal array, no real
    cartesian shuffle."""
    arr = F.array(*[F.lit(v) for v in values])
    return df.withColumn(column, F.explode(arr))
