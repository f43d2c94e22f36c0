"""where_map / where_rel_map predicate compiler (P1/P2).

The reference compiles ``where_map`` dicts into parameterized Cypher WHERE
fragments (query_builders/query_builder.py:154-298: ranges :239-273,
not_in :276-284, in/eq :287-296) and ``where_rel_map`` into existential
neighborhood subqueries (:300-355).  Here the same dict dialect compiles
directly into Catalyst ``Column`` expressions and semi/anti joins — so
predicate pushdown, partition pruning, and codegen come for free.

Dialect (per property):
- scalar                      -> ``col = value``
- list                        -> ``col IN (...)``
- {"not_in": v_or_list}       -> ``NOT col IN (...)``  (null rows drop, as
                                  in Cypher where NOT(null IN ..) is null)
- [{"not_in": a}, {"not_in": b}, ...]  list of not_in dicts
                              -> ``NOT col IN (a, b, ...)``
                                  (query_builder.py:281-284)
- range dict with any of ``min``/``max`` plus ``min_include`` /
  ``max_include`` (default **False** — the reference's bounds are
  EXCLUSIVE unless flagged, query_builder.py:243-244) and ``incl_null``
  (None -> no null clause; True -> ``.. OR col IS NULL``; False ->
  ``col IS NOT NULL AND ..``, a no-op for range predicates since NULL
  never satisfies a comparison, kept for dialect parity)
                              -> ``min </<= col </<= max [OR col IS NULL]``
- bare {"incl_null": True/False} (no min/max)
                              -> ``col IS NULL`` / ``col IS NOT NULL``
                                  (tests_query_builders/test_qb2.py:336)
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RANGE_KEYS = {"min", "max", "min_include", "max_include", "incl_null"}


def _is_range(value: Any) -> bool:
    return isinstance(value, Mapping) and bool(RANGE_KEYS & set(value)) and (
        "min" in value or "max" in value
    )


def compile_condition(col: Column, value: Any) -> Column:
    """One property's condition -> a boolean Column."""
    # bare {"incl_null": bool} (no min/max) is a pure null check in the
    # reference dialect (tests_query_builders/test_qb2.py:336):
    # True -> IS NULL, False -> IS NOT NULL
    if isinstance(value, Mapping) and set(value) == {"incl_null"}:
        return col.isNull() if value["incl_null"] else col.isNotNull()
    if isinstance(value, Mapping) and "not_in" in value:
        v = value["not_in"]
        vals = v if isinstance(v, (list, tuple)) else [v]
        return ~col.isin(list(vals))
    # list of {'not_in': x} dicts -> NOT col IN (x, ...) (query_builder.py:281-284)
    if (
        isinstance(value, (list, tuple))
        and value
        and all(isinstance(item, Mapping) for item in value)
    ):
        vals = [item.get("not_in") for item in value]
        return ~col.isin(vals)
    if _is_range(value):
        parts: list[Column] = []
        if "min" in value:
            lo = F.lit(value["min"])
            # reference bounds are EXCLUSIVE by default (query_builder.py:243-244)
            parts.append(col >= lo if value.get("min_include", False) else col > lo)
        if "max" in value:
            hi = F.lit(value["max"])
            parts.append(col <= hi if value.get("max_include", False) else col < hi)
        cond = parts[0]
        for p in parts[1:]:
            cond = cond & p
        if value.get("incl_null", False):
            cond = cond | col.isNull()
        return cond
    if isinstance(value, (list, tuple, set)):
        return col.isin(list(value))
    return col == F.lit(value)


def compile_where_map(where_map: Mapping[str, Any] | None) -> Column | None:
    """``{prop: condition}`` (one class's map) -> conjoined Column.

    The class-level nesting ``{Class: {prop: cond}}`` is resolved by the
    readback layer, which knows which DataFrame carries which class; this
    compiles the inner map.
    """
    if not where_map:
        return None
    cond: Column | None = None
    for prop, value in where_map.items():
        c = compile_condition(F.col(prop), value)
        cond = c if cond is None else cond & c
    return cond


def apply_where_map(df: DataFrame, where_map: Mapping[str, Any] | None) -> DataFrame:
    cond = compile_where_map(where_map)
    return df if cond is None else df.filter(cond)


# -- where_rel_map: existential neighborhood conditions (P2) -----------------


def apply_rel_condition(
    df: DataFrame,
    key: str,
    neighbors: DataFrame,
    neighbor_key: str,
    exists: bool = True,
) -> DataFrame:
    """``EXISTS`` / ``NOT EXISTS`` a related row (query_builder.py:300-355):
    semi-join keeps rows with a neighbor, anti-join keeps rows without.

    ``neighbors`` should already be filtered to the rel_type / neighbor
    class of interest; the join is key-only so Catalyst can pick broadcast
    when the neighbor side is small.
    """
    how = "left_semi" if exists else "left_anti"
    other = neighbors.select(F.col(neighbor_key).alias("__nk")).distinct()
    return df.join(other, df[key] == F.col("__nk"), how)
