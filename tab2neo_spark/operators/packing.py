"""Result-shape operators: packing aggregations + pivot (A1/A2, readback).

The reference's RETURN-clause assembly packs related class values into
per-row lists or keyed maps via ``collect(distinct ...)`` /
``apoc.map.fromPairs`` (query_builders/query_builder.py:676-798) and the
DataProvider pivots dict columns into real columns
(data_providers/data_provider.py:252-262).  Spark equivalents are
``collect_set`` / ``map_from_entries`` and ``groupBy().pivot()``.

All list outputs are sorted (``sort_array``) — deterministic results are a
contract here (oracle hashing), whereas Cypher collect order is incidental.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_values(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str | None = None
) -> DataFrame:
    """A1 list-packing: per key group, sorted distinct list of values."""
    out_col = out_col or f"{value_col}s"
    return df.groupBy(*keys).agg(
        F.sort_array(F.collect_set(value_col)).alias(out_col)
    )


def pack_map(
    df: DataFrame,
    keys: Sequence[str],
    map_key_col: str,
    map_value_col: str,
    out_col: str = "packed",
) -> DataFrame:
    """A1 map-packing: ``apoc.map.fromPairs(collect([k, v]))`` analog.

    A map key can appear with several distinct values inside one group
    (1:N); ``map_from_entries`` over the raw pairs would raise
    DUPLICATED_MAP_KEY under Spark's default ``EXCEPTION`` dedup policy.
    apoc.map.fromPairs keeps the last pair seen (row order —
    nondeterministic); here entries are sorted ``(key, value)`` and the
    LAST occurrence per key wins, i.e. a deterministic max-value-per-key
    (same documented divergence as the provider path, provider.py)."""
    entries = F.sort_array(
        F.collect_set(
            F.when(
                F.col(map_key_col).isNotNull(),
                F.struct(
                    F.col(map_key_col).alias("key"),
                    F.col(map_value_col).alias("value"),
                ),
            )
        )
    )
    # (no null-entry filter needed: collect_set already drops the NULL
    # the when() produces for null-key rows)
    # projection boundary: the sorted entry array is materialized by the
    # aggregation BEFORE the lookahead lambda references it — inlined,
    # the sort_array(collect_set(...)) would re-evaluate once per element
    # (O(n² log n) per group; the lambda-CSE trap, docs/PLANS.md §17)
    grouped = df.groupBy(*keys).agg(entries.alias("_entries"))
    e = F.col("_entries")
    n = F.size(e)
    # F.get is 0-indexed and NULL (never ANSI error) out of bounds, so
    # the i == n-1 guard composes safely with the lookahead
    last_per_key = F.filter(
        e, lambda x, i: (i == n - 1) | (F.get(e, i + 1)["key"] != x["key"])
    )
    return grouped.select(
        *keys, F.map_from_entries(last_per_key).alias(out_col)
    )


def disjoint_collect(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A2 ``return_disjoint``: one row of per-column sorted distinct value
    sets (query_builder.py:878-880)."""
    return df.agg(
        *[F.sort_array(F.collect_set(c)).alias(f"{c}_values") for c in cols]
    )


def pivot_wide(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence[str] | None = None,
    fill_value=None,
) -> DataFrame:
    """Dict-column expansion analog (data_provider.py:252-262). Passing
    ``pivot_values`` explicitly skips the extra distinct-scan Spark needs
    to discover them — always do so at scale.

    ``fill_value`` replaces the NULL Spark puts in empty pivot cells (SQL
    ``count(*) FILTER`` semantics produce 0, not NULL, for empty cells)."""
    gb = df.groupBy(*keys).pivot(pivot_col, list(pivot_values) if pivot_values else None)
    out = gb.agg(F.first(value_col))
    if fill_value is not None:
        cell_cols = [c for c in out.columns if c not in set(keys)]
        out = out.select(
            *keys,
            *[F.coalesce(F.col(f"`{c}`"), F.lit(fill_value)).alias(c) for c in cell_cols],
        )
    return out
