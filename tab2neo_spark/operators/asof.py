"""As-of (temporal) join — an operator Spark lacks natively.

Not present in the reference either (SURVEY §2.3: "No theta/range/as-of"),
but essential for event-shaped webtext side-data (crawl snapshots, label
propagation over time).  Two implementations, picked by the caller:

- :func:`asof_join` — the UNION + WINDOW formulation: tag both inputs,
  union them, sort within (by, time) once, and carry the most recent
  right-side attributes forward with ``last(..., ignorenulls=True)``.
  ONE shuffle (the window partition), no Python, no quadratic range
  explosion — the scalable default. Ties (equal timestamps) resolve to
  the right-side row (standard backward as-of: right row at ts == left
  ts matches).
- :func:`asof_join_in_pandas` — ``pd.merge_asof`` per group via
  cogrouped ``applyInPandas``; simpler semantics surface (tolerance,
  nearest-direction) at Python cost. For groups small enough to fit a
  pandas frame.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of: each left row gets the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (nulls when no
    prior right row exists).

    Plan shape: union (narrow) -> window over (by, on) -> filter left
    side. Exactly one exchange on ``by`` — at scale this beats a range
    join's O(|L|x|R|) expansion and AQE handles hot ``by`` groups.
    """
    value_cols = list(value_cols or [c for c in right.columns if c not in (*by, on)])
    lcols = [c for c in left.columns]

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    left_dtypes = dict(left.dtypes)
    r_cols = [
        F.col(c) if (c in by or c == on) else F.lit(None).cast(left_dtypes[c]).alias(c)
        for c in lcols
    ]
    r_tag = right.select(
        *r_cols,
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows (__is_left=0) sort BEFORE left rows at the same timestamp,
    # so a tie matches the right row (backward-inclusive semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[F.col(f"__asof_{c}").alias(c) for c in value_cols]
    )
    return out


def asof_join_in_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """pd.merge_asof per ``by`` group via cogrouped applyInPandas —
    the flexible-but-Python variant (nearest/forward directions,
    tolerance windows)."""
    import pandas as pd

    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in left.dtypes]
        + [f"`{c}` {t}" for c, t in right.dtypes if c in value_cols]
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=list(l.columns) + list(value_cols))
        l = l.sort_values(on)
        r = r.sort_values(on)[[by, on, *value_cols]] if not r.empty else r
        if r.empty:
            for c in value_cols:
                l[c] = None
            return l
        merged = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, tolerance=tolerance,
            suffixes=("", "__r"),
        )
        return merged[list(l.columns) + list(value_cols)]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, out_schema)
    )
