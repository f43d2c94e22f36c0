"""As-of join: window formulation vs pd.merge_asof vs hand oracle."""

from __future__ import annotations

import pytest

from tab2neo_spark.operators.asof import asof_join, asof_join_in_pandas


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("u1", 10, 1.0), ("u1", 20, 2.0), ("u1", 30, 3.0),
        ("u2", 15, 10.0),
    ]
    return spark.createDataFrame(rows, "uid string, t long, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("u1", 5), ("u1", 10), ("u1", 25), ("u1", 99),
        ("u2", 14), ("u2", 16),
        ("u3", 50),
    ]
    return spark.createDataFrame(rows, "uid string, t long")


EXPECTED = {
    ("u1", 5, None),    # before any quote
    ("u1", 10, 1.0),    # tie -> match
    ("u1", 25, 2.0),
    ("u1", 99, 3.0),
    ("u2", 14, None),
    ("u2", 16, 10.0),
    ("u3", 50, None),   # no quotes at all for u3
}


def test_asof_join_window(quotes, trades):
    got = {(r["uid"], r["t"], r["px"]) for r in
           asof_join(trades, quotes, on="t", by=["uid"]).collect()}
    assert got == EXPECTED


def test_asof_join_pandas(quotes, trades):
    got = {(r["uid"], r["t"], r["px"]) for r in
           asof_join_in_pandas(trades, quotes, on="t", by="uid",
                               value_cols=["px"]).collect()}
    assert got == EXPECTED


def test_asof_single_shuffle(quotes, trades):
    plan = asof_join(trades, quotes, on="t", by=["uid"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # one per union branch, same key
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
