"""Skew utilities: salted aggregation/join correctness vs direct results."""

from __future__ import annotations

from pyspark.sql import functions as F

from tab2neo_spark.operators.skew import (
    salted_collect_set,
    salted_count_distinct,
    salted_join_hot_keys,
)


def _skewed_df(spark):
    # hot key 'data' carries 90% of rows (the head-entity shape)
    rows = [("data", f"v{i % 70}") for i in range(900)] + [
        (f"k{i}", f"v{i}") for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, value string").repartition(16)


def test_salted_count_distinct_exact(spark):
    df = _skewed_df(spark)
    got = {
        r["key"]: r["n_distinct_value"]
        for r in salted_count_distinct(df, ["key"], "value", buckets=8).collect()
    }
    exp = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.countDistinct("value").alias("n")).collect()
    }
    assert got == exp and got["data"] == 70


def test_salted_collect_set_exact(spark):
    df = _skewed_df(spark)
    got = {
        r["key"]: list(r["values"])
        for r in salted_collect_set(df, ["key"], "value", buckets=8).collect()
    }
    exp = {
        r["key"]: sorted(r["s"])
        for r in df.groupBy("key").agg(F.collect_set("value").alias("s")).collect()
    }
    assert got == exp


def test_salted_join_hot_keys_exact(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("data", "HOT"), ("k1", "COLD1"), ("k2", "COLD2")], "key string, attr string"
    )
    got = salted_join_hot_keys(big, small, "key", hot_keys=["data"], buckets=4)
    direct = big.join(small, "key")
    assert got.count() == direct.count() == 902
    assert (
        got.groupBy("attr").count().orderBy("attr").collect()
        == direct.groupBy("attr").count().orderBy("attr").collect()
    )
