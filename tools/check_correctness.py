"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB (tables pre-registered as views), compares row count, column
names, and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"schema: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    # the driver hashes values+types: a Spark BIGINT vs DuckDB HUGEINT column
    # is a red row even when values match (round-1 'sessionize'), so flag any
    # dtype-kind divergence here too
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} not in ({"i", "u"},):
            problems.append(f"dtype[{c}]: spark={a[c].dtype} oracle={b[c].dtype}")
    if len(a) != len(b):
        problems.append(f"rows: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)]
        if bad:
            problems.append(f"values[{c}]: {len(bad)} mismatches, first: {bad[:3]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # data-derived oracles (dedup_canonical's union-find VALUES) must read
    # the SAME sf dir the queries run against
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    # a targeted run that excludes dedup_canonical must not pay its
    # corpus-scale union-find oracle build
    if only and "dedup_canonical" not in only:
        os.environ["SPARK_GRAFT_ORACLE_SKIP_CANON"] = "1"

    import __spark_entry__ as entrymod
    from tab2neo_spark.session import get_spark

    spark = get_spark(app_name="correctness", cores=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    extra_oracles = set(oracles) - set(qs)
    if extra_oracles:
        print(f"!! oracles without queries: {extra_oracles}")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: no oracle, rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {str(ex)[:300]}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"OK   {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
