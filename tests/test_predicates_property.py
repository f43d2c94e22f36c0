"""Property-based cross-engine check: the where_map predicate compiler
must agree with DuckDB's evaluation of the equivalent SQL for arbitrary
specs — the same contract the driver's oracle gate enforces, explored
over random inputs instead of fixed examples. Integer domain only (float
boundary semantics are covered by the det_round discipline elsewhere)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tab2neo_spark.operators.predicates import apply_where_map

VALUES = st.integers(min_value=-5, max_value=15)


SPEC = st.one_of(
    VALUES,                                                   # equality
    st.lists(VALUES, min_size=1, max_size=4),                 # IN
    st.fixed_dictionaries({"not_in": st.lists(VALUES, min_size=1, max_size=4)}),
    st.builds(lambda lo, hi, mi, ma: {"min": lo, "max": hi,
                                      "min_include": mi, "max_include": ma},
              VALUES, VALUES, st.booleans(), st.booleans()),
    st.builds(lambda lo: {"min": lo}, VALUES),
    st.builds(lambda hi, ma: {"max": hi, "max_include": ma}, VALUES, st.booleans()),
)


def _to_sql(col: str, spec) -> str:
    if isinstance(spec, int):
        return f"{col} = {spec}"
    if isinstance(spec, list):
        return f"{col} IN ({', '.join(map(str, spec))})"
    if "not_in" in spec:
        return f"NOT {col} IN ({', '.join(map(str, spec['not_in']))})"
    parts = []
    if "min" in spec:
        op = ">=" if spec.get("min_include", False) else ">"
        parts.append(f"{col} {op} {spec['min']}")
    if "max" in spec:
        op = "<=" if spec.get("max_include", False) else "<"
        parts.append(f"{col} {op} {spec['max']}")
    return " AND ".join(parts)


@pytest.fixture(scope="module")
def domain(spark):
    rows = [(x,) for x in range(-5, 16)] + [(None,)]
    return spark.createDataFrame(rows, "x int").cache()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=SPEC)
def test_predicate_matches_duckdb(spark, domain, spec):
    got = sorted(
        r["x"] for r in apply_where_map(domain, {"x": spec}).collect()
        if r["x"] is not None
    )
    sql = _to_sql("x", spec)
    con = duckdb.connect()
    exp = sorted(
        r[0]
        for r in con.sql(
            "SELECT x FROM (SELECT unnest(range(-5, 16)) AS x) WHERE " + sql
        ).fetchall()
    )
    assert got == exp, f"spec={spec} sql={sql}"
