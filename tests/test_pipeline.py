"""Derivation-pipeline tests — mirror the reference's method JSON fixtures
(tests/derivation_method/data/raw/*.json) over the FIXTURES.md §2
test_data shape: multiply AGE x TESTV -> NEWV -> filter -> link."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tab2neo_spark.pipeline.registry import get_transform, registered
from tab2neo_spark.pipeline.runner import DerivationMethod, resolve_methods_order


@pytest.fixture(scope="module")
def test_data(spark):
    rows = [
        ("STUDY1", "S001", 30, 2.0, "M"),
        ("STUDY1", "S002", 40, 1.5, "F"),
        ("STUDY1", "S003", 20, 3.0, "M"),
    ]
    return spark.createDataFrame(
        rows, "Study string, Subject string, Age int, TestValue double, Sex string"
    )


def test_registry_known_scripts():
    assert {"multiply_cols", "divide", "group_by", "rename_columns",
            "remap_term_values", "ct_cartesian_product"} <= set(registered())
    with pytest.raises(KeyError):
        get_transform("arbitrary_eval")


def test_example_derivation_method(spark, test_data):
    """The reference's example_derivation_method.json flow: multiply_cols
    AGE*TESTV -> NEWV, assign class, link (derivation_method/examples/)."""
    spec = {
        "name": "derive_newv",
        "actions": [
            {"type": "get_data"},
            {"type": "run_script", "script": "multiply_cols",
             "params": {"columns": ["Age", "TestValue"], "new_column": "NEWV"}},
            {"type": "assign_class", "class": "NewValue", "value_column": "NEWV"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
            {"type": "link", "relationship_type": "HAS_NEWV",
             "from_id": "_id_Subject", "to_id": "_id_NewValue"},
        ],
    }
    m = DerivationMethod(spark, spec, source_df=test_data)
    res = m.apply()
    got = {(r["Subject"], r["NEWV"]) for r in res.df.select("Subject", "NEWV").collect()}
    assert got == {("S001", 60.0), ("S002", 60.0), ("S003", 60.0)}
    # write outputs: one node per distinct NEWV value (=1), 3 subjects, 3 edges
    assert res.new_nodes[0].count() == 1
    assert res.new_nodes[1].count() == 3
    assert res.new_edges[0].count() == 3


def test_filter_coercion(spark, test_data):
    """string literals coerce like the reference (action.py:222-248)."""
    spec = {
        "name": "f",
        "actions": [
            {"type": "get_data"},
            # bounds are exclusive by default (query_builder.py:243-244);
            # max_include keeps Age=40
            {"type": "filter", "where_map": {"Age": {"min": "25", "max": "40",
                                                     "max_include": True}}},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    assert {r["Subject"] for r in res.df.collect()} == {"S001", "S002"}


def test_run_sql_action(spark, test_data):
    spec = {
        "name": "sql",
        "actions": [
            {"type": "get_data"},
            {"type": "run_sql", "sql": "SELECT Study, count(*) AS n FROM df GROUP BY Study"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    assert res.df.collect()[0]["n"] == 3


def test_branches_natural_join(spark, test_data):
    spec = {
        "name": "b",
        "actions": [
            {"type": "get_data"},
            {"type": "branch_save", "name": "base"},
            {"type": "run_script", "script": "group_by",
             "params": {"by": ["Study"], "value_cols": ["Age"], "stats": ["mean"]}},
            {"type": "branch_combine", "with": "base"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    rows = res.df.collect()
    assert len(rows) == 3 and all(r["mean_Age"] == 30.0 for r in rows)


def test_apply_limited_skips_writes(spark, test_data):
    spec = {
        "name": "lim",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
        ],
    }
    m = DerivationMethod(spark, spec, source_df=test_data)
    res = m.apply(limit=2)
    assert res.new_nodes == []
    assert any(a.get("skipped") == "limited" for a in res.audit)
    assert res.df.count() == 2


def test_predict_output_columns(spark, test_data):
    spec = {
        "name": "p",
        "actions": [
            {"type": "get_data"},
            {"type": "run_script", "script": "multiply_cols",
             "params": {"columns": ["Age", "TestValue"], "new_column": "NEWV"}},
        ],
    }
    cols = DerivationMethod(spark, spec, source_df=test_data).predict_output_columns()
    assert "NEWV" in cols


def test_validation_fails_fast(spark, test_data):
    with pytest.raises(ValueError, match="unknown type"):
        DerivationMethod(spark, {"name": "x", "actions": [{"type": "nope"}]},
                         source_df=test_data)
    with pytest.raises(KeyError):
        DerivationMethod(
            spark,
            {"name": "x", "actions": [{"type": "run_script", "script": "evil"}]},
            source_df=test_data,
        )


def test_method_ordering_kahn():
    methods = {
        "c": {"prerequisites": ["a", "b"]},
        "a": {},
        "b": {"prerequisites": ["a"]},
        "d": {"prerequisites": ["c"]},
    }
    assert resolve_methods_order(methods) == ["a", "b", "c", "d"]
    with pytest.raises(ValueError, match="cyclic"):
        resolve_methods_order({"a": {"prerequisites": ["b"]}, "b": {"prerequisites": ["a"]}})


def test_apply_stat_action(spark, test_data):
    spec = {
        "name": "s",
        "actions": [
            {"type": "get_data"},
            {"type": "apply_stat", "dims": ["Study"], "optional_dims": ["Sex"],
             "value_col": "Age", "stats": ["n", "mean"]},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    rows = {(r["Study"], r["Sex"], r["n_Age"]) for r in res.df.collect()}
    assert ("STUDY1", None, 3) in rows       # rolled-up
    assert ("STUDY1", "M", 2) in rows        # per-sex


def test_decode_supermethod_expansion(spark, test_data):
    """D10 decode: SAME_AS remap + class assignment, macro-expanded."""
    spec = {
        "name": "dec",
        "actions": [
            {"type": "get_data"},
            {"type": "decode", "column": "Sex", "new_column": "SexDecoded",
             "same_as": [["M", "Male"], ["F", "Female"]], "class": "SexDecoded"},
        ],
    }
    m = DerivationMethod(spark, spec, source_df=test_data)
    assert [a["type"] for a in m.actions] == ["get_data", "run_script", "assign_class"]
    res = m.apply()
    assert {r["SexDecoded"] for r in res.df.collect()} == {"Male", "Female"}
    assert res.new_nodes[0].count() == 2


def test_subject_level_link_supermethod(spark, test_data):
    spec = {
        "name": "sll",
        "actions": [
            {"type": "get_data"},
            {"type": "subject_level_link", "class": "Age",
             "subject_column": "Subject", "value_column": "Age"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    assert len(res.new_edges) == 1 and res.new_edges[0].count() == 3


def test_link_stat_action(spark, test_data):
    """D7: stat node per dimension combo + edges from dimension ids."""
    spec = {
        "name": "ls",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Study", "value_column": "Study"},
            {"type": "run_script", "script": "group_by",
             "params": {"by": ["Study", "_id_Study"], "value_cols": ["Age"], "stats": ["mean"]}},
            {"type": "link_stat", "class": "Mean Age", "uri_by": ["Study"],
             "value_col": "mean_Age", "link_from": ["_id_Study"]},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    stat_nodes = res.new_nodes[1]
    assert stat_nodes.count() == 1
    row = stat_nodes.collect()[0]
    assert row["rdfs_label"] == "30.0" and row["uri"] == "Mean Age_by/STUDY1"
    assert res.new_edges[0].count() == 1


def test_build_terms_for_distinct_values(spark, test_data):
    from tab2neo_spark.model.metadata import MetadataModel

    m = MetadataModel()
    terms = m.build_terms_for_distinct_values(
        test_data.selectExpr("Sex as rdfs_label"), "Sex", "CL.SEX"
    )
    assert [(t.term_code, t.order) for t in terms] == [("F", 1), ("M", 2)]
    assert len(m.terms) == 2


def test_registry_scalar_transforms(spark, test_data):
    from tab2neo_spark.pipeline.registry import get_transform

    divided = get_transform("divide")(
        test_data, numerator="Age", denominator="TestValue",
        new_column="ratio", decimal_places=2,
    )
    assert {r["ratio"] for r in divided.collect()} == {15.0, 26.67, 6.67}

    mult = get_transform("multiply")(
        test_data, column="Age", by=100.0, new_column="pct"
    )
    assert {r["pct"] for r in mult.collect()} == {3000.0, 4000.0, 2000.0}

    renamed = get_transform("rename_columns")(test_data, mapping={"Age": "AGE"})
    assert "AGE" in renamed.columns and "Age" not in renamed.columns

    ct = get_transform("ct_cartesian_product")(
        test_data.select("Subject"), values=["A", "B"], column="arm"
    )
    assert ct.count() == 6

    ht = get_transform("head_tail")(test_data, n=1, order_by=["Age"])
    ages = sorted(r["Age"] for r in ht.collect())
    assert ages == [20, 40]


def test_pack_map_operator(spark, test_data):
    from tab2neo_spark.operators.packing import pack_map

    out = pack_map(test_data, ["Study"], "Subject", "Age", out_col="ages")
    m = out.collect()[0]["ages"]
    assert dict(m) == {"S001": 30, "S002": 40, "S003": 20}
