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


# ---------------------------------------------------------------------------
# D6 Link scenarios 2/3/4 (action.py:1550-1596), CT validation, CLD_NAN
# ---------------------------------------------------------------------------


def test_link_scenario_2_literal_to_node(spark, test_data):
    """Merge ONE node by literal value, link every row's from node to it,
    write the merged id back to the df."""
    spec = {
        "name": "lit_to",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
            {"type": "link", "relationship_type": "IN_POPULATION",
             "from_id": "_id_Subject", "to_class": "Population",
             "to_value": "SAFETY"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    # one merged Population node
    pop = res.new_nodes[-1].collect()
    assert len(pop) == 1 and pop[0]["rdfs_label"] == "SAFETY"
    # every subject linked to the single node
    edges = res.new_edges[-1].collect()
    assert len(edges) == 3
    assert len({e["dst"] for e in edges}) == 1
    assert {e["dst"] for e in edges} == {pop[0]["node_id"]}
    # id writeback for further processing (action.py:1565-1567)
    assert "_id_Population" in res.df.columns
    assert res.df.select("_id_Population").distinct().count() == 1


def test_link_scenario_3_literal_from_node(spark, test_data):
    spec = {
        "name": "lit_from",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
            {"type": "link", "relationship_type": "HAS_SUBJECT",
             "from_class": "Study", "from_value": "STUDY1",
             "to_id": "_id_Subject"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    edges = res.new_edges[-1].collect()
    assert len(edges) == 3 and len({e["src"] for e in edges}) == 1
    assert "_id_Study" in res.df.columns


def test_link_scenario_4_both_literal(spark, test_data):
    spec = {
        "name": "lit_both",
        "actions": [
            {"type": "get_data"},
            {"type": "link", "relationship_type": "PART_OF",
             "from_class": "Study", "from_value": "STUDY1",
             "to_class": "Project", "to_value": "PROJ9"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    edges = res.new_edges[-1].collect()
    assert len(edges) == 1
    nodes = {(r["class"], r["rdfs_label"])
             for part in res.new_nodes for r in part.collect()}
    assert nodes == {("Study", "STUDY1"), ("Project", "PROJ9")}


def test_literal_node_id_unifies_with_assign_class(spark, test_data):
    """Scenario-2 merged node ids match assign_class-derived ids for the
    same (class, value) — MERGE semantics across actions."""
    spec = {
        "name": "unify",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Study", "value_column": "Study"},
            {"type": "link", "relationship_type": "X",
             "from_id": "_id_Study", "to_class": "Study", "to_value": "STUDY1"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    derived = {r["node_id"] for r in res.new_nodes[0].collect()}
    literal = {r["node_id"] for r in res.new_nodes[1].collect()}
    assert literal <= derived


def test_assign_class_ct_validation(spark, test_data):
    """action.py:1651-1654: non-compliant derived values raise."""
    ok = {
        "name": "ct_ok",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Sex", "value_column": "Sex",
             "ct": ["M", "F"]},
        ],
    }
    DerivationMethod(spark, ok, source_df=test_data).apply()
    bad = {
        "name": "ct_bad",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Sex", "value_column": "Sex",
             "ct": ["M"]},
        ],
    }
    with pytest.raises(ValueError, match="controlled terminology"):
        DerivationMethod(spark, bad, source_df=test_data).apply()


def test_assign_class_keep_nulls_cld_nan(spark):
    """action.py:1656-1660: with keep_nulls, null values merge into ONE
    node per class whose value property is NULL."""
    df = spark.createDataFrame(
        [("S1", "M"), ("S2", None), ("S3", None)], "Subject string, Sex string"
    )
    spec = {
        "name": "nan",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Sex", "value_column": "Sex",
             "keep_nulls": True},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=df).apply()
    nodes = res.new_nodes[0].collect()
    assert len(nodes) == 2  # 'M' + the single NULL node
    null_nodes = [n for n in nodes if n["rdfs_label"] is None]
    assert len(null_nodes) == 1
    # both null rows share the null node's id
    ids = res.df.select("Subject", "_id_Sex").collect()
    by_subj = {r["Subject"]: r["_id_Sex"] for r in ids}
    assert by_subj["S2"] == by_subj["S3"] == null_nodes[0]["node_id"]
    assert by_subj["S1"] != by_subj["S2"]


def test_method_json_round_trip(spark, test_data):
    """D14 retrieve_json analog: spec -> arrows graph JSON -> spec, lossless
    (mirrors the reference's expected_action_json golden fixtures)."""
    spec = {
        "name": "derive_newv",
        "actions": [
            {"type": "get_data"},
            {"type": "run_script", "script": "multiply_cols",
             "params": {"columns": ["Age", "TestValue"], "new_column": "NEWV"}},
            {"type": "filter", "where_map": {"NEWV": {"min": "10"}}},
            {"type": "assign_class", "class": "NewValue", "value_column": "NEWV"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
            {"type": "link", "relationship_type": "HAS_NEWV",
             "from_id": "_id_Subject", "to_id": "_id_NewValue"},
        ],
    }
    m = DerivationMethod(spark, spec, source_df=test_data)
    dct = m.to_arrows_json()
    # golden-shape checks: core Method node, METHOD_ACTION per action, NEXT chain
    assert dct["nodes"][0] == {
        "id": "core0", "position": {}, "caption": "",
        "labels": ["Method"], "properties": {"id": "derive_newv"},
    }
    assert sum(1 for r in dct["relationships"] if r["type"] == "METHOD_ACTION") == 6
    assert sum(1 for r in dct["relationships"] if r["type"] == "NEXT") == 5
    assert dct["nodes"][2]["labels"] == ["Method", "run_script"]

    m2 = DerivationMethod.from_arrows_json(spark, dct, source_df=test_data)
    assert m2.name == m.name
    assert m2.actions == m.actions
    # double round-trip is a fixpoint
    assert m2.to_arrows_json() == dct
    # and the reconstructed method still runs
    res = m2.apply()
    assert res.df.count() == 3


def test_method_json_round_trip_supermethod(spark, test_data):
    """Supermethods serialize EXPANDED (primitive actions), like the
    reference persisting the compiled NEXT chain."""
    spec = {
        "name": "sup",
        "actions": [
            {"type": "get_data"},
            {"type": "subject_level_link", "class": "Age",
             "subject_column": "Subject", "value_column": "Age"},
        ],
    }
    m = DerivationMethod(spark, spec, source_df=test_data)
    dct = m.to_arrows_json()
    m2 = DerivationMethod.from_arrows_json(spark, dct, source_df=test_data)
    assert [a["type"] for a in m2.actions] == [
        "get_data", "assign_class", "assign_class", "link"
    ]
    assert m2.actions == m.actions


def test_predict_links_from_schema(spark, test_data):
    """D13 predict_links (derivation_method.py:891-947): schema rels between
    predicted output classes become link actions; applying them produces
    the edges."""
    from tab2neo_spark.model.metadata import MetadataModel

    m = MetadataModel()
    m.create_class("Subject")
    m.create_class("Age")
    m.create_relationship("Subject", "Age", "HAS_AGE")
    spec = {
        "name": "pl",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
            {"type": "assign_class", "class": "Age", "value_column": "Age"},
        ],
    }
    dm = DerivationMethod(spark, spec, source_df=test_data)
    assert dm.predicted_output_classes() == ["Subject", "Age"]
    predicted = dm.predict_links(m)
    assert predicted == [{"type": "link", "relationship_type": "HAS_AGE",
                          "from_id": "_id_Subject", "to_id": "_id_Age"}]
    assert dm.merge_link_actions_from_schema(m) == 1
    # an existing link action suppresses re-prediction
    assert dm.predict_links(m) == []
    res = dm.apply()
    assert res.new_edges[0].count() == 3  # one HAS_AGE edge per subject


def test_merge_build_uri_from_schema(spark, test_data):
    """D13 merge_build_uri_from_schema (derivation_method.py:1060-1108):
    classes_for_uri='A|B' appends a build_uri action keyed by those
    columns."""
    from tab2neo_spark.model.metadata import ClassSpec, MetadataModel

    m = MetadataModel()
    m.classes["NewValue"] = ClassSpec(
        "NewValue", short_label="NEWV", classes_for_uri="Study|Subject"
    )
    spec = {
        "name": "bu",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "NewValue", "value_column": "Age"},
        ],
    }
    dm = DerivationMethod(spark, spec, source_df=test_data)
    assert dm.merge_build_uri_from_schema(m) == 1
    assert dm.actions[-1] == {
        "type": "build_uri", "for": "NewValue", "prefix": "NewValue",
        "by": ["Study", "Subject"], "column": "_uri_NEWV",
    }
    res = dm.apply()
    uris = {r["_uri_NEWV"] for r in res.df.collect()}
    assert uris == {"NewValue_by/STUDY1/S001", "NewValue_by/STUDY1/S002",
                    "NewValue_by/STUDY1/S003"}


def test_assign_label_extra_label(spark, test_data):
    """D5 id-list form (action.py:1300-1337): extra label on existing
    nodes + id-column mirror."""
    spec = {
        "name": "al",
        "actions": [
            {"type": "get_data"},
            {"type": "assign_class", "class": "Subject", "value_column": "Subject"},
            {"type": "assign_label", "class": "Enrolled", "on": "Subject"},
        ],
    }
    res = DerivationMethod(spark, spec, source_df=test_data).apply()
    labels = res.new_labels[0].collect()
    assert len(labels) == 3
    assert {r["extra_label"] for r in labels} == {"Enrolled"}
    rows = res.df.select("_id_Subject", "_id_Enrolled").collect()
    assert all(r["_id_Subject"] == r["_id_Enrolled"] for r in rows)
    assert res.label_actions == [2]


def test_method_loading_by_file_and_name(spark, test_data, tmp_path):
    """D1 spec factory: plain-spec file, method-graph file, and by-name."""
    import json as _json

    spec = {
        "name": "m1",
        "actions": [
            {"type": "get_data"},
            {"type": "run_script", "script": "multiply_cols",
             "params": {"columns": ["Age", "TestValue"], "new_column": "NEWV"}},
        ],
    }
    p = tmp_path / "m1.json"
    p.write_text(_json.dumps(spec))
    m = DerivationMethod.from_name(spark, "m1", str(tmp_path), source_df=test_data)
    assert "NEWV" in m.apply().df.columns

    # graph-JSON file round-trips through the same factory
    g = tmp_path / "m2.json"
    g.write_text(_json.dumps(m.to_arrows_json()))
    m2 = DerivationMethod.from_json_file(spark, str(g), source_df=test_data)
    assert m2.actions == m.actions

    bad = tmp_path / "m3.json"
    bad.write_text("{}")
    with pytest.raises(ValueError, match="neither"):
        DerivationMethod.from_json_file(spark, str(bad), source_df=test_data)
