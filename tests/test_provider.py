"""Readback-engine tests (get_data_generic parity) — mirrors the
reference's golden-DataFrame style (tests/test_data_providers/test_dp2.py)
with a pandas oracle instead of a live Neo4j."""

from __future__ import annotations

import pytest

from tab2neo_spark.datagen import pages_from_documents
from tab2neo_spark.kg.construct import construct_kg
from tab2neo_spark.kg.oracle import canonical_lookup, oracle_triples
from tab2neo_spark.model.gazetteer import webtext_model
from tab2neo_spark.provider import DataProvider, QuerySpecError


@pytest.fixture(scope="module")
def kg(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir).limit(150).cache()
    kg = construct_kg(spark, pages, unique_urls=True)
    kg.nodes.cache().count()
    kg.edges.cache().count()
    return kg


@pytest.fixture(scope="module")
def provider(spark, kg):
    return DataProvider(spark, webtext_model(), kg.nodes, kg.edges)


@pytest.fixture(scope="module")
def expected_mentions(kg):
    pdf = kg.pages.select("url", "html").toPandas()
    pdf["html"] = pdf["html"].map(bytes)
    triples = oracle_triples(pdf)
    return {(s, o) for s, p, o in triples if p == "MENTIONS"}


def test_basic_two_class_readback(provider, expected_mentions):
    got = provider.get_data(["Page", "Operator"], rels=[
        {"from": "Page", "to": "Operator", "type": "MENTIONS"}
    ])
    rows = {(r["Page"], r["Operator"]) for r in got.collect()}
    exp = {
        (u, o.split(":", 1)[1]) for u, o in expected_mentions if o.startswith("Operator:")
    }
    assert rows == exp and len(rows) > 0


def test_infer_rels_from_schema(provider, expected_mentions):
    """No rels given -> schema inference picks Page-MENTIONS->Operator."""
    got = provider.get_data(["Page", "Operator"])
    exp = {
        (u, o.split(":", 1)[1]) for u, o in expected_mentions if o.startswith("Operator:")
    }
    assert {(r["Page"], r["Operator"]) for r in got.collect()} == exp


def test_where_map_filter(provider, expected_mentions):
    got = provider.get_data(
        ["Page", "Operator"],
        where_map={"Operator": {"rdfs:label": "join"}},
    )
    exp = {(u, "join") for u, o in expected_mentions if o == "Operator:join"}
    assert {(r["Page"], r["Operator"]) for r in got.collect()} == exp


def test_excluded_class_joins_but_is_dropped(provider, expected_mentions):
    """'!!' marker: class participates in the join, not in the output."""
    got = provider.get_data(
        ["Page", "Operator!!"],
        where_map={"Operator": {"rdfs:label": "join"}},
    )
    assert got.columns == ["Page"]
    exp = {u for u, o in expected_mentions if o == "Operator:join"}
    assert {r["Page"] for r in got.collect()} == exp


def test_optional_class_left_join(provider, expected_mentions):
    """'**' marker: pages without an Engine mention still return (null)."""
    got = provider.get_data(["Page", "Engine**"]).collect()
    with_engine = {u for u, o in expected_mentions if o.startswith("Engine:")}
    all_pages = {r["Page"] for r in got}
    assert {r["Page"] for r in got if r["Engine"] is not None} == with_engine
    assert with_engine < all_pages  # some pages have no engine mention


def test_disconnected_labels_rejected(provider):
    m = provider.model
    with pytest.raises(QuerySpecError, match="disconnected"):
        provider.get_data(["Operator", "Engine"], rels=[], infer_rels=False)


def test_allow_unrelated_subgraphs_cross_join(provider):
    ops = provider.get_data(["Operator"]).count()
    engines = provider.get_data(["Engine"]).count()
    cross = provider.get_data(
        ["Operator", "Engine"], rels=[], infer_rels=False,
        allow_unrelated_subgraphs=True,
    )
    assert cross.count() == ops * engines


def test_where_rel_map_exists(provider, expected_mentions):
    """Operators mentioned by at least one page (EXISTS via semi-join)."""
    got = provider.get_data(
        ["Operator"],
        where_rel_map={"Operator": {"EXISTS": {"include": ["Page"]}}},
    )
    exp = {o.split(":", 1)[1] for _, o in expected_mentions if o.startswith("Operator:")}
    assert {r["Operator"] for r in got.collect()} == exp


def test_shortlabel_and_limit(provider):
    got = provider.get_data(["Page", "Operator"], use_shortlabel=True, limit=5)
    assert got.columns == ["PG", "OP"]
    assert got.count() == 5


def test_canonicalized_values_in_readback(provider):
    """'sort'/'order' mentions surface as canonical 'order' only."""
    vals = {r["Operator"] for r in provider.get_data(["Operator"]).collect()}
    canon = canonical_lookup()
    assert "sort" not in vals
    assert canon["sort"] in vals


def test_labels_to_pack(provider, expected_mentions):
    """A1 packing: one row per page, operators collected sorted."""
    got = provider.get_data(["Page", "Operator"], labels_to_pack=["Operator"])
    assert got.columns == ["Page", "Operators"]
    rows = {r["Page"]: list(r["Operators"]) for r in got.collect()}
    exp = {}
    for u, o in expected_mentions:
        if o.startswith("Operator:"):
            exp.setdefault(u, set()).add(o.split(":", 1)[1])
    assert rows == {u: sorted(v) for u, v in exp.items()}


def test_only_props_from_props_map(spark, kg):
    """P3: pull open-prop keys (lang) alongside the canonical value."""
    dp = DataProvider(spark, webtext_model(), kg.nodes, kg.edges)
    got = dp.get_data(["Page"], only_props={"Page": ["lang"]})
    assert got.columns == ["Page", "Page_lang"]
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["Page_lang"] in {"en", "de", "fr", "es", "zh"} for r in rows)


# ---------------------------------------------------------------------------
# where_rel_map full dialect (query_builder.py:300-355): exclude, directional
# EXISTS>/EXISTS<, property-dict items, include_matched/exclude_matched
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rel_dialect_dp(spark):
    """Tiny hand-built graph with known direction/class structure:

    a1 -REL-> b1,  a2 -REL-> b1,  a2 -REL-> b2,  b1 -REL-> a3,  a1 -LINK-> c1
    """
    from tab2neo_spark.model.metadata import MetadataModel

    nodes = spark.createDataFrame(
        [
            (1, "A", "a1", None, None),
            (2, "A", "a2", None, None),
            (3, "A", "a3", None, None),
            (4, "B", "b1", None, None),
            (5, "B", "b2", None, None),
            (6, "C", "gamma", None, {"grade": "x"}),
        ],
        "node_id long, class string, rdfs_label string, uri string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, "REL", 4), (2, "REL", 4), (2, "REL", 5), (4, "REL", 3), (1, "LINK", 6)],
        "src long, rel_type string, dst long",
    )
    m = MetadataModel()
    for c in ("A", "B", "C"):
        m.create_class(c)
    m.create_relationship("A", "B", "REL")
    return DataProvider(spark, m, nodes, edges)


def _a_set(df):
    return {r["A"] for r in df.collect()}


def test_rel_map_exists_include_any_direction(rel_dialect_dp):
    got = rel_dialect_dp.get_data(
        ["A"], where_rel_map={"A": {"EXISTS": {"include": ["B"]}}}
    )
    assert _a_set(got) == {"a1", "a2", "a3"}  # a3 via incoming b1->a3


def test_rel_map_exists_directional(rel_dialect_dp):
    out = rel_dialect_dp.get_data(
        ["A"], where_rel_map={"A": {"EXISTS>": {"include": ["B"]}}}
    )
    assert _a_set(out) == {"a1", "a2"}  # outgoing only
    inc = rel_dialect_dp.get_data(
        ["A"], where_rel_map={"A": {"EXISTS<": {"include": ["B"]}}}
    )
    assert _a_set(inc) == {"a3"}  # incoming only
    neg = rel_dialect_dp.get_data(
        ["A"], where_rel_map={"A": {"NOT EXISTS>": {"include": ["B"]}}}
    )
    assert _a_set(neg) == {"a3"}


def test_rel_map_exclude(rel_dialect_dp):
    """exclude: EXISTS a neighbor whose class is NOT in the list."""
    got = rel_dialect_dp.get_data(
        ["A"], where_rel_map={"A": {"EXISTS": {"exclude": ["B"]}}}
    )
    assert _a_set(got) == {"a1"}  # only a1 has a non-B neighbor (c1)
    neg = rel_dialect_dp.get_data(
        ["A"], where_rel_map={"A": {"NOT EXISTS": {"exclude": ["B"]}}}
    )
    assert _a_set(neg) == {"a2", "a3"}


def test_rel_map_property_dict_item(rel_dialect_dp):
    """{Class: {prop: cond}} items: x.prop matches AND x:Class."""
    got = rel_dialect_dp.get_data(
        ["A"],
        where_rel_map={"A": {"EXISTS": {"include": [{"C": {"rdfs:label": "gamma"}}]}}},
    )
    assert _a_set(got) == {"a1"}
    # open-props map access
    got2 = rel_dialect_dp.get_data(
        ["A"],
        where_rel_map={"A": {"EXISTS": {"include": [{"C": {"grade": ["x", "y"]}}]}}},
    )
    assert _a_set(got2) == {"a1"}
    none = rel_dialect_dp.get_data(
        ["A"],
        where_rel_map={"A": {"EXISTS": {"include": [{"C": {"grade": "z"}}]}}},
    )
    assert _a_set(none) == set()


def test_rel_map_include_matched(rel_dialect_dp):
    """x IS one of the row's matched nodes (cross join then correlate)."""
    got = rel_dialect_dp.get_data(
        ["A", "B"], rels=[], infer_rels=False, allow_unrelated_subgraphs=True,
        where_rel_map={"A": {"EXISTS": {"include_matched": ["B"]}}},
    )
    rows = {(r["A"], r["B"]) for r in got.collect()}
    assert rows == {("a1", "b1"), ("a2", "b1"), ("a2", "b2"), ("a3", "b1")}
    # directional: only outgoing a->b edges qualify
    out = rel_dialect_dp.get_data(
        ["A", "B"], rels=[], infer_rels=False, allow_unrelated_subgraphs=True,
        where_rel_map={"A": {"EXISTS>": {"include_matched": ["B"]}}},
    )
    assert {(r["A"], r["B"]) for r in out.collect()} == {
        ("a1", "b1"), ("a2", "b1"), ("a2", "b2")
    }


def test_rel_map_exclude_matched(rel_dialect_dp):
    """EXISTS a B-class neighbor that is NOT the row's matched B node."""
    got = rel_dialect_dp.get_data(
        ["A", "B"],
        rels=[{"from": "A", "to": "B", "type": "REL"}],
        where_rel_map={"A": {"EXISTS>": {"include": ["B"], "exclude_matched": ["B"]}}},
    )
    rows = {(r["A"], r["B"]) for r in got.collect()}
    # a1's only outgoing B neighbor is b1 -> (a1,b1) drops; a2 has both
    assert rows == {("a2", "b1"), ("a2", "b2")}


def test_rel_map_unknown_keys_raise(rel_dialect_dp):
    with pytest.raises(QuerySpecError, match="mode"):
        rel_dialect_dp.get_data(
            ["A"], where_rel_map={"A": {"SOMETIMES EXISTS": {"include": ["B"]}}}
        )
    with pytest.raises(QuerySpecError, match="operators"):
        rel_dialect_dp.get_data(
            ["A"], where_rel_map={"A": {"EXISTS": {"includes": ["B"]}}}
        )
    with pytest.raises(QuerySpecError, match="not in the query"):
        rel_dialect_dp.get_data(
            ["A"], where_rel_map={"Z": {"EXISTS": {"include": ["B"]}}}
        )


def test_labels_to_pack_map_form(spark):
    """A1 map packing (query_builder.py:753-798): {label: key_class} packs
    label values into a map keyed by the key class's value; the key class
    is consumed into the map."""
    from tab2neo_spark.model.metadata import MetadataModel

    nodes = spark.createDataFrame(
        [
            (10, "S", "s1", None, None), (11, "S", "s2", None, None),
            (20, "G", "young", None, None), (21, "G", "old", None, None),
            (30, "D", "DEF_Y", None, None), (31, "D", "DEF_O", None, None),
        ],
        "node_id long, class string, rdfs_label string, uri string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(10, "HAS", 20), (11, "HAS", 21), (20, "DEF", 30), (21, "DEF", 31)],
        "src long, rel_type string, dst long",
    )
    m = MetadataModel()
    m.create_related_classes_from_list([["S", "G", "HAS"], ["G", "D", "DEF"]])
    dp = DataProvider(spark, m, nodes, edges)
    got = dp.get_data(
        ["S", "G", "D"],
        rels=[{"from": "S", "to": "G", "type": "HAS"},
              {"from": "G", "to": "D", "type": "DEF"}],
        labels_to_pack={"G": "D"},
    )
    assert set(got.columns) == {"S", "G_map"}
    rows = {r["S"]: dict(r["G_map"]) for r in got.collect()}
    assert rows == {"s1": {"DEF_Y": "young"}, "s2": {"DEF_O": "old"}}


def test_labels_to_pack_dict_list_value(provider, expected_mentions):
    """dict-with-list-value is the list-packing form (generate_with :790)."""
    got = provider.get_data(
        ["Page", "Operator"], labels_to_pack={"Operator": ["Page"]}
    )
    assert got.columns == ["Page", "Operators"]


def test_where_map_on_open_props(spark, kg):
    """where_map conditions on OPEN properties read the props map (the
    reference filters any ``n.`PROP``` uniformly): Page rows filter by
    lang before the join projection."""
    dp = DataProvider(spark, webtext_model(), kg.nodes, kg.edges)
    got = dp.get_data(["Page"], where_map={"Page": {"lang": ["en", "de"]}},
                      only_props={"Page": ["lang"]})
    rows = got.collect()
    assert len(rows) > 0
    assert {r["Page_lang"] for r in rows} <= {"en", "de"}
    # combined with a rel-joined class
    got2 = dp.get_data(
        ["Page", "Operator"], where_map={"Page": {"lang": "en"}},
        only_props={"Page": ["lang"]},
    )
    assert all(r["Page_lang"] == "en" for r in got2.collect())


def test_get_data_generic_knobs(spark):
    """Reference knob parity (data_provider.py:89-112): check_schema,
    return_class_uris, return_termorder, return_disjoint, pivot,
    use_rel_labels."""
    from tab2neo_spark.model.metadata import MetadataModel, TermSpec

    nodes = spark.createDataFrame(
        [
            (1, "Subject", "S1", "Subject_by/S1", None),
            (2, "Subject", "S2", "Subject_by/S2", None),
            (10, "Sex", "M", "Sex_by/M", None),
            (11, "Sex", "F", "Sex_by/F", None),
        ],
        "node_id long, class string, rdfs_label string, uri string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, "Sex", 10), (2, "Sex", 11)], "src long, rel_type string, dst long"
    )
    m = MetadataModel()
    m.create_related_classes_from_list([["Subject", "Sex", "Sex"]])
    m.set_short_label("Subject", "SUBJ")
    m.add_term(TermSpec("Sex", "CL.SEX", "F", "F", order=1))
    m.add_term(TermSpec("Sex", "CL.SEX", "M", "M", order=2))
    dp = DataProvider(spark, m, nodes, edges)

    # check_schema rejects unknown classes / rel types
    with pytest.raises(QuerySpecError, match="not in the schema"):
        dp.get_data(["Subject", "Ghost"], rels=[], infer_rels=False,
                    allow_unrelated_subgraphs=True, check_schema=True)
    with pytest.raises(QuerySpecError, match="relationships"):
        dp.get_data(["Subject", "Sex"],
                    rels=[{"from": "Subject", "to": "Sex", "type": "WRONG"}],
                    check_schema=True)

    # uris + term order + rel-level short_label override
    got = dp.get_data(
        ["Subject", "Sex"],
        rels=[{"from": "Subject", "to": "Sex", "type": "Sex", "short_label": "GENDER"}],
        use_shortlabel=True,
        return_class_uris=True,
        return_termorder=True,
    )
    assert set(got.columns) == {"SUBJ", "GENDER", "_uri_SUBJ", "_uri_GENDER",
                                "GENDER_order"}
    rows = {r["SUBJ"]: r for r in got.collect()}
    assert rows["S1"]["GENDER_order"] == 2  # M
    assert rows["S2"]["_uri_GENDER"] == "Sex_by/F"

    # return_disjoint: one row of per-class distinct sets
    dis = dp.get_data(["Subject", "Sex"], return_disjoint=True).collect()
    assert len(dis) == 1
    assert list(dis[0]["Subject_values"]) == ["S1", "S2"]
    assert list(dis[0]["Sex_values"]) == ["F", "M"]

    # pivot: map-packed column expands into real columns
    piv = dp.get_data(
        ["Subject", "Sex"], labels_to_pack={"Sex": "Subject"}, pivot=True
    )
    assert set(piv.columns) == {"S1", "S2"}
    row = piv.collect()[0]
    assert row["S1"] == "M" and row["S2"] == "F"


def test_split_out_optional_reference_case3(spark):
    """The reference's split_out_optional test case 3 verbatim
    (tests_query_builders test_split_out_optional): two optional branches
    sharing Visit — Visit lands in BOTH groups (bound-variable constraint)
    and the Exposure->Visit rel is re-stated in the Vitals group."""
    from tab2neo_spark.provider import RelSpec, _split_out_optional

    labels = ["Subject", "Sex", "Exposure", "Exposure Unit", "Visit",
              "Vitals", "Vitals Unit"]
    labels_opt = {"Exposure", "Exposure Unit", "Visit", "Vitals", "Vitals Unit"}
    pairs = [("Subject", "Sex"), ("Subject", "Exposure"),
             ("Exposure", "Exposure Unit"), ("Exposure", "Visit"),
             ("Subject", "Vitals"), ("Vitals", "Vitals Unit"),
             ("Vitals", "Visit")]
    rels = [RelSpec(a, b, b, optional=i > 0) for i, (a, b) in enumerate(pairs)]
    got = _split_out_optional(labels, rels, labels_opt)
    got_shape = [(ls, [(r.from_label, r.to_label) for r in rs]) for ls, rs in got]
    assert got_shape == [
        (["Subject", "Sex"], [("Subject", "Sex")]),
        (["Exposure", "Exposure Unit", "Visit"],
         [("Subject", "Exposure"), ("Exposure", "Exposure Unit"),
          ("Exposure", "Visit")]),
        (["Vitals", "Visit", "Vitals Unit"],
         [("Subject", "Vitals"), ("Vitals", "Vitals Unit"),
          ("Vitals", "Visit"), ("Exposure", "Visit")]),
    ]


def _chain_graph(spark):
    """S -HAS-> E -HAS_U-> U where e2 has NO unit and s3 has NO exposure —
    the shape that distinguishes atomic optional groups from sequential
    left joins."""
    from tab2neo_spark.model.metadata import MetadataModel

    nodes = spark.createDataFrame(
        [(1, "S", "s1", None, None), (2, "S", "s2", None, None),
         (3, "S", "s3", None, None),
         (10, "E", "e1", None, None), (20, "E", "e2", None, None),
         (100, "U", "mg", None, None)],
        "node_id long, class string, rdfs_label string, uri string, "
        "props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, "HAS", 10), (2, "HAS", 20), (10, "HAS_U", 100)],
        "src long, rel_type string, dst long",
    )
    m = MetadataModel()
    m.create_related_classes_from_list([["S", "E", "HAS"], ["E", "U", "HAS_U"]])
    return DataProvider(spark, m, nodes, edges)


def test_optional_group_is_atomic(spark):
    """Cypher parity: OPTIONAL MATCH (s)--(e)--(u) is all-or-nothing — an
    exposure WITHOUT a unit must yield NULL for BOTH optional columns
    (sequential left joins would leak the partial e2 match)."""
    dp = _chain_graph(spark)
    got = {(r["S"], r["E"], r["U"])
           for r in dp.get_data(["S", "E**", "U**"]).collect()}
    assert got == {("s1", "e1", "mg"), ("s2", None, None), ("s3", None, None)}


def test_optional_single_class_still_left_joins(spark):
    """One-hop optional is unchanged: e-level matches survive without u."""
    dp = _chain_graph(spark)
    got = {(r["S"], r["E"]) for r in dp.get_data(["S", "E**"]).collect()}
    assert got == {("s1", "e1"), ("s2", "e2"), ("s3", None)}


def test_typeless_rel_matches_any_relationship(spark):
    """A rel spec without a type matches ANY relationship type between the
    classes (the reference's impute_relationship_type=False / type-less
    arrows rels, tests_query_builders test_get_rels_btw2 None-type rows)."""
    dp = _chain_graph(spark)
    got = {(r["S"], r["E"])
           for r in dp.get_data(["S", "E"],
                                rels=[{"from": "S", "to": "E"}]).collect()}
    assert got == {("s1", "e1"), ("s2", "e2")}


def test_independent_optional_branches_match_independently(spark):
    """Two optional branches anchored separately to the core are separate
    groups: one matching must not depend on the other (only SHARED labels
    couple groups)."""
    from tab2neo_spark.model.metadata import MetadataModel

    nodes = spark.createDataFrame(
        [(1, "S", "s1", None, None), (2, "S", "s2", None, None),
         (10, "X", "x1", None, None), (20, "Y", "y2", None, None)],
        "node_id long, class string, rdfs_label string, uri string, "
        "props map<string,string>",
    )
    # s1 has only an X; s2 has only a Y
    edges = spark.createDataFrame(
        [(1, "HX", 10), (2, "HY", 20)], "src long, rel_type string, dst long"
    )
    m = MetadataModel()
    m.create_related_classes_from_list([["S", "X", "HX"], ["S", "Y", "HY"]])
    dp = DataProvider(spark, m, nodes, edges)
    got = {(r["S"], r["X"], r["Y"])
           for r in dp.get_data(["S", "X**", "Y**"]).collect()}
    assert got == {("s1", "x1", None), ("s2", None, "y2")}


def test_where_map_inside_optional_group_yields_nulls(spark):
    """A where condition on an optional class filters INSIDE the pattern:
    non-matching rows surface as NULLs, they are not dropped (Cypher's
    OPTIONAL MATCH ... WHERE semantics)."""
    dp = _chain_graph(spark)
    got = {(r["S"], r["E"])
           for r in dp.get_data(
               ["S", "E**"], where_map={"E": {"rdfs:label": "e1"}}
           ).collect()}
    assert got == {("s1", "e1"), ("s2", None), ("s3", None)}


def test_diamond_optional_pattern_no_duplicate_labels(spark):
    """Diamond: V reachable from E and EU inside ONE group must appear in
    that group once (previously duplicated -> AMBIGUOUS_REFERENCE)."""
    from tab2neo_spark.model.metadata import MetadataModel

    nodes = spark.createDataFrame(
        [(1, "S", "s1", None, None), (10, "E", "e1", None, None),
         (20, "EU", "u1", None, None), (30, "V", "v1", None, None)],
        "node_id long, class string, rdfs_label string, uri string, "
        "props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, "HE", 10), (10, "HU", 20), (10, "HV", 30), (20, "UV", 30)],
        "src long, rel_type string, dst long",
    )
    m = MetadataModel()
    m.create_related_classes_from_list(
        [["S", "E", "HE"], ["E", "EU", "HU"], ["E", "V", "HV"],
         ["EU", "V", "UV"]]
    )
    dp = DataProvider(spark, m, nodes, edges)
    got = {tuple(r) for r in dp.get_data(["S", "E**", "EU**", "V**"]).collect()}
    assert got == {("s1", "e1", "u1", "v1")}


def test_all_optional_query_keeps_null_tails(spark):
    """['A**','B**']: the first optional label anchors the plan; rows with
    no B keep a NULL tail (previously the inner pattern dropped them)."""
    from tab2neo_spark.model.metadata import MetadataModel

    nodes = spark.createDataFrame(
        [(1, "A", "a1", None, None), (2, "A", "a2", None, None),
         (10, "B", "b1", None, None)],
        "node_id long, class string, rdfs_label string, uri string, "
        "props map<string,string>",
    )
    edges = spark.createDataFrame([(1, "AB", 10)],
                                  "src long, rel_type string, dst long")
    m = MetadataModel()
    m.create_related_classes_from_list([["A", "B", "AB"]])
    dp = DataProvider(spark, m, nodes, edges)
    got = {(r["A"], r["B"]) for r in dp.get_data(["A**", "B**"]).collect()}
    assert got == {("a1", "b1"), ("a2", None)}
