"""ModelManager CT-lifecycle + propagation long tail, mirroring the
reference's tests_model_manager/test_mm2.py assertions (create_ct:363-470,
same_as_ct:473-560, delete_ct:562-584, get_class_ct_map:586-607,
get_all_ct:609-636, get_class_ct:903-919, propagate_rels:921-963,
get_missing_classes:124-144, create_custom_rels_from_list:
model_manager.py:1201-1243)."""

from __future__ import annotations

import pytest

from tab2neo_spark.model.metadata import MetadataModel, RelSpec


def _mm_with_classes(*labels, short=None):
    m = MetadataModel()
    for lb in labels:
        m.create_class(lb)
    for lb, sl in (short or {}).items():
        m.create_class(lb)
        m.set_short_label(lb, sl)
    return m


def test_create_ct_ordering_and_increment():
    """Mirrors test_mm2.py:363-414: fresh orders 1..n per class; a later
    create_ct continues from the class's max; NEXT derives from Order."""
    m = _mm_with_classes("G", "S", "K")
    m.create_ct({
        "G": [{"Codelist Code": "term1"}, {"Codelist Code": "term2"}],
        "S": [{"Codelist Code": "term3"}],
    })
    res = m.get_class_ct_map(classes=["G", "S", "K"],
                             ct_props=["Codelist Code", "Order"])
    assert sorted(res["G"], key=lambda d: d["Codelist Code"]) == [
        {"Codelist Code": "term1", "Order": 1},
        {"Codelist Code": "term2", "Order": 2},
    ]
    assert res["S"] == [{"Codelist Code": "term3", "Order": 1}]
    assert "K" not in res  # no terms -> absent, not []

    m.create_ct({"S": [{"Codelist Code": "term4"}]})
    res = m.get_class_ct_map(classes=["S"], ct_props=["Codelist Code", "Order"])
    assert sorted(res["S"], key=lambda d: d["Codelist Code"]) == [
        {"Codelist Code": "term3", "Order": 1},
        {"Codelist Code": "term4", "Order": 2},
    ]

    # order_terms=False leaves Order None
    m.create_ct({"K": [{"Codelist Code": "term5"}, {"Codelist Code": "term6"}]},
                order_terms=False)
    res = m.get_class_ct_map(classes=["K"], ct_props=["Codelist Code", "Order"])
    assert sorted(res["K"], key=lambda d: d["Codelist Code"]) == [
        {"Codelist Code": "term5", "Order": None},
        {"Codelist Code": "term6", "Order": None},
    ]

    with pytest.raises(AssertionError):
        m.create_ct({"X": [{"Codelist Code": "term7"}]})


def test_create_ct_short_label_identifier_and_merge_update():
    """Mirrors test_mm2.py:434-470: short_label identifier; merge_on
    updates the matched term's given props and keeps its Order."""
    m = _mm_with_classes(short={"Class A": "A"})
    m.create_ct({"A": [{"Codelist Code": "term7"}]}, "short_label",
                merge_on=["Codelist Code"])
    res = m.get_class_ct_map(classes=["A"], ct_props=["Codelist Code", "Order"],
                             identifier="short_label")
    assert res["A"] == [{"Codelist Code": "term7", "Order": 1}]

    m2 = _mm_with_classes("Apple", "Banana")
    m2.create_ct({
        "Apple": [
            {"Codelist Code": "term1c", "Term Code": "term1t", "Order": 2,
             "rdfs:label": "original"},
            {"Codelist Code": "term3c", "Term Code": "term3t", "Order": 1},
        ],
        "Banana": [{"Codelist Code": "term2c", "Term Code": "term2t", "Order": 1}],
    }, order_terms=False)
    m2.create_ct({
        "Apple": [{"Codelist Code": "term1c", "Term Code": "term1t",
                   "rdfs:label": "updated"}],
    }, merge_on=["Codelist Code", "Term Code"])
    res = m2.get_all_ct(term_props=["Codelist Code", "Term Code",
                                    "rdfs:label", "Order"])
    assert sorted(res, key=lambda d: d["Codelist Code"]) == [
        {"label": "Apple", "Codelist Code": "term1c", "Term Code": "term1t",
         "rdfs:label": "updated", "Order": 2},
        {"label": "Banana", "Codelist Code": "term2c", "Term Code": "term2t",
         "rdfs:label": None, "Order": 1},
        {"label": "Apple", "Codelist Code": "term3c", "Term Code": "term3t",
         "rdfs:label": None, "Order": 1},
    ]


def test_get_class_ct():
    """Mirrors test_mm2.py:903-919."""
    m = _mm_with_classes("Test Class", "Test Class 2")
    m.create_ct({
        "Test Class": [
            {"Codelist Code": "CODELISTCODE", "Term Code": "TERMCODE",
             "rdfs:label": "test term text 1"},
            {"Codelist Code": "CODELISTCODE", "Term Code": "TERMCODE2",
             "rdfs:label": "test term text 2"},
        ],
        "Test Class 2": [
            {"Codelist Code": "CODELISTCODE", "Term Code": "TERMCODE3",
             "rdfs:label": "test term text 3"},
        ],
    })
    assert set(m.get_class_ct("Test Class")) == {"test term text 1",
                                                 "test term text 2"}
    # distinct: both terms share the codelist code
    assert m.get_class_ct("Test Class", "Codelist Code") == ["CODELISTCODE"]


def test_same_as_ct_create_and_remove():
    """Mirrors test_mm2.py:473-560 incl. the short_label identifier form."""
    def fresh():
        m = _mm_with_classes(short={"Avocado": "A", "Banana": "B"})
        m.create_ct({
            "Avocado": [{"Codelist Code": "term1c", "Term Code": "term1t"}],
            "Banana": [{"Codelist Code": "term2c", "Term Code": "term2t"}],
        }, order_terms=False)
        return m

    m = fresh()
    m.create_same_as_ct([
        {"from_class": "Avocado", "to_class": "Banana",
         "from_codelist_code": "term1c", "to_codelist_code": "term2c"}
    ], ["Codelist Code"])
    assert [(a[1], b[1]) for a, b in m.term_same_as] == [("term1c", "term2c")]

    m = fresh()
    m.create_same_as_ct([
        {"from_class": "B", "to_class": "A",
         "from_codelist_code": "term2c", "to_codelist_code": "term1c",
         "from_term_code": "term2t", "to_term_code": "term1t"}
    ], ["Codelist Code", "Term Code"], identifier="short_label")
    assert [(a[1], b[1]) for a, b in m.term_same_as] == [("term2c", "term1c")]
    # nonexistent term: MATCH finds nothing, nothing created
    n = m.create_same_as_ct([
        {"from_class": "B", "to_class": "A",
         "from_codelist_code": "nope", "to_codelist_code": "term1c",
         "from_term_code": "x", "to_term_code": "term1t"}
    ], ["Codelist Code", "Term Code"], identifier="short_label")
    assert n == 0 and len(m.term_same_as) == 1

    m.remove_same_as_ct([
        {"from_class": "B", "to_class": "A",
         "from_codelist_code": "term2c", "to_codelist_code": "term1c",
         "from_term_code": "term2t", "to_term_code": "term1t"}
    ], ["Codelist Code", "Term Code"], identifier="short_label")
    assert m.term_same_as == []


def test_delete_ct():
    """Mirrors test_mm2.py:562-584: per-class deletes by Codelist Code,
    label then short_label identifier; SAME_AS of deleted terms goes too."""
    m = _mm_with_classes(short={"Subject": "USUBJID",
                                "Exposure Name of Treatment": "EXTRT"})
    m.create_ct({
        "Subject": [
            {"Codelist Code": "Codelist1", "Term Code": "T1"},
            {"Codelist Code": "Codelist2", "Term Code": "T2"},
        ],
        "Exposure Name of Treatment": [
            {"Codelist Code": "Codelist1", "Term Code": "T3"},
            {"Codelist Code": "Codelist3", "Term Code": "T4"},
        ],
    }, order_terms=False)
    m.create_same_as_ct([
        {"from_class": "Subject", "to_class": "Exposure Name of Treatment",
         "from_codelist_code": "Codelist2", "to_codelist_code": "Codelist3"}
    ], ["Codelist Code"])
    assert len(m.term_same_as) == 1

    assert m.delete_ct({"Subject": [["Codelist2"]]}, ["Codelist Code"]) == 1
    res = m.get_class_ct_map(["Subject", "Exposure Name of Treatment"],
                             ct_props=["Codelist Code"])
    assert res["Subject"] == [{"Codelist Code": "Codelist1"}]
    assert len(res["Exposure Name of Treatment"]) == 2
    # DETACH DELETE took the SAME_AS with it
    assert m.term_same_as == []

    assert m.delete_ct({"EXTRT": [["Codelist1"]]}, ["Codelist Code"],
                       identifier="short_label") == 1
    res = m.get_class_ct_map(["Exposure Name of Treatment"],
                             ct_props=["Codelist Code"])
    assert res["Exposure Name of Treatment"] == [{"Codelist Code": "Codelist3"}]


def test_get_missing_classes():
    """Mirrors test_mm2.py:124-144."""
    m = _mm_with_classes("A", "B", short={"C": "c_short"})
    assert m.get_missing_classes(["A", "B", "C"]) == set()
    assert m.get_missing_classes(["A", "X", "Y"]) == {"X", "Y"}
    assert m.get_missing_classes(["c_short"], identifier="short_label") == set()
    assert m.get_missing_classes(["A"], identifier="short_label") == {"A"}


def test_propagate_rels_to_parent_class():
    """Mirrors test_mm2.py:921-940: A-SUBCLASS_OF->B-SUBCLASS_OF->C; a rel
    (A)-type1->(D) propagates so (C)-type1->(D) exists."""
    m = _mm_with_classes("A", "B", "C", "D")
    m.create_subclass("B", "A")
    m.create_subclass("C", "B")
    m.create_relationship("A", "D", "type1")
    m.propagate_rels_to_parent_class()
    assert RelSpec("C", "D", "type1") in m.relationships
    assert RelSpec("B", "D", "type1") in m.relationships
    # idempotent
    assert m.propagate_rels_to_parent_class() == 0


def test_propagate_rels_to_child_class():
    """Mirrors test_mm2.py:942-963: rels on C copy down to A (and B)."""
    m = _mm_with_classes("A", "B", "C", "D", "E")
    m.create_subclass("B", "A")
    m.create_subclass("C", "B")
    m.create_relationship("C", "D", "type1")
    m.create_relationship("C", "E", "typeE")
    m.propagate_rels_to_child_class()
    assert RelSpec("A", "D", "type1") in m.relationships
    assert RelSpec("A", "E", "typeE") in m.relationships
    assert RelSpec("B", "D", "type1") in m.relationships


def test_propagate_rels_direction_preserved():
    """A rel pointing INTO the child propagates keeping direction: with
    (X)-t->(A) and A SUBCLASS_OF P, the parent copy is (X)-t->(P)."""
    m = _mm_with_classes("X", "A", "P")
    m.create_subclass("P", "A")
    m.create_relationship("X", "A", "t")
    m.propagate_rels_to_parent_class()
    assert RelSpec("X", "P", "t") in m.relationships
    assert RelSpec("P", "X", "t") not in m.relationships


def test_create_custom_rels_from_list():
    """model_manager.py:1201-1243: CLASS_RELATES_TO, skip-missing vs
    create_if_absent, non-string pairs skipped."""
    m = _mm_with_classes("Study", "Site")
    m.create_custom_rels_from_list([["Study", "Site"], ["Study", "Subject"]])
    assert RelSpec("Study", "Site", "CLASS_RELATES_TO") in m.relationships
    assert not any(r.to_label == "Subject" for r in m.relationships)

    m.create_custom_rels_from_list([["Study", "Subject"], [1, "Site"]],
                                   create_if_absent=True)
    assert "Subject" in m.classes
    assert RelSpec("Study", "Subject", "CLASS_RELATES_TO") in m.relationships
    assert not any(r.from_label == 1 for r in m.relationships)
    m.create_custom_rels_from_list(None)  # no-op
    m.create_custom_rels_from_list([])


def test_delete_from_graph_removes_derived():
    """model_manager.py:1376-1404: derived classes + their terms + touching
    rels + all Term SAME_AS go; non-derived survive."""
    m = MetadataModel()
    m.create_class("Keep")
    m.create_class("Drop", derived=True)
    m.create_relationship("Keep", "Drop", "HAS")
    m.create_relationship("Keep", "Keep", "SELF")
    m.create_ct({"Drop": [{"Codelist Code": "c1", "Term Code": "t1"}],
                 "Keep": [{"Codelist Code": "c2", "Term Code": "t2"}]},
                order_terms=False)
    counts = m.delete_from_graph()
    assert counts["classes"] == 1 and counts["terms"] == 1
    assert "Drop" not in m.classes and "Keep" in m.classes
    assert m.relationships == [RelSpec("Keep", "Keep", "SELF")]
    assert [t.class_label for t in m.terms] == ["Keep"]


def test_remove_auxiliary_term_labels(spark):
    """model_manager.py:1068-1088: label rows survive only for nodes with
    an outgoing FROM_DATA edge."""
    from tab2neo_spark.kg.refactor import RefactorEngine

    eng = RefactorEngine(spark, MetadataModel())
    labels = spark.createDataFrame(
        [(1, "Extracted"), (2, "NeverFromData")], "node_id long, extra_label string"
    )
    edges = spark.createDataFrame(
        [(1, "FROM_DATA", 100), (2, "HAS_TERM", 200)],
        "src long, rel_type string, dst long",
    )
    kept = eng.remove_auxiliary_term_labels(labels, edges)
    assert [tuple(r) for r in kept.collect()] == [(1, "Extracted")]


def _family_model():
    """The test_infer_rels.json shape (tests_model_manager/test_mm2.py:182-248):
    Subject SUBCLASS_OF Person, Exposure Name of Treatment SUBCLASS_OF
    Name of Treatment; one rel per hierarchy level."""
    m = MetadataModel()
    for lb, sl in [("Person", "PERSON"), ("Subject", "USUBJID"),
                   ("Name of Treatment", "--TRT"),
                   ("Exposure Name of Treatment", "EXTRT")]:
        m.create_class(lb)
        m.set_short_label(lb, sl)
    m.create_subclass("Person", "Subject")
    m.create_subclass("Name of Treatment", "Exposure Name of Treatment")
    m.create_relationship("Person", "Name of Treatment", "HAS")
    m.create_relationship("Subject", "Exposure Name of Treatment", "S_EXTRT")
    return m


def test_get_all_classes_and_props():
    """Mirrors test_mm2.py:146-180."""
    m = MetadataModel()
    for lb in ["G", "S", "K"]:
        m.create_class(lb)
    assert m.get_all_classes_with_nodeids() == [
        {"Class": "G", "short_label": None},
        {"Class": "K", "short_label": None},
        {"Class": "S", "short_label": None},
    ]
    for entry in m.get_all_classes_with_nodeids(include_id=True):
        assert isinstance(entry["_id_Class"], int)
        assert entry["Class"] in ["G", "S", "K"]
    assert m.get_all_classes() == ["G", "K", "S"]

    m2 = MetadataModel()
    for lb in ["A", "B", "C"]:
        m2.create_class(lb)
        m2.set_short_label(lb, lb.lower())
    got = sorted(m2.get_all_classes_props(["short_label"]),
                 key=lambda d: d["short_label"])
    assert got == [{"short_label": "a"}, {"short_label": "b"},
                   {"short_label": "c"}]
    with pytest.raises(AssertionError):
        m2.get_all_classes_props([])
    with pytest.raises(AssertionError):
        m2.get_all_classes_props(["short_label", "short_label"])


def test_get_rels_where():
    """Mirrors test_mm2.py:182-206 with the Cypher WHERE string expressed
    as a Python predicate."""
    m = _family_model()
    res1 = m.get_rels_where()
    assert res1 == [
        {"from": "Person", "to": "Name of Treatment", "type": "HAS",
         "optional": None},
        {"from": "Subject", "to": "Exposure Name of Treatment",
         "type": "S_EXTRT", "optional": None},
    ]
    res2 = m.get_rels_where(lambda f, t, r: f.label == "Person")
    assert res2 == [{"from": "Person", "to": "Name of Treatment",
                     "type": "HAS", "optional": None}]
    res3 = m.get_rels_where(lambda f, t, r: f.short_label == "PERSON",
                            return_prop="short_label")
    assert res3 == [{"from": "PERSON", "to": "--TRT", "type": "HAS",
                     "optional": None}]


def test_get_rels_btw2():
    """Mirrors test_mm2.py:208-248: every label pair across the two
    hierarchies finds BOTH rels (through the vertical families), incl. the
    short_label identifier."""
    m = _family_model()
    both = [
        {"from": "Person", "to": "Name of Treatment", "type": "HAS"},
        {"from": "Subject", "to": "Exposure Name of Treatment",
         "type": "S_EXTRT"},
    ]
    for a, b in [("Subject", "Exposure Name of Treatment"),
                 ("Subject", "Name of Treatment"),
                 ("Person", "Exposure Name of Treatment"),
                 ("Person", "Name of Treatment")]:
        assert m.get_rels_btw2(a, b) == both, (a, b)
    assert m.get_rels_btw2("USUBJID", "EXTRT", identifier="short_label") == [
        {"from": "PERSON", "to": "--TRT", "type": "HAS"},
        {"from": "USUBJID", "to": "EXTRT", "type": "S_EXTRT"},
    ]


def test_get_rels_from_labels_and_inverse():
    """Mirrors test_mm2.py:736-764."""
    m = _family_model()
    rels = m.get_rels_from_labels(["Subject"])
    assert rels == [
        {"from": "Person", "to": "Name of Treatment", "type": "HAS",
         "optional": None},
        {"from": "Subject", "to": "Exposure Name of Treatment",
         "type": "S_EXTRT", "optional": None},
    ]
    assert m.get_labels_from_rels_list(rels) == [
        "Person", "Name of Treatment", "Subject", "Exposure Name of Treatment"]


def test_get_subclasses_where():
    m = _family_model()
    m.create_subclass("Person", "Employee", conditions={"on": "dept"})
    got = m.get_subclasses_where()
    assert {(d["parent"], d["child"]) for d in got} == {
        ("Person", "Subject"), ("Name of Treatment", "Exposure Name of Treatment"),
        ("Person", "Employee")}
    cond = [d for d in got if d["child"] == "Employee"][0]["conditions"]
    assert cond == {"on": "dept"}
    only = m.get_subclasses_where(lambda p, c: p == "Person")
    assert {d["child"] for d in only} == {"Subject", "Employee"}


def _propagation_fixture():
    """The test_mm2.py:266-361 shape: Apple has term1t, class2 has term2t,
    class4 -typeE-> class5; subclass chain class4 <- class2 <- Apple
    (list entries are [parent, child]) built via the auto-propagating
    list-form create_subclasses."""
    m = MetadataModel()
    for lb in ["class1", "class2", "class3", "class4", "class5", "Apple"]:
        m.create_class(lb)
    m.create_ct({
        "Apple": [{"Codelist Code": "term1c", "Term Code": "term1t", "Order": 2}],
        "class2": [{"Codelist Code": "term2c", "Term Code": "term2t", "Order": 2}],
    }, order_terms=False)
    m.create_relationship("class4", "class5", "typeE")
    res = m.create_subclasses(
        [["class1", "class3"], ["class2", "Apple"], ["class4", "class2"]])
    assert res == [["class1", "class3"], ["class2", "Apple"],
                   ["class4", "class2"]]
    return m


def test_create_subclasses_auto_propagates():
    """create_subclass(list) propagates terms UP and rels DOWN
    (test_mm2.py:311-323, 348-355)."""
    m = _propagation_fixture()
    has_term1 = sorted(t.class_label for t in m.terms if t.term_code == "term1t")
    assert has_term1 == ["Apple", "class2", "class4"]
    typee = sorted((r.from_label, r.to_label) for r in m.relationships
                   if r.relationship_type == "typeE")
    assert typee == [("Apple", "class5"), ("class2", "class5"),
                     ("class4", "class5")]
    # MATCH semantics: unknown classes are skipped
    assert m.create_subclasses([["nope", "class1"]]) == []


def test_delete_terms_of_parent_class():
    """Mirrors test_mm2.py:295-328."""
    m = _propagation_fixture()
    m.delete_terms_of_parent_class([["class2", "Apple"]])
    has_term1 = sorted(t.class_label for t in m.terms if t.term_code == "term1t")
    assert has_term1 == ["Apple"]


def test_delete_rels_of_child_class():
    """Mirrors test_mm2.py:330-361."""
    m = _propagation_fixture()
    m.delete_rels_of_child_class([["class4", "class2"]])
    typee = sorted((r.from_label, r.to_label) for r in m.relationships
                   if r.relationship_type == "typeE")
    assert typee == [("class4", "class5")]


def test_delete_subclasses_cleans_propagated_artifacts():
    """Mirrors test_mm2.py:266-292 + the combined cleanup semantics."""
    m = _propagation_fixture()
    m.delete_subclasses([["class4", "class2"], ["class2", "Apple"]])
    assert m.subclass_of == [("class3", "class1")]
    # inherited term copies gone from parents, originals stay
    assert sorted(t.class_label for t in m.terms if t.term_code == "term1t") == ["Apple"]
    # inherited rels gone from children, the original stays
    typee = sorted((r.from_label, r.to_label) for r in m.relationships
                   if r.relationship_type == "typeE")
    assert typee == [("class4", "class5")]


def test_delete_subclass_keeps_artifacts_other_edges_justify():
    """Multi-parent: C subclass of P1 AND P2; deleting only [P1, C] must
    keep P2's inherited copy (still justified by the remaining edge)."""
    m = MetadataModel()
    for lb in ["P1", "P2", "C"]:
        m.create_class(lb)
    m.create_ct({"C": [{"Codelist Code": "cc", "Term Code": "tt"}]},
                order_terms=False)
    m.create_subclasses([["P1", "C"], ["P2", "C"]])
    assert sorted(t.class_label for t in m.terms) == ["C", "P1", "P2"]
    m.delete_subclasses([["P1", "C"]])
    assert sorted(t.class_label for t in m.terms) == ["C", "P2"]
    assert m.subclass_of == [("C", "P2")]

    # symmetric rel case: P -> T propagated down to children C1, C2
    m2 = MetadataModel()
    for lb in ["P", "C1", "C2", "T"]:
        m2.create_class(lb)
    m2.create_relationship("P", "T", "t")
    m2.create_subclasses([["P", "C1"], ["P", "C2"]])
    m2.delete_subclasses([["P", "C1"]])
    froms = sorted(r.from_label for r in m2.relationships
                   if r.relationship_type == "t")
    assert froms == ["C2", "P"]  # C1's inherited copy gone, C2's kept


def test_delete_subclass_preserves_rel_direction():
    """Incoming rels propagate as incoming copies; deletion must remove
    the inherited (X->C) copy and must NOT delete a genuine child-owned
    (C->X) rel of the same type."""
    m = MetadataModel()
    for lb in ["X", "P", "C"]:
        m.create_class(lb)
    m.create_relationship("X", "P", "t")     # incoming at the parent
    m.create_subclasses([["P", "C"]])        # propagates (X->C, t)
    assert RelSpec("X", "C", "t") in m.relationships
    m.create_relationship("C", "X", "t")     # genuine child-owned rel
    m.delete_subclasses([["P", "C"]])
    assert RelSpec("X", "C", "t") not in m.relationships  # inherited: gone
    assert RelSpec("C", "X", "t") in m.relationships      # owned: kept
    assert RelSpec("X", "P", "t") in m.relationships      # original: kept
