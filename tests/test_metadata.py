"""ModelManager long-tail parity: set_short_label, delete_relationship /
delete_subclasses, subclass-edge conditions, custom mappings, unmapped-class
removal, whole-query shortlabel translation (model_manager.py:172-394,
627-697, 1054-1066, 1126-1199). Pure driver-side metadata — no Spark."""

from __future__ import annotations

import pytest

from tab2neo_spark.model.metadata import MetadataModel, PropertyMapping


@pytest.fixture()
def model():
    m = MetadataModel()
    m.create_related_classes_from_list(
        [["Study", "Site", "Site"], ["Study", "Subject", "Subject"],
         ["Subject", "Race", "Race"]]
    )
    return m


def test_set_short_label(model):
    model.set_short_label("Subject", "SUBJ")
    assert model.classes["Subject"].short_label == "SUBJ"
    assert model.translate_to_shortlabel(["Subject", "Race"]) == ["SUBJ", "Race"]
    with pytest.raises(KeyError):
        model.set_short_label("Nope", "X")


def test_delete_relationship(model):
    assert any(r.relationship_type == "Race" for r in model.relationships)
    model.delete_relationship([["Subject", "Race", "Race"]])
    assert not any(r.relationship_type == "Race" for r in model.relationships)
    # non-matching triplets are ignored
    model.delete_relationship([["Study", "Site", "WRONG_TYPE"]])
    assert any(r.relationship_type == "Site" for r in model.relationships)


def test_delete_subclasses(model):
    model.create_subclass("Subject", "Patient")
    assert ("Patient", "Subject") in model.subclass_of
    model.delete_subclasses([["Subject", "Patient"]])
    assert ("Patient", "Subject") not in model.subclass_of


def test_subclass_edge_conditions(model):
    """3-element subclass form: conditions ride on the SUBCLASS_OF edge
    (model_manager.py:237-242)."""
    cond = {"rdfs:label": {"not_in": ["SCREEN FAILURE"]}}
    model.create_subclass("Subject", "Enrolled", conditions=cond)
    assert model.subclass_conditions[("Enrolled", "Subject")] == cond
    model.delete_subclasses([["Subject", "Enrolled"]])
    assert ("Enrolled", "Subject") not in model.subclass_conditions


def test_create_custom_mappings_from_dict(model):
    model.create_custom_mappings_from_dict(
        {"ADSL": {"Race": ["RACE", "RACEN"]}, "*": {"Study": ["STUDYID"]}}
    )
    assert PropertyMapping("ADSL", "RACE", "Race", "RACE") in model.property_mappings
    assert PropertyMapping("ADSL", "RACEN", "Race", "RACEN") in model.property_mappings
    # wildcard applies to any table; table-scoped does not leak
    cols = {(pm.class_label, pm.column) for pm in model.mappings_for_table("OTHER")}
    assert cols == {("Study", "STUDYID")}
    # idempotent merge
    model.create_custom_mappings_from_dict({"ADSL": {"Race": ["RACE"]}})
    assert sum(1 for pm in model.property_mappings if pm.column == "RACE") == 1


def test_remove_unmapped_classes(model):
    model.create_class("Orphan")
    model.create_subclass("Race", "EthnicGroup")  # ancestor chain keeps Race
    model.create_custom_mappings_from_dict({"ADSL": {"EthnicGroup": ["RACE"]}})
    model.remove_unmapped_classes(["Study"])
    # mapped via rel-from-table: Site, Subject; via property mapping +
    # subclass ancestry: EthnicGroup -> Race; Orphan goes
    assert "Orphan" not in model.classes
    assert {"Study", "Site", "Subject", "Race", "EthnicGroup"} <= set(model.classes)


def test_translate_query_to_shortlabel(model):
    model.set_short_label("Study", "STD")
    model.set_short_label("Subject", "SUBJ")
    labels, rels, pack, wm, wrm = model.translate_query_to_shortlabel(
        ["Study", "Subject"],
        rels=[{"from": "Study", "to": "Subject", "type": "Subject"}],
        labels_to_pack={"Subject": ["Race"]},
        where_map={"Study": {"rdfs:label": "STUDY1"}},
        where_rel_map={"Subject": {"EXISTS": {"include": ["Race"]}}},
    )
    assert labels == [
        {"label": "Study", "short_label": "STD"},
        {"label": "Subject", "short_label": "SUBJ"},
    ]
    assert rels[0]["from"] == "STD" and rels[0]["to"] == "SUBJ"
    assert pack == {"SUBJ": ["Race"]}
    assert set(wm) == {"STD"} and set(wrm) == {"SUBJ"}


def test_translate_rel_short_label_override(model):
    """A rel's own short_label overrides the TO-class's
    (model_manager.py:663-666)."""
    model.set_short_label("Subject", "SUBJ")
    _, rels, _, _, _ = model.translate_query_to_shortlabel(
        ["Study", "Subject"],
        rels=[{"from": "Study", "to": "Subject", "type": "Subject",
               "short_label": "PERSON"}],
    )
    assert rels[0]["to"] == "PERSON"


def test_propagate_terms_to_parent_class(model):
    from tab2neo_spark.model.metadata import TermSpec

    model.create_subclass("Person", "Subject")
    model.add_term(TermSpec("Subject", "CL.SUBJ", "S1", "S1"))
    added = model.propagate_terms_to_parent_class()
    assert added == 1
    assert any(t.class_label == "Person" and t.term_code == "S1" for t in model.terms)
    # idempotent
    assert model.propagate_terms_to_parent_class() == 0
