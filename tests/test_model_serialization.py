"""Schema serializers: LinkML round-trip, arrows.app import/export, TTL."""

from __future__ import annotations

from tab2neo_spark.model.gazetteer import webtext_model
from tab2neo_spark.model.serialization import (
    create_model_from_linkml,
    export_arrows_dict,
    export_model_to_linkml,
    export_model_ttl,
    load_arrows_dict,
)


def test_linkml_roundtrip():
    m = webtext_model()
    linkml = export_model_to_linkml(m)
    assert linkml["classes"]["Operator"]["is_a"] == "Entity"
    # MENTIONS is reused toward 4 ranges -> attribute names are suffixed
    assert linkml["classes"]["Page"]["attributes"]["MENTIONS__Operator"]["range"] == "Operator"
    m2 = create_model_from_linkml(linkml)
    assert set(m2.classes) == set(m.classes)
    assert set(m2.subclass_of) == set(m.subclass_of)
    assert {(r.from_label, r.to_label, r.relationship_type) for r in m2.relationships} == {
        (r.from_label, r.to_label, r.relationship_type) for r in m.relationships
    }


def test_arrows_roundtrip():
    m = webtext_model()
    arrows = export_arrows_dict(m)
    assert {n["labels"][0] for n in arrows["nodes"]} == {"Class"}
    m2 = load_arrows_dict(arrows)
    assert set(m2.classes) == set(m.classes)
    assert set(m2.subclass_of) == set(m.subclass_of)


def test_arrows_import_terms_and_create_mode():
    arrows = {
        "nodes": [
            {"id": "a", "labels": ["Class"], "properties": {"label": "Age", "create": "true"}},
            {"id": "b", "labels": ["Class"], "properties": {"label": "Record"}},
            {"id": "t", "labels": ["Term"],
             "properties": {"Class": "Sex", "Codelist Code": "CL.SEX",
                            "Term Code": "M", "rdfs:label": "Male"}},
        ],
        "relationships": [
            {"id": "r0", "fromId": "b", "toId": "a", "type": "HAS_AGE", "properties": {}},
        ],
    }
    m = load_arrows_dict(arrows)
    assert m.classes["Age"].create is True
    assert m.relationships[0].relationship_type == "HAS_AGE"
    assert m.terms[0].rdfs_label == "Male"


def test_ttl_export_deterministic():
    m = webtext_model()
    ttl1, ttl2 = export_model_ttl(m), export_model_ttl(m)
    assert ttl1 == ttl2
    assert "t2s:Operator a owl:Class" in ttl1
    assert "t2s:Operator rdfs:subClassOf t2s:Entity ." in ttl1
    assert 'rdfs:label "MENTIONS"' in ttl1
