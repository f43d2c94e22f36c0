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
