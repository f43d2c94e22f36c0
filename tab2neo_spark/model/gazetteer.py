"""The controlled-terminology gazetteer (Term stratum).

The reference manages controlled terminology as ``(:Class)-
[:HAS_CONTROLLED_TERM]->(:Term)`` nodes keyed by (Codelist Code, Term Code)
with ``[:SAME_AS]`` cross-codelist equivalences
(model_managers/model_manager.py:742-1001).  Here the gazetteer is the
entity dictionary for mention detection + linking over webtext pages, and
SAME_AS drives canonicalization (connected components in kg/canon.py).

This module is the SINGLE source of truth: the same literal rows feed
(a) the broadcast Spark DataFrame the engine joins against and
(b) inline ``VALUES`` SQL for the DuckDB oracle, so correctness checks can
never drift from the engine's dictionary.

The surface vocabulary deliberately overlaps the deterministic synthetic
document vocabulary in /root/testdata (words like spark/join/merge/table),
so mention detection has real hits at every scale.  ``data`` is a head
entity (appears in most documents) — the designated skew driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (class, surface, term_code) — surface forms matched as whole tokens.
GAZETTEER: list[tuple[str, str, str]] = [
    ("Engine", "spark", "ENG001"),
    ("Operator", "join", "OP001"),
    ("Operator", "merge", "OP002"),
    ("Operator", "sort", "OP003"),
    # alias surfaces of OP003/ST003 — SAME_AS collapses them in canon
    ("Operator", "order", "OP003A"),
    ("Operator", "filter", "OP004"),
    ("Operator", "scan", "OP005"),
    ("Operator", "agg", "OP006"),
    ("Operator", "group", "OP007"),
    ("Operator", "query", "OP008"),
    ("Structure", "table", "ST001"),
    ("Structure", "window", "ST002"),
    ("Structure", "row", "ST003"),
    ("Structure", "line", "ST003A"),
    ("Structure", "column", "ST004"),
    ("Structure", "batch", "ST005"),
    ("Structure", "stream", "ST006"),
    ("Structure", "vector", "ST007"),
    ("Structure", "hash", "ST008"),
    ("Structure", "key", "ST009"),
    # head entity: 'data' occurs in the bulk of synthetic documents -> the
    # hot key exercising AQE skew-join / salting paths.
    ("Concept", "data", "CN001"),
    ("Concept", "value", "CN002"),
]

# SAME_AS alias pairs (undirected) — input edges for connected-components
# canonicalization. Mirrors create_same_as_ct
# (model_managers/model_manager.py:941-976).
SAME_AS: list[tuple[str, str]] = [
    ("agg", "aggregate"),
    ("aggregate", "aggregation"),
    ("sort", "order"),
    ("row", "line"),
]


def webtext_model():
    """The webtext KG schema as a MetadataModel: Page MENTIONS each entity
    class; entity classes are SUBCLASS_OF Entity. Mirrors the reference's
    create_related_classes_from_list flow (model_manager.py:182-218)."""
    from tab2neo_spark.model.metadata import MetadataModel

    m = MetadataModel()
    m.create_class("Page", short_label="PG")
    m.create_class("Entity", short_label="ENT")
    for cls, short in [
        ("Engine", "ENG"), ("Operator", "OP"), ("Structure", "ST"), ("Concept", "CN")
    ]:
        m.create_class(cls, short_label=short)
        m.create_relationship("Page", cls, "MENTIONS")
        m.create_subclass("Entity", cls)
    return m


def gazetteer_df(spark: SparkSession) -> DataFrame:
    """Gazetteer as a (small, broadcastable) DataFrame."""
    return spark.createDataFrame(GAZETTEER, "class string, surface string, term_code string")


def same_as_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SAME_AS, "a string, b string")


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    body = ", ".join("(" + ", ".join(f"'{v}'" for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS t({', '.join(cols)})"


def gazetteer_sql_values() -> str:
    """The same gazetteer as an inline-VALUES relation for ANSI-SQL oracles."""
    return _values_sql(GAZETTEER, ["class", "surface", "term_code"])


def same_as_sql_values() -> str:
    return _values_sql(SAME_AS, ["a", "b"])
