"""Table-to-graph refactoring: the ModelApplier core (R1-R9).

The reference turns loaded tabular rows into entity nodes + typed
relationships, driven by the metadata model:

- R1 plan: traverse mappings table->column->class, build per-class
  extraction specs {mode: create/merge, coll: [[col, prop]], lbl}
  (model_appliers/model_applier.py:156-257)
- R2 extract: per spec, project mapped columns, create-or-merge entity
  nodes, FROM_DATA edge back to the source row (model_applier.py:259-295)
- R3 link: for each schema relationship, join entities of both classes on
  their shared source row, emit a typed edge (model_applier.py:297-373)
- R4 IS_A edges instance->Class (model_applier.py:376-430)
- R6 link_to_terms: instance.rdfs_label = term.rdfs_label within class
  (model_applier.py:479-501)
- R9 refactor_all orchestration (model_applier.py:96-135)

The reference loops classes/relationships on the driver, one Cypher call
each, serially — its chief scalability limit (SURVEY §3.3). Here each
class extraction and each relationship link is an independent lazy
DataFrame; one union materializes them all in a single Spark job wave.

Row identity: Neo4j gives every loaded row a node id. A distributed,
resumable engine derives ``row_id = xxhash64(domain, <all columns>)`` —
deterministic across runs and cluster sizes. Byte-identical duplicate rows
therefore collapse to one row node (the reference would keep both; for
merge-mode entities the resulting graph is identical, and the divergence
is documented here and tested).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tab2neo_spark import schema as S
from tab2neo_spark.model.metadata import MetadataModel

FROM_DATA = "FROM_DATA"
IS_A = "IS_A"
TERM = "Term"


@dataclass
class ExtractionSpec:
    """R1 plan entry (model_applier.py:156-257)."""

    class_label: str
    columns: list  # [(source_column, property_name)]
    mode: str = "merge"  # 'merge' | 'create' (Class.create=True semantics)


@dataclass
class RefactorResult:
    nodes: DataFrame     # NODES_SCHEMA (entity + row nodes)
    edges: DataFrame     # EDGES_SCHEMA (typed rels + FROM_DATA + IS_A + Term)
    row_map: DataFrame   # (row_id, class, node_id) - entity ids per source row
    specs: list = field(default_factory=list)


def plan_extraction(model: MetadataModel, table_class: str) -> list[ExtractionSpec]:
    """R1: one spec per class mapped from the table's columns.

    Two mapping paths, like the reference's two schema modes
    (model_applier.py:199-228):

    - MAPS_TO_PROPERTY (``model.property_mappings``): all of a class's
      (column -> property) pairs collapse into ONE spec — the reference's
      ``coll: [[col, prop], ...]`` grouping (test_extract_entities.py
      part_1_A: car gets [['car_color','color'], ['car_make','make']]).
    - MAPS_TO_CLASS analog: a relationship ``table_class -> C`` maps column
      C to class C's rdfs_label — unless C already has property mappings.

    ``create``-mode classes come from ``ClassSpec.create``
    (model_applier.py:220-224).
    """
    specs = []
    by_class: dict[str, list] = {}
    for pm in model.mappings_for_table(table_class):
        by_class.setdefault(pm.class_label, []).append((pm.column, pm.property_name))
    for class_label, pairs in by_class.items():
        cls = model.classes.get(class_label)
        specs.append(
            ExtractionSpec(
                class_label=class_label,
                columns=pairs,
                mode="create" if (cls and cls.create) else "merge",
            )
        )
    for rel in model.relationships:
        if rel.from_label != table_class or rel.to_label in by_class:
            continue
        cls = model.classes.get(rel.to_label)
        if cls is None:
            continue
        specs.append(
            ExtractionSpec(
                class_label=cls.label,
                columns=[(cls.label, "rdfs_label")],
                mode="create" if cls.create else "merge",
            )
        )
    return specs


class RefactorEngine:
    def __init__(self, spark: SparkSession, model: MetadataModel):
        self.spark = spark
        self.model = model

    # -- R2 -------------------------------------------------------------------

    def with_row_ids(self, df: DataFrame, domain: str) -> DataFrame:
        """Deterministic source-row identity (the Source Data Row analog)."""
        return df.withColumn(
            "_row_id", F.xxhash64(F.lit(domain), *[F.col(c) for c in df.columns])
        ).dropDuplicates(["_row_id"])

    def extract_class_entities(
        self, df: DataFrame, specs: list[ExtractionSpec], domain: str
    ) -> RefactorResult:
        """R2: entity nodes per spec + FROM_DATA provenance edges.

        merge-mode id = xxhash64(class, value-tuple): equal mapped-value
        combinations collapse globally WITHOUT a shuffle-dedup — downstream
        writes dedup on the deterministic key instead
        (materialize.write_stage). create-mode id adds row_id to the hash:
        one node per source row (model_applier.py:246-251).

        Multi-property specs (MAPS_TO_PROPERTY mode): ALL (column ->
        property) pairs of a spec land on ONE node, whose merge identity is
        the tuple of all mapped values — reference
        test_extract_entities.py part_2_D: car{color,make} nodes merge per
        (color, make) pair. The pair whose property is rdfs_label feeds the
        canonical value column; every other pair goes into the open props
        map. Rows where every mapped value is null are skipped (null keys
        must not merge — CLD_NAN discipline, action.py:1656-1660).
        """
        rows = self.with_row_ids(df, domain)
        NULL_MARK = "\x00"  # distinguishes null from the string 'null'

        node_parts = []
        rowmap_parts = []
        for spec in specs:
            pairs = [(src, prop) for src, prop in spec.columns]
            vals = [F.col(src).cast("string") for src, _ in pairs]
            any_present = vals[0].isNotNull()
            for v in vals[1:]:
                any_present = any_present | v.isNotNull()
            base = rows.filter(any_present)

            key_parts = [F.coalesce(v, F.lit(NULL_MARK)) for v in vals]
            if spec.mode == "create":
                node_id = F.xxhash64(F.lit(spec.class_label), F.col("_row_id"), *key_parts)
            else:
                node_id = F.xxhash64(F.lit(spec.class_label), *key_parts)

            rdfs_vals = [v for (_, prop), v in zip(pairs, vals)
                         if prop in ("rdfs_label", "rdfs:label")]
            rdfs_label = rdfs_vals[0] if rdfs_vals else F.lit(None).cast("string")
            prop_entries = [
                (prop, v)
                for (_, prop), v in zip(pairs, vals)
                if prop not in ("rdfs_label", "rdfs:label")
            ]
            if prop_entries:
                props = F.map_filter(
                    F.create_map(
                        *[x for p, v in prop_entries for x in (F.lit(p), v)]
                    ),
                    lambda k, v: v.isNotNull(),
                )
            else:
                props = F.lit(None).cast("map<string,string>")

            part = base.select(
                node_id.alias("node_id"),
                F.lit(spec.class_label).alias("class"),
                rdfs_label.alias("rdfs_label"),
                S.node_uri_col(F.lit(spec.class_label), *vals).alias("uri"),
                props.alias("props"),
                F.col("_row_id"),
            )
            rowmap_parts.append(
                part.select(F.col("_row_id").alias("row_id"), "class", "node_id")
            )
            node_parts.append(part.drop("_row_id"))

        all_nodes = node_parts[0]
        for p in node_parts[1:]:
            all_nodes = all_nodes.unionByName(p)
        # merge-mode duplicates collapse on the deterministic id; at write
        # time materialize.write_stage's dedup_key would do this for free —
        # the in-memory result honors MERGE semantics the same way
        all_nodes = all_nodes.dropDuplicates(["node_id"])

        row_map = rowmap_parts[0]
        for p in rowmap_parts[1:]:
            row_map = row_map.unionByName(p)

        # FROM_DATA provenance: entity -> source row node id
        from_data = row_map.select(
            F.col("node_id").alias("src"),
            F.lit(FROM_DATA).alias("rel_type"),
            F.col("row_id").alias("dst"),
        )
        return RefactorResult(nodes=all_nodes, edges=from_data, row_map=row_map)

    # -- R3 -------------------------------------------------------------------

    def link_classes(self, row_map: DataFrame) -> DataFrame:
        """R3/J7: echo schema relationships into data — entities of classes
        A and B extracted from the SAME source row get a typed edge.

        One self-equi-join of the row_map on row_id covers ALL
        relationships simultaneously (vs the reference's per-relationship
        Cypher loop); the rel-type table is broadcast."""
        rels = [
            (r.from_label, r.to_label, r.relationship_type)
            for r in self.model.relationships
        ]
        if not rels:
            return self.spark.createDataFrame([], S.EDGES_SCHEMA)
        rel_df = F.broadcast(
            self.spark.createDataFrame(
                rels, "from_label string, to_label string, rel_type string"
            )
        )
        a = row_map.select(
            F.col("row_id"), F.col("class").alias("from_label"), F.col("node_id").alias("src")
        )
        b = row_map.select(
            F.col("row_id"), F.col("class").alias("to_label"), F.col("node_id").alias("dst")
        )
        return (
            a.join(b, "row_id")
            .join(rel_df, ["from_label", "to_label"], "inner")
            .select("src", "rel_type", "dst")
            .dropDuplicates()
        )

    # -- R4 -------------------------------------------------------------------

    def is_a_edges(self, row_map: DataFrame) -> DataFrame:
        """R4: instance -> Class-node edges; the class node id is the
        deterministic hash of ('Class', label)."""
        return row_map.select(
            F.col("node_id").alias("src"),
            F.lit(IS_A).alias("rel_type"),
            F.xxhash64(F.lit("Class"), F.col("class")).alias("dst"),
        ).dropDuplicates()

    # -- R5 -------------------------------------------------------------------

    def link_via_is_a(self, nodes: DataFrame, edges: DataFrame) -> DataFrame:
        """R5 (model_applier.py:433-476, reshape_all's path): like
        link_classes, but driven by the MATERIALIZED graph instead of the
        in-flight row_map — entity classes come from the node table, row
        co-membership from FROM_DATA edges, so it works on a graph loaded
        back from storage. Already-present edges are anti-joined away (the
        reference's ``WHERE NOT (ent1)-[]->(ent2)`` guard)."""
        row_map = (
            edges.filter(F.col("rel_type") == FROM_DATA)
            .join(
                nodes.select("node_id", "class"),
                edges["src"] == nodes["node_id"],
                "inner",
            )
            .select(F.col("dst").alias("row_id"), "class", "node_id")
        )
        new_edges = self.link_classes(row_map)
        existing = edges.select("src", "rel_type", "dst")
        return new_edges.join(existing, ["src", "rel_type", "dst"], "left_anti")

    def reshape_all(
        self,
        df: DataFrame,
        table_class: str,
        domain: str | None = None,
        terms: DataFrame | None = None,
    ) -> RefactorResult:
        """The reference's alternative pipeline (model_applier.py:108-113):
        extract -> IS_A -> link_via_is_a (graph-driven) -> terms."""
        domain = domain or table_class
        specs = plan_extraction(self.model, table_class)
        if not specs:
            raise ValueError(f"no extraction specs for table class {table_class!r}")
        res = self.extract_class_entities(df, specs, domain)
        edges = res.edges.unionByName(self.is_a_edges(res.row_map))
        edges = edges.unionByName(self.link_via_is_a(res.nodes, edges))
        if terms is not None:
            edges = edges.unionByName(self.link_to_terms(res.nodes, terms))
        return RefactorResult(nodes=res.nodes, edges=edges, row_map=res.row_map, specs=specs)

    # -- R6 -------------------------------------------------------------------

    def link_to_terms(self, nodes: DataFrame, terms: DataFrame) -> DataFrame:
        """R6/J8: instance.rdfs_label = term.rdfs_label within the class ->
        [:Term] edge; the terms table is controlled terminology
        (metadata-scale) -> broadcast hash join."""
        t = F.broadcast(
            terms.select(
                F.col("class_label"),
                F.col("rdfs_label").alias("term_label"),
                F.xxhash64(F.lit("Term"), F.col("codelist_code"), F.col("term_code")).alias(
                    "term_id"
                ),
            )
        )
        return (
            nodes.join(
                t,
                (nodes["class"] == t["class_label"])
                & (nodes["rdfs_label"] == t["term_label"]),
                "inner",
            )
            .select(
                F.col("node_id").alias("src"),
                F.lit(TERM).alias("rel_type"),
                F.col("term_id").alias("dst"),
            )
            .dropDuplicates()
        )

    # -- R8 -------------------------------------------------------------------

    def label_entities(
        self, nodes: DataFrame, edges: DataFrame, rel_type: str
    ) -> DataFrame:
        """R8 (model_applier.py:547-610): copy a related node's value onto
        the source node as an EXTRA label.

        Neo4j's multi-label ``SET n:<value>`` has no single-column analog;
        extra labels live in a class-membership side table
        ``(node_id, extra_label)`` that readback layers union with the
        primary class. One edge-filtered join, batched-parallel by
        construction (the reference needs apoc.periodic.iterate batches).
        """
        dst_vals = nodes.select(
            F.col("node_id").alias("dst"), F.col("rdfs_label").alias("extra_label")
        )
        return (
            edges.filter(F.col("rel_type") == rel_type)
            .join(dst_vals, "dst")
            .select(F.col("src").alias("node_id"), "extra_label")
            .filter(F.col("extra_label").isNotNull())
            .dropDuplicates()
        )

    def remove_auxiliary_term_labels(
        self, labels: DataFrame, edges: DataFrame
    ) -> DataFrame:
        """Post-reshape cleanup (model_manager.py:1068-1088): drop extra
        labels from Term nodes never extracted from data — i.e. keep only
        label rows whose node has an outgoing FROM_DATA edge. One semi-join
        on node ids (broadcast-able: the FROM_DATA id set projects to a
        single bigint column)."""
        from_data_nodes = (
            edges.filter(F.col("rel_type") == FROM_DATA)
            .select(F.col("src").alias("node_id"))
            .distinct()
        )
        return labels.join(from_data_nodes, "node_id", "left_semi")

    # -- R9 -------------------------------------------------------------------

    def refactor_all(
        self,
        df: DataFrame,
        table_class: str,
        domain: str | None = None,
        terms: DataFrame | None = None,
        reify_rows: bool = False,
    ) -> RefactorResult:
        """R9: plan -> extract -> link -> is_a (-> terms), one lazy DAG.

        ``reify_rows`` is the reference's ``schema_CLASS`` mode
        (model_applier.py mode flag; exercised by
        tests_model_manager/test_create_model_from_data.py): each source
        row becomes a node of ``table_class``, so model relationships
        declared FROM the table class (``create_model_from_data``'s star
        schema) link row nodes to their extracted entities and the
        readback can include the table class itself."""
        domain = domain or table_class
        # reified row node ids are xxhash64(domain, cols): with domain ==
        # table_class the id embeds its class, preserving the
        # key-determines-partition contract the partition-pruned upsert
        # relies on (materialize._existing_for_dedup). A shared domain
        # reified under TWO table classes would break it — refuse.
        if reify_rows and domain != table_class:
            raise ValueError(
                "reify_rows requires domain == table_class: row node ids "
                "embed the domain, and reifying one domain under a "
                "different class label would let the same node_id appear "
                "in two class partitions"
            )
        specs = plan_extraction(self.model, table_class)
        if not specs:
            raise ValueError(f"no extraction specs for table class {table_class!r}")
        res = self.extract_class_entities(df, specs, domain)
        nodes, row_map = res.nodes, res.row_map
        if reify_rows:
            row_ids = row_map.select("row_id").distinct()
            nodes = nodes.unionByName(row_ids.select(
                F.col("row_id").alias("node_id"),
                F.lit(table_class).alias("class"),
                F.col("row_id").cast("string").alias("rdfs_label"),
                F.lit(None).cast("string").alias("uri"),
                F.lit(None).cast("map<string,string>").alias("props"),
            ))
            # row nodes join the co-membership map -> link_classes emits
            # the table->entity edges in the same single self-join
            row_map = row_map.unionByName(row_ids.select(
                "row_id",
                F.lit(table_class).alias("class"),
                F.col("row_id").alias("node_id"),
            ))
        edges = res.edges.unionByName(self.link_classes(row_map)).unionByName(
            self.is_a_edges(row_map)
        )
        if terms is not None:
            edges = edges.unionByName(self.link_to_terms(nodes, terms))
        return RefactorResult(nodes=nodes, edges=edges, row_map=row_map, specs=specs)
