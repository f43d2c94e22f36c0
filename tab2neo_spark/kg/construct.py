"""The KG-construction pipeline: pages -> nodes/edges/triples.

Spark-first re-expression of the reference's ingestion->model->refactor
lifecycle (SURVEY §3.3): ``FileDataLoader.load_file`` + ``ModelApplier.
refactor_all`` (model_appliers/model_applier.py:96-135) become one lazy
DataFrame DAG:

  pages ──extract_text (Arrow UDF, narrow)──> text
        ──tokenize+posexplode (JVM, narrow)──> tokens
        ──⋈ broadcast(gazetteer)──> mentions          (R2: extract_class_entities)
        ──canonicalize via CC(SAME_AS)──> canonical mentions (MERGE replacement)
        ──distinct──> entity nodes (deterministic xxhash64 ids)
        ──groupBy(url, entity)──> MENTIONS edges      (R3: link_classes on shared row)
        ──union──> triples(subj, pred, obj)

Where the reference loops per-entity-class on the driver and ships one
Cypher query per class (its chief scalability limit, SURVEY §3.3), here
every class is matched in ONE broadcast join and Catalyst fuses the whole
read->extract->tokenize->match path into a single map-only stage; the only
shuffles are the final distinct/groupBy on (url, entity), which AQE
skew-splits for head entities.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tab2neo_spark import schema as S
from tab2neo_spark.extract.html import extract_text_udf
from tab2neo_spark.extract.mentions import detect_mentions
from tab2neo_spark.kg.canon import apply_canonical, canonical_map
from tab2neo_spark.model.gazetteer import gazetteer_df, same_as_df

MENTIONS = "MENTIONS"
IS_A = "IS_A"
SAME_AS_PRED = "SAME_AS"


@dataclass
class KGResult:
    pages: DataFrame
    mentions: DataFrame       # (url, class, surface, canonical, term_code, pos)
    nodes: DataFrame          # NODES_SCHEMA
    edges: DataFrame          # EDGES_SCHEMA
    triples: DataFrame        # TRIPLES_SCHEMA


def construct_kg(
    spark: SparkSession,
    pages: DataFrame,
    gazetteer: DataFrame | None = None,
    same_as: DataFrame | None = None,
    use_existing_text: bool = False,
) -> KGResult:
    """Run the full construction DAG (lazy — nothing executes until the
    caller materializes).

    ``use_existing_text=False`` (default) extracts text from html bytes —
    the real pipeline; True trusts the ``text`` column (for isolating
    downstream stages in tests).
    """
    gaz = gazetteer if gazetteer is not None else gazetteer_df(spark)
    sa = same_as if same_as is not None else same_as_df(spark)

    if not use_existing_text:
        pages = pages.withColumn("text", extract_text_udf(F.col("html")))

    raw_mentions = detect_mentions(pages, gaz, text_col="text", id_col="url")

    # canonicalization: CC over SAME_AS -> rewrite surfaces (MERGE analog)
    canon = canonical_map(sa)
    mentions = apply_canonical(raw_mentions, canon, col="surface", out_col="canonical")

    # entity nodes: one per (class, canonical surface), deterministic id
    entities = (
        mentions.select("class", F.col("canonical").alias("rdfs_label"))
        .distinct()
        .withColumn("uri", S.node_uri_col(F.col("class"), F.col("rdfs_label")))
        .withColumn("node_id", F.xxhash64("class", "rdfs_label"))
        .withColumn("props", F.lit(None).cast("map<string,string>"))
        .select("node_id", "class", "rdfs_label", "uri", "props")
    )

    # page nodes
    page_nodes = (
        pages.select(F.col("url").alias("rdfs_label"))
        .distinct()  # a url crawled twice is still one Page node
        .withColumn("class", F.lit("Page"))
        .withColumn("uri", S.node_uri_col(F.col("class"), F.col("rdfs_label")))
        .withColumn("node_id", F.xxhash64("class", "rdfs_label"))
        .withColumn("props", F.lit(None).cast("map<string,string>"))
        .select("node_id", "class", "rdfs_label", "uri", "props")
    )
    nodes = page_nodes.unionByName(entities)

    # MENTIONS edges: distinct (page, entity); mention count kept as a triple
    mention_pairs = mentions.select(
        F.xxhash64(F.lit("Page"), F.col("url")).alias("src"),
        F.lit(MENTIONS).alias("rel_type"),
        F.xxhash64("class", "canonical").alias("dst"),
    ).distinct()
    edges = mention_pairs

    # flattened triples: human-readable identity (url / class:surface) so
    # the readback layer and oracles are id-scheme independent
    t_mentions = (
        mentions.select(
            F.col("url").alias("subj"),
            F.lit(MENTIONS).alias("pred"),
            F.concat_ws(":", F.col("class"), F.col("canonical")).alias("obj"),
        ).distinct()
    )
    t_isa = (
        mentions.select("class", "canonical")
        .distinct()
        .select(
            F.concat_ws(":", F.col("class"), F.col("canonical")).alias("subj"),
            F.lit(IS_A).alias("pred"),
            F.col("class").alias("obj"),
        )
    )
    triples = t_mentions.unionByName(t_isa)

    return KGResult(pages=pages, mentions=mentions, nodes=nodes, edges=edges, triples=triples)
