"""Materialization: lineage, idempotent resume, dedup-on-write, rollback
(north rule: per-partition lineage + row-count metrics, idempotent resume)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tab2neo_spark.datagen import pages_from_documents
from tab2neo_spark.kg.construct import construct_kg
from tab2neo_spark.kg.materialize import GraphStore, materialize_kg


def _mk_kg(spark, sf_dir, n=80):
    pages = pages_from_documents(spark, sf_dir).limit(n)
    return construct_kg(spark, pages, unique_urls=True)


def test_materialize_and_lineage(spark, sf_dir):
    kg = _mk_kg(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        store = GraphStore(spark, root)
        res = materialize_kg(store, kg, run_id="r1")
        assert res["nodes"]["status"] == "done"
        assert res["nodes"]["row_count"] == store.read("nodes").count()
        # per-partition histogram sums to the row count
        assert sum(res["triples"]["partitions"].values()) == res["triples"]["row_count"]
        # partition layout serves readback pruning
        assert store.read("nodes").filter(F.col("class") == "Page").count() == 80


def test_resume_skips_done_stages(spark, sf_dir):
    kg = _mk_kg(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        store = GraphStore(spark, root)
        r1 = materialize_kg(store, kg, run_id="r1")
        n1 = store.read("triples").count()
        # resume with same run_id: all stages skip, tables unchanged
        r2 = materialize_kg(store, kg, run_id="r1")
        assert store.read("triples").count() == n1
        assert r2["triples"]["ts"] == r1["triples"]["ts"]  # untouched checkpoint


def test_dedup_on_write_is_idempotent_across_runs(spark, sf_dir):
    """A second run over overlapping input must not duplicate rows —
    deterministic ids + anti-join dedup replace transactional MERGE."""
    with tempfile.TemporaryDirectory() as root:
        store = GraphStore(spark, root)
        materialize_kg(store, _mk_kg(spark, sf_dir, 80), run_id="r1")
        n_nodes = store.read("nodes").count()
        # r2 processes the same 80 pages again (e.g. crawl re-delivery)
        materialize_kg(store, _mk_kg(spark, sf_dir, 80), run_id="r2")
        assert store.read("nodes").count() == n_nodes
        assert store.read("nodes").select("node_id").distinct().count() == n_nodes


def test_incremental_run_appends_only_new(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        store = GraphStore(spark, root)
        materialize_kg(store, _mk_kg(spark, sf_dir, 50), run_id="r1")
        n1 = store.read("triples").count()
        materialize_kg(store, _mk_kg(spark, sf_dir, 80), run_id="r2")
        n2 = store.read("triples").count()
        assert n2 > n1
        # every triple unique
        assert store.read("triples").select("subj", "pred", "obj").distinct().count() == n2


def test_rollback_run(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        store = GraphStore(spark, root)
        materialize_kg(store, _mk_kg(spark, sf_dir, 50), run_id="r1")
        n1 = store.read("triples").count()
        materialize_kg(store, _mk_kg(spark, sf_dir, 80), run_id="r2")
        store.rollback_run("r2", ["nodes", "edges", "triples"])
        assert store.read("triples").count() == n1
        assert {r["run_id"] for r in store.read("triples").select("run_id").distinct().collect()} == {"r1"}
        statuses = {c["stage"]: c["status"] for c in store.checkpoints("r2")}
        assert set(statuses.values()) == {"rolled_back"}
