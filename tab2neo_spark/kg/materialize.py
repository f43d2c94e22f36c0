"""Graph materialization: partitioned tables + lineage + idempotent resume.

Replaces the reference's Cypher MERGE ingestion and its ``Changes`` audit
nodes (derivation_method/action.py:156-175; rollback
derivation_method.py:596-671).  The north rule requires: every stage
writes per-partition lineage + row-count metrics to a checkpoint table so
runs resume idempotently at 10^12-document scale.

Design:

- **Tables**: ``nodes`` partitioned by ``class``, ``edges`` by
  ``rel_type``, ``triples`` by ``pred`` — partition pruning serves the
  readback layer's class/rel filters directly. Parquet in this sandbox;
  on a real deployment the same writers target Iceberg (MERGE INTO,
  snapshot rollback) — the jars aren't in this image, so the Iceberg
  branch is gated behind an import/config try (see ``_iceberg_available``).
- **Idempotency**: all ids are deterministic content hashes, so re-writing
  the same input produces byte-identical rows; dedup-on-write
  (anti-join against the existing table) replaces transactional MERGE.
- **Lineage**: one checkpoint row per (run_id, stage) with row counts +
  per-partition row histogram; a stage found 'done' in the checkpoint
  table is skipped on resume — re-running a crashed job re-does only the
  missing stages.
- **Rollback**: every row carries ``run_id``; rollback = partition-pruned
  delete of that run's rows (Iceberg: snapshot rollback).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return "org.apache.iceberg.spark.SparkCatalog" in (
            spark.conf.get("spark.sql.catalog.spark_catalog", "")
        )
    except Exception:
        return False


class GraphStore:
    """Filesystem-rooted node/edge/triple store with a checkpoint table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    # -- paths ---------------------------------------------------------------

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def _ckpt_dir(self) -> str:
        return f"{self.root}/_checkpoint"

    # -- checkpoint / lineage --------------------------------------------------

    def stage_done(self, run_id: str, stage: str) -> bool:
        rec = self._read_ckpt(run_id, stage)
        return rec is not None and rec.get("status") == "done"

    def _ckpt_file(self, run_id: str, stage: str) -> str:
        return f"{self._ckpt_dir()}/{run_id}__{stage}.json"

    def _read_ckpt(self, run_id: str, stage: str) -> dict | None:
        p = self._ckpt_file(run_id, stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def write_checkpoint(self, run_id: str, stage: str, payload: dict) -> None:
        """Atomic (write-temp + rename) local checkpoint record; on a real
        cluster this is an Iceberg/Delta append to a checkpoint table —
        both give the same all-or-nothing visibility."""
        os.makedirs(self._ckpt_dir(), exist_ok=True)
        p = self._ckpt_file(run_id, stage)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, p)

    def checkpoints(self, run_id: str | None = None) -> list[dict]:
        out = []
        d = self._ckpt_dir()
        if not os.path.isdir(d):
            return out
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".json"):
                continue
            if run_id and not fn.startswith(f"{run_id}__"):
                continue
            with open(f"{d}/{fn}") as f:
                out.append(json.load(f))
        return out

    # -- writes ----------------------------------------------------------------

    def write_stage(
        self,
        df: DataFrame,
        table: str,
        run_id: str,
        stage: str,
        partition_by: list[str] | None = None,
        dedup_key: list[str] | None = None,
        mode: str = "append",
    ) -> dict:
        """Write one stage's output with lineage; skip if already done.

        Returns the checkpoint payload. ``dedup_key`` turns the append into
        an idempotent keyed upsert (left-anti against existing keys — the
        MERGE INTO analog without Iceberg).
        """
        if self.stage_done(run_id, stage):
            return self._read_ckpt(run_id, stage)

        self._save_table_meta(table, partition_by or [])
        t0 = time.time()
        out = df.withColumn("run_id", F.lit(run_id))
        path = self.path(table)
        n_pruned: int | None = None

        if dedup_key and os.path.isdir(path):
            existing, n_pruned = self._existing_for_dedup(path, out, partition_by)
            out = out.join(
                existing.select(*dedup_key).distinct(), dedup_key, "left_anti"
            )

        # lineage WITHOUT a second pass: the row count rides on the write
        # itself via df.observe (one job, one scan — a pre-write
        # groupBy().count().collect() would execute the full stage DAG
        # twice, doubling the most expensive jobs at scale), and the
        # per-file histogram comes from the written parquet FOOTERS
        # (metadata-only — Iceberg deployments read the same numbers from
        # snapshot manifests)
        from pyspark.sql import Observation

        before_files = self._parquet_files(path)
        obs = Observation(f"{run_id}__{stage}")
        out = out.observe(obs, F.count(F.lit(1)).alias("row_count"))

        writer = out.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        row_count = obs.get["row_count"]
        hist = self._footer_histogram(self._parquet_files(path) - before_files)

        payload = {
            "run_id": run_id,
            "stage": stage,
            "table": table,
            "row_count": row_count,
            "partitions": hist,
            "dedup_scan_partitions": n_pruned,
            "wall_s": round(time.time() - t0, 3),
            "status": "done",
            "ts": time.time(),
        }
        self.write_checkpoint(run_id, stage, payload)
        return payload

    def _existing_for_dedup(
        self, path: str, batch, partition_by: list[str] | None
    ) -> tuple[DataFrame, int | None]:
        """Existing-table read for the keyed upsert's anti-join, PRUNED to
        the partitions the incoming batch touches. Without this, every
        incremental write re-reads the whole target table — a full-table
        scan per append at 100 TB. The partition-value discovery is one
        extra job over the batch projected to the partition columns
        (low-cardinality by design: class/rel_type/pred), and the isin
        predicate reaches the parquet scan as PartitionFilters.

        CONTRACT: valid because every dedup key determines its partition
        columns (node_id = xxhash64(class, key) embeds class; edge and
        triple keys contain rel_type/pred outright) — a duplicate key can
        only ever live in a partition the batch also touches.

        Returns (dataframe, number of partitions scanned | None if
        unpartitioned/unprunable)."""
        existing = self.spark.read.parquet(path)
        parts = [p for p in (partition_by or []) if p in batch.columns]
        if not parts:
            return existing, None
        # cap the predicate size: partition columns are low-cardinality by
        # design (class/rel_type/pred); if a caller partitions on a
        # high-cardinality key, a thousands-branch OR would bloat the plan
        # for little pruning benefit — fall back to the full read
        limit = 256
        values = batch.select(*parts).distinct().limit(limit + 1).collect()
        if len(values) > limit:
            return existing, None
        pred = None
        for row in values:
            conj = None
            for p in parts:
                eq = F.col(p).eqNullSafe(F.lit(row[p]))
                conj = eq if conj is None else conj & eq
            pred = conj if pred is None else pred | conj
        if pred is None:  # empty batch: nothing can collide
            return existing.filter(F.lit(False)), 0
        return existing.filter(pred), len(values)

    @staticmethod
    def _parquet_files(path: str) -> set[str]:
        out: set[str] = set()
        if not os.path.isdir(path):
            return out
        for dirpath, _, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    out.add(os.path.join(dirpath, fn))
        return out

    def _footer_histogram(self, files: set[str]) -> dict[str, int]:
        """Per-output-file row counts from parquet footer metadata — no
        data scan; the driver reads a few KB per file."""
        import pyarrow.parquet as pq

        hist: dict[str, int] = {}
        for f in sorted(files):
            rel = os.path.relpath(f, self.root)
            hist[rel] = pq.ParquetFile(f).metadata.num_rows
        return hist

    def read(self, table: str, as_of_run: str | None = None) -> DataFrame:
        """Read a table, optionally AS OF a run — the Iceberg
        time-travel analog over this store's checkpoint lineage: the
        visible rows are those of surviving runs whose last commit on
        this table happened at or before ``as_of_run``'s last commit
        (checkpoint ``ts``). The visible-run set is metadata-scale, so
        it renders as an ``isin`` literal the scan filters on.

        Divergence from real Iceberg (documented, inherent to plain
        parquet): a ROLLED-BACK run's rows are physically rewritten away,
        so time travel sees append history only — it cannot resurrect
        rows a rollback removed; Iceberg's snapshot manifests can."""
        df = self.spark.read.parquet(self.path(table))
        if as_of_run is None:
            return df
        commit_ts: dict[str, float] = {}
        for rec in self.checkpoints():
            if rec.get("table") == table and rec.get("status") == "done":
                rid = rec["run_id"]
                commit_ts[rid] = max(commit_ts.get(rid, 0.0), rec.get("ts", 0.0))
        if as_of_run not in commit_ts:
            raise ValueError(
                f"run {as_of_run!r} has no surviving commit on table {table!r}"
            )
        cutoff = commit_ts[as_of_run]
        visible = sorted(r for r, t in commit_ts.items() if t <= cutoff)
        return df.filter(F.col("run_id").isin(visible))

    # -- bucketed layout (co-located joins at rest) ----------------------------

    def _catalog_name(self, table: str) -> str:
        import hashlib as _hl

        tag = _hl.md5(self.root.encode()).hexdigest()[:8]
        return f"gs_{tag}_{table}"

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 8,
        sort_cols: list[str] | None = None,
    ) -> str:
        """Bucketed-at-rest layout (docs/PLANS.md §4b): tables that join
        repeatedly on ``bucket_cols`` (edges<->edges on node ids) are
        written ``bucketBy(n, cols).sortBy(cols)`` so the join needs ZERO
        Exchange — co-location is baked into the files. Bucketing metadata
        lives in the session catalog (plain parquet paths cannot carry
        it), with the data files under this store's root. Returns the
        catalog table name to join against (``spark.table(name)``)."""
        name = self._catalog_name(table)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        writer = (
            df.write.mode("overwrite")
            .option("path", self.path(table + "__bucketed"))
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*(sort_cols or bucket_cols))
            .format("parquet")
        )
        writer.saveAsTable(name)
        return name

    def read_bucketed(self, table: str) -> DataFrame:
        return self.spark.table(self._catalog_name(table))

    # -- table metadata (partition layout survives rollback rewrites) ---------

    def _meta_file(self, table: str) -> str:
        return f"{self.root}/{table}__meta.json"

    def _save_table_meta(self, table: str, partition_by: list[str]) -> None:
        if not os.path.exists(self._meta_file(table)):
            with open(self._meta_file(table), "w") as f:
                json.dump({"partition_by": partition_by}, f)

    def table_partitioning(self, table: str) -> list[str]:
        if os.path.exists(self._meta_file(table)):
            with open(self._meta_file(table)) as f:
                return json.load(f).get("partition_by", [])
        return []

    # -- rollback ----------------------------------------------------------------

    def rollback_run(self, run_id: str, tables: list[str]) -> None:
        """Delete a run's rows from each table (run_id column filter) and
        mark its checkpoints rolled back. Parquet has no row-level delete,
        so this rewrites the table without the run's rows — Iceberg/Delta
        deployments do a metadata-only DELETE/snapshot rollback instead."""
        for table in tables:
            path = self.path(table)
            if not os.path.isdir(path):
                continue
            kept = self.spark.read.parquet(path).filter(F.col("run_id") != run_id)
            tmp = path + "__rollback_tmp"
            writer = kept.write.mode("overwrite")
            # preserve the table's partition layout — a rewrite that drops
            # partitioning would silently kill partition pruning for every
            # subsequent readback
            parts = self.table_partitioning(table)
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(tmp)
            self._swap_dirs(tmp, path)
        # only the checkpoints of the ROLLED-BACK tables flip status: a
        # partial rollback (subset of tables) must keep the other tables'
        # commits visible — time-travel reads (read(as_of_run=...)) derive
        # visibility from per-table checkpoint status
        rolled = set(tables)
        for rec in self.checkpoints(run_id):
            if rec.get("table") in rolled:
                rec["status"] = "rolled_back"
                self.write_checkpoint(run_id, rec["stage"], rec)

    def rollback_action(self, run_id: str, action_idx: int, tables: list[str]) -> None:
        """Per-action rollback (the reference's Changes-node inverse,
        action.py:1699-1749 / derivation_method.py:596-671): revert ONE
        action's writes while keeping the rest of the run. Rows written via
        :func:`write_method_result` carry ``_action``; the rewrite filters
        on (run_id, _action) — Iceberg/Delta deployments do a row-level
        DELETE instead."""
        for table in tables:
            path = self.path(table)
            if not os.path.isdir(path):
                continue
            # mergeSchema: _action exists only on rows written via
            # write_method_result; rows from other writers (e.g.
            # materialize_kg on the same table) lack it. Without the merged
            # read, a sampled footer missing _action would silently no-op
            # the rollback; without the null-safe coalesce, those rows'
            # NULL _action would make the keep-predicate NULL and filter()
            # would DROP unrelated same-run rows.
            df = self.spark.read.option("mergeSchema", "true").parquet(path)
            if "_action" not in df.columns:
                continue  # table has no action-written rows at all
            kept = df.filter(
                ~(
                    (F.col("run_id") == run_id)
                    & F.coalesce(F.col("_action") == action_idx, F.lit(False))
                )
            )
            tmp = path + "__rollback_tmp"
            writer = kept.write.mode("overwrite")
            parts = self.table_partitioning(table)
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(tmp)
            self._swap_dirs(tmp, path)
        marker = f"__a{action_idx}_"
        for rec in self.checkpoints(run_id):
            if marker in rec["stage"]:
                rec["status"] = "rolled_back"
                self.write_checkpoint(run_id, rec["stage"], rec)

    # -- compaction (small-file hygiene) ---------------------------------------

    def compact(self, table: str, target_file_bytes: int = 128 * 1024 * 1024) -> dict:
        """Rewrite a table's accumulated small files into ~``target_file_
        bytes`` files (VERDICT r4, Next round #10): repeated append runs
        and rollback rewrites each leave their own file set, and at scale
        the per-file open/footer cost comes to dominate scans. The rewrite
        PRESERVES the partition layout contract (``<table>__meta.json``)
        — losing it would silently kill partition pruning — and all row
        content including ``run_id`` lineage columns, so time-travel reads
        are unaffected. Before/after file counts, bytes, and row counts
        (parquet footers — no data scan) are recorded as a lineage
        checkpoint under the ``__compact__`` run; the payload deliberately
        carries ``table_compacted`` rather than ``table`` so
        :meth:`read`'s as-of visibility scan never treats a compaction as
        a data commit.

        Partitioned tables repartition BY the partition columns (each
        value collapses to one task -> one file per live partition
        directory); unpartitioned tables repartition to
        ``ceil(bytes / target_file_bytes)``."""
        if table.endswith("__bucketed"):
            raise ValueError(
                f"{table!r} is a bucketed layout: its files carry bucket-id "
                "naming the session catalog depends on, and a plain rewrite "
                "would corrupt the zero-Exchange join contract — re-run "
                "write_bucketed to compact it instead"
            )
        path = self.path(table)
        before = self._parquet_files(path)
        bytes_before = sum(os.path.getsize(f) for f in before)
        rows_before = sum(self._footer_histogram(before).values())

        df = self.spark.read.option("mergeSchema", "true").parquet(path)
        parts = self.table_partitioning(table)
        if parts:
            out = df.repartition(*[F.col(p) for p in parts])
        else:
            n = max(1, -(-bytes_before // max(target_file_bytes, 1)))
            out = df.repartition(int(n))
        tmp = path + "__compact_tmp"
        writer = out.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(tmp)
        # VERIFY the rewrite before the destructive swap (r5 ADVICE): a
        # row-losing rewrite — or a concurrent append landing between the
        # snapshot read and the swap (compaction assumes a single writer,
        # like every GraphStore mutation) — must abort with the original
        # directory intact, not be recorded as an unchecked number.
        rows_tmp = sum(self._footer_histogram(self._parquet_files(tmp)).values())
        if rows_tmp != rows_before:
            import shutil

            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compact({table!r}): rewrite holds {rows_tmp} rows but the "
                f"source held {rows_before} — aborting before the swap "
                "(concurrent append, or a row-dropping read?); original "
                "directory left untouched"
            )
        self._swap_dirs(tmp, path)

        after = self._parquet_files(path)
        payload = {
            "run_id": "__compact__",
            "op": "compact",
            "table_compacted": table,
            "files_before": len(before),
            "files_after": len(after),
            "bytes_before": bytes_before,
            "bytes_after": sum(os.path.getsize(f) for f in after),
            "row_count": rows_before,
            "rows_after": sum(self._footer_histogram(after).values()),
            "partition_by": parts,
            "status": "done",
            "ts": time.time(),
        }
        stage = f"compact_{table}_{len(self.checkpoints('__compact__'))}"
        payload["stage"] = stage
        self.write_checkpoint("__compact__", stage, payload)
        return payload

    @staticmethod
    def _swap_dirs(src: str, dst: str) -> None:
        import shutil

        shutil.rmtree(dst)
        os.replace(src, dst)


def write_method_result(
    store: GraphStore,
    res,
    run_id: str,
    method_name: str = "method",
) -> dict:
    """Persist a MethodResult's new_nodes/new_edges batches with per-ACTION
    provenance: every row carries ``_action`` (the producing action's index
    from ``res.node_actions``/``res.edge_actions``) so
    :meth:`GraphStore.rollback_action` can revert a single action — the
    reference's ``(action)-[:APPLIED]->(Changes)`` discipline without
    driver-side id lists."""
    results: dict = {}
    for j, (df, idx) in enumerate(zip(res.new_nodes, res.node_actions)):
        stage = f"{method_name}__a{idx}_nodes{j}"
        results[stage] = store.write_stage(
            df.withColumn("_action", F.lit(idx)),
            "nodes", run_id, stage,
            partition_by=["class"], dedup_key=["node_id"],
        )
    for j, (df, idx) in enumerate(zip(res.new_edges, res.edge_actions)):
        stage = f"{method_name}__a{idx}_edges{j}"
        results[stage] = store.write_stage(
            df.withColumn("_action", F.lit(idx)),
            "edges", run_id, stage,
            partition_by=["rel_type"], dedup_key=["src", "rel_type", "dst"],
        )
    for j, (df, idx) in enumerate(zip(getattr(res, "new_labels", []),
                                      getattr(res, "label_actions", []))):
        stage = f"{method_name}__a{idx}_labels{j}"
        results[stage] = store.write_stage(
            df.withColumn("_action", F.lit(idx)),
            "labels", run_id, stage,
            partition_by=["extra_label"], dedup_key=["node_id", "extra_label"],
        )
    return results


def materialize_kg(
    store: GraphStore,
    kg,
    run_id: str,
) -> dict:
    """Write a KGResult's nodes/edges/triples with lineage; resumable —
    re-invoking with the same run_id skips completed stages."""
    results = {}
    results["nodes"] = store.write_stage(
        kg.nodes, "nodes", run_id, "nodes",
        partition_by=["class"], dedup_key=["node_id"],
    )
    results["edges"] = store.write_stage(
        kg.edges, "edges", run_id, "edges",
        partition_by=["rel_type"], dedup_key=["src", "rel_type", "dst"],
    )
    results["triples"] = store.write_stage(
        kg.triples, "triples", run_id, "triples",
        partition_by=["pred"], dedup_key=["subj", "pred", "obj"],
    )
    return results
