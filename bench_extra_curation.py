"""Curation-block isolation bench — times the EXACT library-call shapes the
frozen bench.py curation block uses (reads the parquet itself, so library-
level parallelism fixes are visible here, entry-level ones are not).

    python bench_extra_curation.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tab2neo_spark.operators.corpus import domain_mixing_weights
    from tab2neo_spark.operators.decontam import ngram_collisions
    from tab2neo_spark.operators.dedup import (
        remove_repeated_regions, repeated_ngram_spans,
    )
    from tab2neo_spark.operators.pq import pq_assign, pq_rerank_topk, pq_train
    from tab2neo_spark.operators.textstats import token_count
    from tab2neo_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_curation",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    # warmup (first-use codegen) — bench.py discipline
    repeated_ngram_spans(docs.limit(50), "text", "doc_id", n=8).count()

    shapes = {
        "repeated_spans_xx": lambda: repeated_ngram_spans(
            docs, "text", "doc_id", n=8, min_count=2).count(),
        "repeated_cut_xx": lambda: remove_repeated_regions(
            docs, "text", "doc_id", n=8, min_count=2).count(),
        "mix_weights": lambda: domain_mixing_weights(
            token_count(docs, "text"), "source", "n_tokens", alpha=0.7).count(),
        "decontam_xxhash64": lambda: ngram_collisions(
            docs,
            docs.filter(F.col("doc_id") < 20).select(
                F.col("doc_id").alias("bench_doc"), "text"),
            "text", "doc_id", bench_id_col="bench_doc", n=8).count(),
    }

    out: dict[str, object] = {}
    for name, thunk in shapes.items():
        walls = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            thunk()
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
        print(f"{name}: {out[name]}", file=sys.stderr)

    # pq family exactly as bench.py composes it
    walls_t, walls_a, walls_r = [], [], []
    for r in range(args.reps):
        spark.sparkContext.setJobDescription(f"pq rep{r}")
        t0 = time.time()
        cb = pq_train(emb, "embedding", "vec_id", m=8, k=16, sample=400, iters=5)
        walls_t.append(round(time.time() - t0, 3))
        t0 = time.time()
        pq_assign(emb, "embedding", cb).count()
        walls_a.append(round(time.time() - t0, 3))
        t0 = time.time()
        pq_rerank_topk(
            pq_assign(emb, "embedding", cb), "embedding", "pq_codes",
            "vec_id", [0.1] * 64, cb, topk=10, rerank=200,
        ).count()
        walls_r.append(round(time.time() - t0, 3))
    out["pq_train"] = {"min": min(walls_t), "walls": walls_t}
    out["pq_assign"] = {"min": min(walls_a), "walls": walls_a}
    out["pq_rerank"] = {"min": min(walls_r), "walls": walls_r}
    print(f"pq: train={walls_t} assign={walls_a} rerank={walls_r}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
