"""Benchmark entry point (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], measures flagship
KG-construction throughput, and evidences the two-cluster-size scaling rule
by running the identical synthetic input at local[8] and local[32] in
subprocesses (sandbox proxy for N and 4N executors — BASELINE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
SCALING_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "2500000"))
SCALING_CORES = [
    int(c) for c in os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8,32").split(",")
]
RUN_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") != "1"

HEADLINE = [
    "kg_triples",
    "kg_extract_text",
    "kg_mentions",
    "agg_stats",
    "join_nway",
    "window_top1",
    "sessionize",
    "dedup_exact",
    "embed_topk",
    "lang_id",
    "fingerprint",
    "token_count",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from tab2neo_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS)
    qs = entrymod.queries()

    # warmup at the smallest SF: absorbs JIT/codegen/python-worker spinup so
    # headline numbers measure the queries, not process startup
    try:
        qs["kg_triples"](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        try:
            # count() materializes the whole plan without collecting rows
            fn(spark, SF_DIR).count()
            dt = time.time() - t0
            timings[name] = round(dt, 3)
            total += dt
        except Exception as ex:  # a broken query must not sink the bench
            timings[name] = -1.0
            print(f"bench: query {name} failed: {ex}", file=sys.stderr)

    # round-3 training-data-hygiene family, reported as a SEPARATE block so
    # the headline wall stays comparable across rounds
    HYGIENE = ["decontam", "pii_redact", "repetition", "url_hygiene",
               "stratified_cap", "pack_sequences", "bpe_tokens"]
    # block warmup (same discipline as the headline block): decontam at the
    # smallest SF absorbs the digest-path codegen so the timed numbers are
    # machine capability, not first-use compilation
    try:
        qs["decontam"](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass
    hygiene: dict[str, float] = {}
    for name in HYGIENE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            fn(spark, SF_DIR).count()
            hygiene[name] = round(time.time() - t0, 3)
        except Exception as ex:
            hygiene[name] = -1.0
            print(f"bench: hygiene query {name} failed: {ex}", file=sys.stderr)

    # production-mode decontam (hash_fn="xxhash64", the default) alongside
    # the gate's md5 oracle mode — evidences the digest-CPU win at the same
    # topology (broadcast probe, zero corpus shuffle)
    try:
        from pyspark.sql import functions as F

        from tab2neo_spark.operators.decontam import ngram_collisions

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        bench_side = docs.filter(F.col("doc_id") < 20).select(
            F.col("doc_id").alias("bench_doc"), "text"
        )
        t0 = time.time()
        ngram_collisions(docs, bench_side, "text", "doc_id",
                         bench_id_col="bench_doc", n=8).count()
        hygiene["decontam_xxhash64"] = round(time.time() - t0, 3)
    except Exception as ex:
        print(f"bench: decontam_xxhash64 failed: {ex}", file=sys.stderr)

    # round-4 curation family — its own block so headline/hygiene walls
    # stay comparable across rounds. Queries run in their production
    # (xxhash64 / default) modes here, not the md5 oracle modes the
    # correctness gates pin.
    curation: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811

        from tab2neo_spark.operators.corpus import domain_mixing_weights
        from tab2neo_spark.operators.dedup import (
            remove_repeated_regions, repeated_ngram_spans,
        )
        from tab2neo_spark.operators.pq import pq_assign, pq_train
        from tab2neo_spark.operators.textstats import token_count

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        # warmup (first-use codegen)
        repeated_ngram_spans(docs.limit(50), "text", "doc_id", n=8).count()

        t0 = time.time()
        repeated_ngram_spans(docs, "text", "doc_id", n=8, min_count=2).count()
        curation["repeated_spans_xx"] = round(time.time() - t0, 3)

        t0 = time.time()
        remove_repeated_regions(docs, "text", "doc_id", n=8, min_count=2).count()
        curation["repeated_cut_xx"] = round(time.time() - t0, 3)

        t0 = time.time()
        domain_mixing_weights(
            token_count(docs, "text"), "source", "n_tokens", alpha=0.7
        ).count()
        curation["mix_weights"] = round(time.time() - t0, 3)

        t0 = time.time()
        cb = pq_train(emb, "embedding", "vec_id", m=8, k=16, sample=400, iters=5)
        curation["pq_train"] = round(time.time() - t0, 3)
        t0 = time.time()
        pq_assign(emb, "embedding", cb).count()
        curation["pq_assign"] = round(time.time() - t0, 3)
        t0 = time.time()
        from tab2neo_spark.operators.pq import pq_rerank_topk

        pq_rerank_topk(
            pq_assign(emb, "embedding", cb), "embedding", "pq_codes",
            "vec_id", [0.1] * 64, cb, topk=10, rerank=200,
        ).count()
        curation["pq_rerank"] = round(time.time() - t0, 3)
    except Exception as ex:
        print(f"bench: curation block failed: {ex}", file=sys.stderr)

    result = {
        "metric": "kg_headline_queries_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "hygiene_queries": hygiene,
        # wall over the canonical HYGIENE list only (decontam_xxhash64 is a
        # comparison extra, not a block member — keeps walls round-comparable)
        "hygiene_wall": round(
            sum(v for k, v in hygiene.items() if k in HYGIENE and v > 0), 3
        ),
        "curation_queries": curation,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": CPUS,
    }

    if RUN_SCALING:
        scaling: dict[str, object] = {}
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")

        def _run_level(cores: int, reps: int | None = None) -> dict:
            try:
                run_env = env if reps is None else dict(
                    env, SPARK_GRAFT_BENCH_REPS=str(reps)
                )
                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tools", "kg_throughput.py"),
                     str(cores), str(SCALING_PAGES)],
                    capture_output=True, text=True, timeout=600, env=run_env,
                )
                line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
                return json.loads(line)
            except Exception as ex:  # timeout/parse — report partial scaling
                return {"error": str(ex)[:200]}

        for cores in SCALING_CORES:
            scaling[f"local_{cores}"] = _run_level(cores)

        # N -> 4N pairs present in the configured core list. Interference
        # can hit one level's ENTIRE window (all reps suppressed, no
        # within-level dispersion), so EVERY level that participates in an
        # efficiency pair gets a second measurement window UNCONDITIONALLY
        # — this also subsumes the old within-level dispersion guard (a
        # dispersed first window simply loses the max-throughput
        # comparison), keeping total bench wall inside the driver timeout
        # — symmetric, not gated on which side of 0.8 the first pass lands
        # (ADVICE r4: a one-sided retry-below-target policy biases the
        # reported efficiency upward). Per level we keep the max-throughput
        # window: interference is strictly additive, so across windows the
        # max is the machine-capability number, and within each window the
        # level's own reps already report MIN wall after warmup. Both
        # windows stay in the artifact.
        paired = sorted(
            {c for c in SCALING_CORES if c * 4 in SCALING_CORES}
            | {c * 4 for c in SCALING_CORES if c * 4 in SCALING_CORES}
        )
        for cores in paired:
            r1 = scaling.get(f"local_{cores}", {})
            if not isinstance(r1, dict) or not r1.get("docs_per_sec"):
                continue
            # 2 reps in the second window (vs 3 in the first): the window
            # exists to catch whole-window interference, and min-of-2 after
            # warmup suffices for that while keeping total bench wall
            # inside the driver's timeout
            r2 = _run_level(cores, reps=2)
            if r2.get("docs_per_sec", 0) > r1.get("docs_per_sec", 0):
                r2["second_window"] = {
                    "kept": "rerun", "first_walls": r1.get("walls_all"),
                    "first_docs_per_sec": r1.get("docs_per_sec"),
                }
                scaling[f"local_{cores}"] = r2
            else:
                r1["second_window"] = {
                    "kept": "first", "rerun_walls": r2.get("walls_all"),
                    "rerun_docs_per_sec": r2.get("docs_per_sec"),
                }
        for lo, hi in [(c, c * 4) for c in SCALING_CORES if c * 4 in SCALING_CORES]:
            dlo = scaling.get(f"local_{lo}", {}).get("docs_per_sec")
            dhi = scaling.get(f"local_{hi}", {}).get("docs_per_sec")
            if dlo and dhi:
                scaling[f"efficiency_{lo}_to_{hi}"] = round(dhi / (4.0 * dlo), 3)
        result["kg_throughput_scaling"] = scaling
        # peak = best measured throughput across ALL levels: on this host
        # external interference can hit one level's window and make the
        # widest parallelism not the fastest (noise analysis in
        # BENCH/BASELINE.md)
        rates = [
            v.get("docs_per_sec")
            for v in scaling.values()
            if isinstance(v, dict) and v.get("docs_per_sec")
        ]
        if rates:
            result["docs_per_sec_peak"] = max(rates)

    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
