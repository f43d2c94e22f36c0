"""Curation-chain throughput at a given parallelism (VERDICT r4 #8):
the repeated-substring chain (detect -> merge -> cut) + domain mixing
weights over the same deterministic synthetic pages the flagship
headroom runs use, with ~20% of docs carrying a shared boilerplate
sentence so the cut path does real work.

``python tools/curation_throughput.py <cores> <n_pages>``
Prints one JSON line with walls (min over reps after a warmup), docs/s,
result invariants, and the spill counters summed from the Spark status
API (the no-spill evidence).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

BOILER = (
    "subscribe to our newsletter for updates terms of service apply "
    "all rights reserved"
)


def spill_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
    )
    return {
        "memory_spilled": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spilled": sum(s.get("diskBytesSpilled", 0) for s in stages),
    }


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2])

    from pyspark.sql import functions as F

    from tab2neo_spark.datagen import synthetic_pages
    from tab2neo_spark.operators.corpus import domain_mixing_weights
    from tab2neo_spark.operators.dedup import remove_repeated_regions
    from tab2neo_spark.session import get_spark

    from tab2neo_spark.session import shuffle_partitions_for

    # UI on for this tool only: the status API's per-stage spill counters
    # are the no-spill evidence.
    # Shuffle partitions scale with DATA VOLUME, not core count (the
    # sizing rule in session.shuffle_partitions_for / docs/PLANS.md §20):
    # the chain shuffles ~40 window digests per page, and per-partition
    # agg state must fit execution memory (10M pages / 32 partitions =
    # 12M digest rows each -> measured 174 GB of spill; ~200 fits, zero
    # spill, 3.4x faster).
    shuffle_parts = max(cores, shuffle_partitions_for(n_pages * 40))
    spark = get_spark(app_name=f"curation_{cores}", cores=cores,
                      shuffle_partitions=shuffle_parts,
                      extra_conf={"spark.ui.enabled": "true"})
    pages = synthetic_pages(spark, n_pages)
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.regexp_extract("url", r"https://([^.]+)\.", 1).alias("domain"),
        F.when(
            F.pmod(F.xxhash64("url", F.lit(11)), F.lit(5)) < 1,
            F.concat_ws(" ", F.col("text"), F.lit(BOILER)),
        ).otherwise(F.col("text")).alias("text"),
    )
    docs = docs.repartition(max(8, cores * 2)).cache()
    n = docs.count()

    def run_chain() -> tuple[dict, float]:
        t0 = time.time()
        cut = remove_repeated_regions(docs, "text", "doc_id", n=8, min_count=2)
        row = cut.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_removed").alias("removed"),
            F.sum("n_kept").alias("kept"),
        ).collect()[0]
        return row.asDict(), time.time() - t0

    def run_mix() -> tuple[int, float]:
        t0 = time.time()
        toks = docs.select(
            "domain", F.size(F.split("text", r"\s+")).alias("n_tokens")
        )
        rows = domain_mixing_weights(toks, "domain", "n_tokens").collect()
        return len(rows), time.time() - t0

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    inv, _ = run_chain()  # warmup
    run_mix()
    chain_walls = sorted(run_chain()[1] for _ in range(reps))
    mix_walls = sorted(run_mix()[1] for _ in range(reps))

    print(json.dumps({
        "cores": cores,
        "n_pages": n,
        "chain_wall_s": round(chain_walls[0], 2),
        "chain_walls_all": [round(w, 2) for w in chain_walls],
        "chain_docs_per_sec": int(n / chain_walls[0]),
        "mix_wall_s": round(mix_walls[0], 2),
        "mix_walls_all": [round(w, 2) for w in mix_walls],
        "invariants": {k: int(v) for k, v in inv.items()},
        "spill": spill_totals(spark),
    }))


if __name__ == "__main__":
    main()
