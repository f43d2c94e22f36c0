"""Per-query isolation bench (guide §1.4): times each declared query with
the noop sink so the computation is measured, not the sink, and optionally
captures .explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

Separate from the FROZEN bench.py (driver contract). Usage:

    python bench_extra.py [--sf DIR] [--reps N] [--explain plans/r06 --suffix before] [query ...]

No queries given -> the full headline+hygiene+curation set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    # headline
    "kg_triples", "kg_extract_text", "kg_mentions", "agg_stats", "join_nway",
    "window_top1", "sessionize", "dedup_exact", "embed_topk", "lang_id",
    "fingerprint", "token_count",
    # hygiene
    "decontam", "pii_redact", "repetition", "url_hygiene", "stratified_cap",
    "pack_sequences", "bpe_tokens",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory for explain captures")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--count", action="store_true",
                    help="time .count() instead of the noop sink (bench.py parity)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tab2neo_spark.session import get_spark

    spark = get_spark(app_name="bench_extra",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))
    qs = entrymod.queries()
    names = args.queries or DEFAULT_QUERIES

    # warmup: absorb JIT/codegen/python-worker spinup (CLAUDE.md discipline)
    try:
        qs["kg_triples"](spark, "/root/testdata/sf0.001").count()
        qs["decontam"](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass

    out: dict[str, object] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            out[name] = "missing"
            continue
        walls = []
        try:
            for r in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name} rep{r}")
                # fn() is INSIDE the timed region — bench.py parity (plan
                # construction and any driver-side metadata jobs count)
                t0 = time.time()
                df = fn(spark, args.sf)
                if args.count:
                    df.count()
                else:
                    _noop(df)
                walls.append(round(time.time() - t0, 3))
            out[name] = {"min": min(walls), "walls": walls}
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                df = fn(spark, args.sf)
                p = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(p)
        except Exception as ex:
            out[name] = f"FAIL: {ex}"[:300]
            print(f"bench_extra: {name} failed: {ex}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "mode": "count" if args.count else "noop",
                      "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
