"""Round-7 optimization measurement harness (guide §1.4): isolates each
bench query with the noop sink so the computation is timed without the
collect-to-driver path, dumps .explain("formatted") for plan-diff
evidence, and records the number of tasks in the heaviest map stage (the
single-file-input parallelism question).

Usage:
  python bench_extra.py [query ...]        # default: the heavy targets
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.

Does NOT touch bench.py (frozen for measurement); numbers here are
cited in OPTIMIZATION_r07.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")

DEFAULT_TARGETS = [
    "text_quality_repetition",
    "dedup_decontaminate",
    "dedup_minhash_lsh_prod",
    "ann_ivf_topk",
    "ann_lsh_multitable_topk",
    "dedup_jaccard_via_lsh",
    "q5_supplier_volume",
    "text_unigram_logprob",
    "text_quality_gopher",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_events_sessions",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_chunks",
    "url_normalize",
    "text_quality_c4",
    "text_pii_scrub",
    "dedup_lines",
]


def main() -> None:
    from bench import make_spark

    targets = sys.argv[1:] or DEFAULT_TARGETS
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "")
    from trafilatura_spark.queries import SPARK_QUERIES, VALIDATION_QUERIES

    ALL = {**SPARK_QUERIES, **VALIDATION_QUERIES}
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    spark.read.parquet(f"{SF_DIR}/nation.parquet").agg({"n_nationkey": "sum"}).collect()
    os.makedirs(PLAN_DIR, exist_ok=True)
    out = {}
    for name in targets:
        fn = ALL[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        # noop-sink timing, best of 3
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        # collect timing (bench.py methodology), best of 2
        bestc = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, SF_DIR).collect()
            bestc = min(bestc, time.monotonic() - t0)
        out[name] = {"noop_best3": round(best, 3), "collect_best2": round(bestc, 3)}
        if suffix:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": out}))


if __name__ == "__main__":
    main()
