"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: wall seconds over the suite (unit "sec", per-query
breakdown in "queries").  Extra keys report the graft's north-rule
numbers: extraction turns/sec and the N-vs-4N scaling efficiency
(local[N] vs local[4N] on the same input — the sandbox's stand-in for
N vs 4N executors; BASELINE.md explains the method).

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_SCALING  "0" to skip the scaling section (default on)
  SPARK_GRAFT_BENCH_CONVS  override conversation count for extraction
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

# sf-proportional extraction corpus: sf0.1 -> ~60k turns
_SF_GUESS = 0.1 if "0.1" in SF_DIR else 0.01 if "0.01" in SF_DIR else 0.001
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", str(max(100, int(45000 * _SF_GUESS)))))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q_events_sessions",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_lsh_topk",
    "text_token_stats",
]


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.ui.enabled", "false")
        .appName("trafilatura-spark-bench")
        .getOrCreate()
    )


def run_extraction(spark, n_convs: int, cpus: int) -> tuple:
    "Returns (wall_seconds, n_turns)."
    from trafilatura_spark.fixtures import transcripts_df
    from trafilatura_spark.operators.extract import extract_transcripts

    df = transcripts_df(spark, n_convs, num_slices=cpus * 2).cache()
    n_turns = df.count()  # materialize input so generation isn't timed
    t0 = time.monotonic()
    out = extract_transcripts(df, num_partitions=cpus * 2)
    # touch every extracted value so the full column is computed
    agg = out.selectExpr(
        "count(*) AS n", "sum(chars_kept) AS chars", "count(extracted_text) AS non_null"
    ).collect()[0]
    wall = time.monotonic() - t0
    assert agg.n == n_turns
    df.unpersist()
    return wall, n_turns


def main() -> None:
    from trafilatura_spark.queries import SPARK_QUERIES

    timings: dict = {}
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # relational + training-pipeline queries at SF_DIR
    for name in BENCH_QUERIES:
        fn = SPARK_QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        df.collect()
        timings[name] = round(time.monotonic() - t0, 3)

    # flagship extraction at full parallelism
    wall, n_turns = run_extraction(spark, N_CONVS, CPUS)
    timings["extract_transcripts"] = round(wall, 3)
    turns_per_sec = n_turns / wall if wall > 0 else 0.0
    spark.stop()

    scaling = None
    if RUN_SCALING and CPUS >= 4:
        low_cpus = max(1, CPUS // 4)
        spark_low = make_spark(low_cpus)
        spark_low.sparkContext.setLogLevel("ERROR")
        wall_low, n_low = run_extraction(spark_low, N_CONVS, low_cpus)
        spark_low.stop()
        tps_low = n_low / wall_low if wall_low > 0 else 0.0
        # efficiency of scaling from N to 4N cores on identical input
        efficiency = (turns_per_sec / tps_low) / (CPUS / low_cpus) if tps_low > 0 else 0.0
        scaling = {
            "low_parallelism": low_cpus,
            "high_parallelism": CPUS,
            "turns_per_sec_low": round(tps_low, 1),
            "turns_per_sec_high": round(turns_per_sec, 1),
            "scaling_efficiency": round(efficiency, 3),
        }
        timings["extract_transcripts_lowpar"] = round(wall_low, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "bench_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF_GUESS,
        "extraction_turns": n_turns,
        "extraction_turns_per_sec": round(turns_per_sec, 1),
        "cpus": CPUS,
    }
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
