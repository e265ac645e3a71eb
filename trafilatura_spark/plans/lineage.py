"""Checkpoint-resumable extraction runs with per-partition lineage.

The north rule (BASELINE.json) requires runs to be resumable from
checkpoint with per-partition lineage and extraction metrics.  The
reference has no equivalent (it reruns files; SURVEY.md §4) — this is
Spark-native orchestration:

- the input is bucketed deterministically: bucket = pmod(xxhash64(conv_id,
  turn_idx), n_buckets).  Buckets are the resume/lineage unit (stand-in
  for Iceberg partitions; works over plain parquet here).
- output parquet is partitioned by bucket and written with dynamic
  partition overwrite, so re-processing a bucket is idempotent.
- a manifest parquet (one row per completed bucket) records status +
  extraction metrics (turn counts, chars kept, per-tier counts).  Job
  start anti-joins completed buckets; only missing buckets run.
- buckets are processed in waves; the manifest commits after each wave,
  bounding lost work to one wave on failure.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import DEFAULT_OPTIONS, Options
from ..operators.extract import extract_transcripts

MANIFEST_SUBDIR = "_lineage_manifest"
DATA_SUBDIR = "data"


def _manifest_path(output_path: str) -> str:
    return os.path.join(output_path, MANIFEST_SUBDIR)


def _data_path(output_path: str) -> str:
    return os.path.join(output_path, DATA_SUBDIR)


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "part_bucket", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, output_path: str) -> set:
    "Buckets already marked done in the manifest (empty set on first run)."
    path = _manifest_path(output_path)
    try:
        manifest = spark.read.parquet(path)
    except Exception:
        return set()
    return {r.part_bucket for r in manifest.filter(F.col("status") == "done").select("part_bucket").collect()}


def run_resumable_extraction(
    spark: SparkSession,
    df: DataFrame,
    output_path: str,
    n_buckets: int = 64,
    wave_size: int = 16,
    options: Options = DEFAULT_OPTIONS,
    fail_after_waves: Optional[int] = None,
) -> dict:
    """Run (or resume) the extraction job.  Returns a summary dict.

    ``fail_after_waves`` is a test hook: stop after N waves to simulate a
    crash; the next call resumes from the manifest.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # cache the bucketed input: every wave filters it, and without the cache
    # each wave would recompute the full input lineage
    bucketed = with_bucket(df, n_buckets).persist()
    done = completed_buckets(spark, output_path)
    todo = sorted(set(range(n_buckets)) - done)

    waves_run = 0
    for wave_start in range(0, len(todo), wave_size):
        wave = todo[wave_start : wave_start + wave_size]
        wave_df = bucketed.filter(F.col("part_bucket").isin(wave))
        extracted = extract_transcripts(
            wave_df,
            options=options,
            passthrough_cols=["conv_id", "turn_idx", "part_bucket"],
        ).persist()  # one extraction pass serves both the write and the metrics
        t0 = time.monotonic()
        # idempotent write: dynamic overwrite replaces exactly these buckets
        (
            extracted.write.mode("overwrite")
            .partitionBy("part_bucket")
            .parquet(_data_path(output_path))
        )
        elapsed = time.monotonic() - t0

        # lineage row per bucket with extraction metrics.  A left join FROM
        # the wave's bucket list backfills zero-count rows for EMPTY
        # buckets: without them an empty bucket never reaches the manifest,
        # is never marked done, and re-runs on every resume.  The per-wave
        # metrics aggregate is at most len(wave) rows, so IT is the
        # broadcast side (a broadcast hint on the preserved side of an
        # outer join is unachievable and would be silently dropped).
        wave_buckets = spark.createDataFrame(
            [(int(b),) for b in wave], "part_bucket int"
        )
        wave_metrics = extracted.groupBy("part_bucket").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("chars_kept").alias("chars_kept"),
            F.count("extracted_text").alias("n_extracted"),
            F.sum(F.when(F.col("tier") == "main", 1).otherwise(0)).alias("n_main"),
            F.sum(F.when(F.col("tier").startswith("disc"), 1).otherwise(0)).alias("n_discarded"),
        )
        metrics = (
            wave_buckets.join(F.broadcast(wave_metrics), "part_bucket", "left")
            .fillna(0, ["n_turns", "chars_kept", "n_extracted", "n_main", "n_discarded"])
            .withColumn("status", F.lit("done"))
            .withColumn("wall_seconds", F.lit(round(elapsed, 3)))
        )
        metrics.write.mode("append").parquet(_manifest_path(output_path))
        extracted.unpersist()

        waves_run += 1
        if fail_after_waves is not None and waves_run >= fail_after_waves:
            break

    bucketed.unpersist()
    final_done = completed_buckets(spark, output_path)
    return {
        "n_buckets": n_buckets,
        "resumed_from": len(done),
        "completed": len(final_done),
        "waves_run": waves_run,
    }


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(_data_path(output_path))


def read_manifest(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(_manifest_path(output_path))
