"""Streaming extraction: the same mapInPandas cascade over readStream.

The reference is strictly batch (SURVEY.md §2.9); this extends the graft
to continuous ingestion: a file-source (or any) streaming DataFrame of
transcript turns flows through the identical batch function, so batch
and streaming outputs are per-turn equal by construction.  Exactly-once
delivery comes from the sink checkpoint; per-turn results are
deterministic so replays are idempotent.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..kernel import DEFAULT_OPTIONS, Options
from ..operators.extract import make_extract_batch_fn

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("extracted_text", StringType(), True),
        StructField("tier", StringType(), False),
        StructField("chars_kept", IntegerType(), False),
    ]
)


def extract_stream_df(stream_df: DataFrame, options: Options = DEFAULT_OPTIONS) -> DataFrame:
    "Apply the extraction cascade to a streaming DataFrame of turns."
    fn = make_extract_batch_fn(options, passthrough_cols=["conv_id", "turn_idx"])
    return stream_df.select("conv_id", "turn_idx", "text").mapInPandas(fn, schema=OUTPUT_SCHEMA)


def windowed_tier_metrics(stream_df: DataFrame, options: Options = DEFAULT_OPTIONS,
                          window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Streaming pipeline metrics: per-event-time-window tier counts with
    a watermark for late turns — the monitoring face of a continuous
    extraction job (tier drift over ingestion time)."""
    from pyspark.sql import functions as F

    fn = make_extract_batch_fn(options, passthrough_cols=["conv_id", "turn_idx", "ts"])
    schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField("ts", TimestampType(), True),
            StructField("extracted_text", StringType(), True),
            StructField("tier", StringType(), False),
            StructField("chars_kept", IntegerType(), False),
        ]
    )
    extracted = stream_df.select("conv_id", "turn_idx", "ts", "text").mapInPandas(fn, schema=schema)
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("tier"))
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum("chars_kept").alias("chars_kept"))
    )


def start_file_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    options: Options = DEFAULT_OPTIONS,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """File-source streaming job: parquet-in -> extraction -> parquet-out
    with checkpointing.  ``available_now=True`` drains existing input and
    stops (micro-batch backfill mode); otherwise runs continuously."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    out = extract_stream_df(stream, options)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
