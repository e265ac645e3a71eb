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


def dedup_stream(
    stream_df: DataFrame,
    watermark: str = "30 minutes",
    keys: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same
    (conv_id, turn_idx) arriving within the watermark horizon —
    Structured Streaming's dropDuplicatesWithinWatermark, so the dedup
    state is BOUNDED (keys expire with the watermark) instead of growing
    forever like a plain dropDuplicates would on an unbounded stream.
    This is the streaming face of the exact-dedup operator: at-least-once
    sources (Kafka, file backfills, retried upstream jobs) deliver
    duplicates; the extraction cost per duplicate is saved by deduping
    BEFORE the mapInPandas cascade."""
    return stream_df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


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


def conversation_running_state(
    stream_df: DataFrame,
    options: Options = DEFAULT_OPTIONS,
    gap_minutes: int = 10,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-conversation running extraction metrics with event-time session
    finalization.

    Each micro-batch updates a per-conv_id state (turn count, chars kept,
    max turn_idx) and emits an update row; a conversation idle past
    ``gap_minutes`` of event time (watermark-driven GroupStateTimeout)
    emits a final row with finalized=true and drops its state.  This is
    the north star's "custom stateful operator" shape: state lives in the
    state store (RocksDB/HDFS-backed on a cluster), keyed by conv_id, so
    memory scales with ACTIVE conversations, not corpus size."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    fn = make_extract_batch_fn(options, passthrough_cols=["conv_id", "turn_idx", "ts"])
    extract_schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField("ts", TimestampType(), True),
            StructField("extracted_text", StringType(), True),
            StructField("tier", StringType(), False),
            StructField("chars_kept", IntegerType(), False),
        ]
    )
    extracted = stream_df.select("conv_id", "turn_idx", "ts", "text").mapInPandas(
        fn, schema=extract_schema
    )

    out_schema = (
        "conv_id string, n_turns bigint, total_chars bigint, max_turn_idx int, finalized boolean"
    )
    state_schema = "n_turns bigint, total_chars bigint, max_turn_idx int"
    gap_ms = gap_minutes * 60_000

    def update_conv(key, pdfs, state):
        (conv_id,) = key
        if state.hasTimedOut:
            n, chars, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": conv_id, "n_turns": n, "total_chars": chars,
                  "max_turn_idx": mx, "finalized": True}]
            )
            return
        n, chars, mx = state.get if state.exists else (0, 0, -1)
        latest = None
        for pdf in pdfs:
            n += len(pdf)
            chars += int(pdf["chars_kept"].fillna(0).sum())
            mx = max(mx, int(pdf["turn_idx"].max()))
            ts_max = pdf["ts"].max()
            if not pd.isna(ts_max):
                latest = ts_max if latest is None else max(latest, ts_max)
        state.update((n, chars, mx))
        if latest is not None:
            state.setTimeoutTimestamp(int(latest.timestamp() * 1000) + gap_ms)
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_turns": n, "total_chars": chars,
              "max_turn_idx": mx, "finalized": False}]
        )

    return (
        extracted.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update_conv, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
        )
    )
