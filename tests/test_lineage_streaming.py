"""Resumability (per-partition lineage manifest) and streaming parity."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def small_df(spark):
    from trafilatura_spark.fixtures import transcripts_df

    return transcripts_df(spark, 12, num_slices=2)


def test_resume_after_simulated_crash(spark, small_df, tmp_path):
    from trafilatura_spark.plans.lineage import (
        completed_buckets,
        read_manifest,
        read_output,
        run_resumable_extraction,
    )

    out = str(tmp_path / "run1")
    n_buckets = 8
    # crash after one wave of 4 buckets
    summary1 = run_resumable_extraction(
        spark, small_df, out, n_buckets=n_buckets, wave_size=4, fail_after_waves=1
    )
    assert summary1["completed"] == 4
    assert len(completed_buckets(spark, out)) == 4

    # resume: only the remaining buckets run
    summary2 = run_resumable_extraction(spark, small_df, out, n_buckets=n_buckets, wave_size=4)
    assert summary2["resumed_from"] == 4
    assert summary2["completed"] == n_buckets

    # output is complete and keyed per turn
    result = read_output(spark, out)
    assert result.count() == small_df.count()
    assert result.select("conv_id", "turn_idx").distinct().count() == small_df.count()

    # manifest carries metrics per bucket
    manifest = read_manifest(spark, out)
    rows = manifest.collect()
    assert {r.part_bucket for r in rows} == set(range(n_buckets))
    assert all(r.status == "done" for r in rows)
    assert sum(r.n_turns for r in rows) == small_df.count()


def test_rerun_is_idempotent(spark, small_df, tmp_path):
    from trafilatura_spark.plans.lineage import read_output, run_resumable_extraction

    out = str(tmp_path / "run2")
    run_resumable_extraction(spark, small_df, out, n_buckets=4, wave_size=4)
    first = {(r.conv_id, r.turn_idx): r.extracted_text for r in read_output(spark, out).collect()}
    summary = run_resumable_extraction(spark, small_df, out, n_buckets=4, wave_size=4)
    assert summary["waves_run"] == 0  # nothing left to do
    second = {(r.conv_id, r.turn_idx): r.extracted_text for r in read_output(spark, out).collect()}
    assert first == second


def test_streaming_matches_batch(spark, small_df, tmp_path):
    from trafilatura_spark.operators.extract import extract_transcripts
    from trafilatura_spark.streaming.extract_stream import start_file_stream

    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")
    small_df.write.parquet(input_dir)

    q = start_file_stream(spark, input_dir, output_dir, checkpoint)
    q.awaitTermination(120)

    stream_rows = {
        (r.conv_id, r.turn_idx): (r.extracted_text, r.tier)
        for r in spark.read.parquet(output_dir).collect()
    }
    batch_rows = {
        (r.conv_id, r.turn_idx): (r.extracted_text, r.tier)
        for r in extract_transcripts(small_df, num_partitions=4).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_windowed_tier_metrics(spark, small_df, tmp_path):
    "Watermarked windowed aggregation over the streaming extraction."
    from trafilatura_spark.streaming.extract_stream import windowed_tier_metrics

    input_dir = str(tmp_path / "win_in")
    output_dir = str(tmp_path / "win_out")
    checkpoint = str(tmp_path / "win_ckpt")
    small_df.write.parquet(input_dir)

    from trafilatura_spark.streaming.extract_stream import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    metrics = windowed_tier_metrics(stream, window="10 minutes", watermark="5 minutes")
    q = (
        metrics.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(output_dir).collect()
    assert rows, "windowed metrics should emit finalized windows"
    tiers = {r.tier for r in rows}
    assert "main" in tiers
    assert all(r.n_turns > 0 for r in rows)


def test_empty_buckets_get_manifest_rows(spark, tmp_path):
    """A bucket with zero input rows must still be marked done (zero-count
    manifest row), or it re-runs on every resume and 'completed' can
    never reach n_buckets."""
    from trafilatura_spark.fixtures import transcripts_df
    from trafilatura_spark.plans.lineage import read_manifest, run_resumable_extraction

    tiny = transcripts_df(spark, 1, num_slices=1).limit(10)  # 10 turns, 32 buckets
    out = str(tmp_path / "sparse")
    n_buckets = 32
    summary = run_resumable_extraction(spark, tiny, out, n_buckets=n_buckets, wave_size=16)
    assert summary["completed"] == n_buckets
    rows = read_manifest(spark, out).collect()
    assert {r.part_bucket for r in rows} == set(range(n_buckets))
    empties = [r for r in rows if r.n_turns == 0]
    assert len(empties) >= n_buckets - 10, "10 turns cannot fill 32 buckets"
    assert all(r.status == "done" for r in empties)

    # a rerun resumes from a complete manifest: zero waves execute
    summary2 = run_resumable_extraction(spark, tiny, out, n_buckets=n_buckets, wave_size=16)
    assert summary2["resumed_from"] == n_buckets and summary2["waves_run"] == 0


def test_stateful_conversation_running_state(spark, tmp_path):
    """applyInPandasWithState: running per-conversation metrics emit update
    rows each micro-batch; a conversation idle past the event-time gap is
    finalized (state dropped) once the watermark passes its timeout."""
    from datetime import datetime

    from pyspark.sql import Row
    from trafilatura_spark.streaming.extract_stream import (
        TRANSCRIPT_SCHEMA,
        conversation_running_state,
    )

    input_dir = str(tmp_path / "state_in")
    checkpoint = str(tmp_path / "state_ckpt")
    para = "<p>" + "Sufficiently long paragraph text for the cascade to keep easily. " * 3 + "</p>"

    def turns(conv, n, base_hour):
        return [
            Row(conv_id=conv, turn_idx=i, role="user", text=para, tool=None,
                ts=datetime(2024, 1, 1, base_hour, i))
            for i in range(n)
        ]

    # three files -> three micro-batches (maxFilesPerTrigger=1); conv A's
    # event-time timeout (base 8:00 + gap) is passed by the watermark once
    # batch 2's data (9:00) commits, so batch 3 finalizes A
    spark.createDataFrame(turns("convA", 3, 8), TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(input_dir + "/f1")
    spark.createDataFrame(turns("convB", 2, 9), TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(input_dir + "/f2")
    spark.createDataFrame(turns("convC", 1, 11), TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(input_dir + "/f3")

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir + "/*")
    )
    out = conversation_running_state(stream, gap_minutes=10)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_state")
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM conv_state").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)

    # running update rows carry the correct totals
    a_updates = [r for r in by_conv["convA"] if not r.finalized]
    assert a_updates and a_updates[-1].n_turns == 3 and a_updates[-1].max_turn_idx == 2
    assert all(r.total_chars > 0 for r in a_updates)
    b_updates = [r for r in by_conv["convB"] if not r.finalized]
    assert b_updates and b_updates[-1].n_turns == 2

    # convA was finalized by the event-time timeout with its full totals
    a_final = [r for r in by_conv["convA"] if r.finalized]
    assert a_final and a_final[0].n_turns == 3 and a_final[0].max_turn_idx == 2


def test_streaming_dedup_within_watermark(spark, small_df, tmp_path):
    """At-least-once delivery: duplicated input turns are dropped by
    dropDuplicatesWithinWatermark before extraction, so the streamed
    output matches the UNIQUE turn set exactly."""
    from trafilatura_spark.streaming.extract_stream import (
        TRANSCRIPT_SCHEMA,
        dedup_stream,
        extract_stream_df,
    )

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # duplicate EVERY row (a retried upstream delivery)
    small_df.unionAll(small_df).write.parquet(inp)
    n_unique = small_df.count()

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(inp)
    deduped = dedup_stream(stream, watermark="1 hour")
    extracted = extract_stream_df(deduped)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(outp)
    assert got.count() == n_unique
    assert got.select("conv_id", "turn_idx").distinct().count() == n_unique


def test_streaming_quality_filters_stateless(spark, tmp_path):
    """The Gopher quality + repetition filters run NATIVELY under
    Structured Streaming with no aggregation state: quality_gopher was
    always a projection, and the round-5 shuffle-free quality_repetition
    (sorted run-walk projections) made the repetition metrics streamable
    too — the earlier explode->groupBy formulation would have required
    an output-mode/watermark design for what is conceptually a per-row
    computation.  Stream results must equal the batch run row-for-row."""
    from trafilatura_spark.operators.textstats import quality_gopher, quality_repetition

    docs = [
        (1, "the quick brown fox jumps over the lazy dog and that is fine "
            "because every sentence here varies its wording deliberately "
            "with plenty of distinct tokens to pass the word count gate "
            * 2),
        (2, "buy now " * 60),
        (3, "paragraph one\n\nparagraph one\n\nparagraph two"),
    ]
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")
    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    batch_df.write.parquet(inp)

    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
    joined = quality_repetition(stream).join(
        quality_gopher(stream).select("doc_id", "passes"), "doc_id"
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id: r
        for r in quality_repetition(batch_df)
        .join(quality_gopher(batch_df).select("doc_id", "passes"), "doc_id")
        .collect()
    }
    assert set(got) == {1, 2, 3}
    for k in want:
        assert got[k].asDict() == want[k].asDict()
    assert got[2].rep_passes is False          # spam 2-gram
    assert got[3].dup_para_frac > 0.3          # duplicated paragraph
