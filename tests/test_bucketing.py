"""Bucketed co-located joins: the write-once-shuffle-never plan shape.

Asserts the actual physical plan: joining two tables bucketed on the
join key at the same bucket count produces a SortMergeJoin with ZERO
Exchange operators — the shuffle was paid at write time."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    from trafilatura_spark.plans.bucketing import write_bucketed

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("genre")
    )
    sigs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("sig")
    )
    write_bucketed(docs, "t_docs_b", "doc_id", 8, path=str(tmp_path / "docs"))
    write_bucketed(sigs, "t_sigs_b", "doc_id", 8, path=str(tmp_path / "sigs"))
    yield "t_docs_b", "t_sigs_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_sigs_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    from trafilatura_spark.plans.bucketing import colocated_join

    left, right = bucketed_tables
    # force the sort-merge path: a broadcast would trivially avoid the
    # exchange and hide what bucketing buys
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "doc_id")
        assert joined.count() == 2000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_pays_the_shuffle(spark, bucketed_tables, tmp_path):
    "Control: the same join over plain parquet shows the Exchange."
    left, _ = bucketed_tables
    plain = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("payload")
    )
    plain.write.mode("overwrite").parquet(str(tmp_path / "plain"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(left).join(
            spark.read.parquet(str(tmp_path / "plain")), "doc_id"
        )
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
