"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the same join keys recur across every pipeline run (documents
joined to signatures, turns to metadata, orders to lineitems).  Paying
the shuffle once at WRITE time — `bucketBy(n, key)` + `sortBy(key)` —
lets every subsequent SortMergeJoin on that key run with NO Exchange on
either side: Spark's bucketed scan already satisfies the join's
distribution and ordering requirements.  The test suite asserts the
plan shape (SortMergeJoin present, zero Exchange operators).

Bucket-count guidance: pick n_buckets so one bucket of the LARGER table
is ~128-512 MB (task-sized); both sides must use the same n_buckets (or
integer multiples with spark.sql.bucketing.coalesceBucketsInJoin) for
the shuffle to be elided.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: Optional[str] = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.  Bucketed
    layout requires the table catalog (saveAsTable); ``path`` makes it an
    external table at that location."""
    writer = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketing tables on their bucket column.  With both
    sides bucketed+sorted by ``on`` at the same bucket count, the
    SortMergeJoin needs no Exchange and no per-task Sort — scan-join
    directly (assert with tests/test_bucketing.py's plan check)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
