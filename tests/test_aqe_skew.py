"""AQE skew-join evidence (north rule: "conv_id-salted repartitioning +
AQE skew handling").  Salting balances the extraction UDF's CPU
(operators/extract.py salted_repartition); this test pins the OTHER
half: a heavily skewed shuffle join is split at runtime by adaptive
execution — the executed plan carries SortMergeJoin(skew=true) and a
skewed AQEShuffleRead — so a hot conv_id/doc_id in a downstream join
cannot pin a single task at corpus scale."""

from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shrunk thresholds so test-sized data exhibits the production path
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # 95% of the fact rows share one key — the hot-conversation shape
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 95, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "AQEShuffleRead" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
