"""Rolling-crawl dedup maintenance: probe a new shard against the
persisted MinHash index, update the cluster assignment, append the
shard's buckets to the index.

    spark-submit --master <cluster> --py-files /tmp/tspark.zip \
        tools/dedup_maintain.py --index /path/mh_index \
        --clusters /path/clusters --shard /path/new_docs_parquet \
        --output /path/out

First run (no index/clusters yet): pass --bootstrap with --shard as the
initial corpus; the index and cluster assignment are created from it.

Per-shard cost is O(shard + touched clusters): the corpus is never
re-hashed (its buckets live in the index), never re-clustered (only the
delta graph runs connected components), and the shard's buckets are
broadcast into the index join.  Outputs: <output>/clusters (the full
updated assignment) and the index at --index gains the shard's buckets
(written via a staging subdir so a crashed run never corrupts it).
Prints ONE summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="persisted MinHash bucket index dir")
    ap.add_argument("--clusters", help="current cluster assignment parquet (omit with --bootstrap)")
    ap.add_argument("--shard", required=True, help="new shard parquet with (doc_id, text)")
    ap.add_argument("--output", required=True, help="output dir (gets /clusters)")
    ap.add_argument("--bootstrap", action="store_true",
                    help="no prior state: build index + clusters from --shard itself")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("trafilatura-spark-dedup-maintain").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from trafilatura_spark.operators.dedup import (
        _band_buckets,
        DEFAULT_BANDS,
        DEFAULT_NUM_HASHES,
        build_minhash_index,
        dedup_clusters_df,
        minhash_lsh_pairs,
        minhash_probe_index,
        minhash_signatures,
        update_clusters,
    )

    shard = spark.read.parquet(args.shard).select("doc_id", "text")
    out_clusters = os.path.join(args.output, "clusters")

    if args.bootstrap:
        build_minhash_index(shard, args.index)
        clusters = dedup_clusters_df(shard).select("doc_id", "cluster_id", "is_keeper")
        clusters.write.mode("overwrite").parquet(out_clusters)
        n = spark.read.parquet(out_clusters).count()
        print(json.dumps({"bootstrap": True, "clustered_docs": n}))
        spark.stop()
        return 0

    clusters = spark.read.parquet(args.clusters).select("doc_id", "cluster_id")
    cross = minhash_probe_index(spark, args.index, shard)
    shard_pairs = minhash_lsh_pairs(shard)
    updated = update_clusters(clusters, cross, shard_pairs)
    updated.write.mode("overwrite").parquet(out_clusters)

    # append the shard's buckets so the NEXT shard probes against them
    # too; stage-then-move keeps the index readable if this run dies
    staging = os.path.join(args.output, "_index_append")
    _band_buckets(
        minhash_signatures(shard), "doc_id", DEFAULT_NUM_HASHES, DEFAULT_BANDS
    ).withColumnRenamed("doc_id", "corpus_id").write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("append").parquet(args.index)

    res = spark.read.parquet(out_clusters)
    summary = {
        "bootstrap": False,
        "shard_docs": shard.count(),
        "cross_candidates": cross.count(),
        "clustered_docs": res.count(),
        "clusters": res.select("cluster_id").distinct().count(),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
