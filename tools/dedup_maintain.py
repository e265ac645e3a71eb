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
updated assignment) and the index at --index gains the shard's buckets.

Index layout and idempotence (round-7 fixes, ADVICE r6): each shard's
buckets live in their own ``shard=<name>`` subdirectory — re-running a
failed shard overwrites ONLY its own subdir, so a crash mid-append can
never duplicate index rows or corrupt other shards' buckets, and the
index stays readable throughout.  The hash family (num_hashes, bands,
shingle n) is part of the index contract: it is recorded in
``_hash_family.json`` at bootstrap and later runs ALWAYS use the
recorded family (a --num-hashes/--bands flag that contradicts it is an
error, not a silent recall collapse).  Defaults are the PRODUCTION
profile (128 hashes / 32 bands) — the gate profile documented in
operators/dedup.py as 'NOT production parameters' was the old implicit
default.  Prints ONE summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

META_NAME = "_hash_family.json"


def _shard_name(args) -> str:
    raw = args.shard_name or os.path.basename(os.path.normpath(args.shard))
    return re.sub(r"[^A-Za-z0-9_.\-]", "_", raw) or "shard"


def _read_family(index: str):
    path = os.path.join(index, META_NAME)
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return None


def _write_family(index: str, family: dict) -> None:
    os.makedirs(index, exist_ok=True)
    with open(os.path.join(index, META_NAME), "w") as fh:
        json.dump(family, fh)


def _resolve_family(args, index: str) -> dict:
    "Recorded family wins; explicit contradicting flags are an error."
    from trafilatura_spark.operators.dedup import (
        DEFAULT_SHINGLE_N,
        PRODUCTION_BANDS,
        PRODUCTION_NUM_HASHES,
    )

    recorded = _read_family(index)
    if recorded is None:
        # pre-round-7 index with no recorded family: flags, else production
        return {
            "num_hashes": args.num_hashes or PRODUCTION_NUM_HASHES,
            "bands": args.bands or PRODUCTION_BANDS,
            "shingle_n": args.shingle_n or DEFAULT_SHINGLE_N,
        }
    for key, flag in (("num_hashes", args.num_hashes), ("bands", args.bands), ("shingle_n", args.shingle_n)):
        if flag is not None and flag != recorded[key]:
            raise SystemExit(
                f"--{key.replace('_', '-')}={flag} contradicts the index's recorded "
                f"hash family {recorded} — the family is part of the index contract"
            )
    return recorded


def _write_shard_buckets(spark, shard_df, index: str, name: str, family: dict) -> None:
    "Stage the shard's buckets into its own shard= subdir (idempotent)."
    from trafilatura_spark.operators.dedup import _band_buckets, minhash_signatures

    sigs = minhash_signatures(shard_df, num_hashes=family["num_hashes"], n=family["shingle_n"])
    buckets = _band_buckets(sigs, "doc_id", family["num_hashes"], family["bands"]).withColumnRenamed(
        "doc_id", "corpus_id"
    )
    buckets.write.mode("overwrite").parquet(os.path.join(index, f"shard={name}"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="persisted MinHash bucket index dir")
    ap.add_argument("--clusters", help="current cluster assignment parquet (omit with --bootstrap)")
    ap.add_argument("--shard", required=True, help="new shard parquet with (doc_id, text)")
    ap.add_argument("--output", required=True, help="output dir (gets /clusters)")
    ap.add_argument("--bootstrap", action="store_true",
                    help="no prior state: build index + clusters from --shard itself")
    ap.add_argument("--shard-name", help="index subdir name for this shard (default: basename of --shard)")
    ap.add_argument("--num-hashes", type=int, default=None,
                    help="MinHash family size at bootstrap (default: production 128)")
    ap.add_argument("--bands", type=int, default=None,
                    help="LSH bands at bootstrap (default: production 32)")
    ap.add_argument("--shingle-n", type=int, default=None,
                    help="word-shingle n at bootstrap (default 3)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("trafilatura-spark-dedup-maintain").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from trafilatura_spark.operators.dedup import (
        DEFAULT_SHINGLE_N,
        PRODUCTION_BANDS,
        PRODUCTION_NUM_HASHES,
        dedup_clusters_df,
        minhash_lsh_pairs,
        minhash_probe_index,
        update_clusters,
    )

    shard = spark.read.parquet(args.shard).select("doc_id", "text")
    out_clusters = os.path.join(args.output, "clusters")
    name = _shard_name(args)

    if args.bootstrap:
        family = {
            "num_hashes": args.num_hashes or PRODUCTION_NUM_HASHES,
            "bands": args.bands or PRODUCTION_BANDS,
            "shingle_n": args.shingle_n or DEFAULT_SHINGLE_N,
        }
        _write_shard_buckets(spark, shard, args.index, name, family)
        _write_family(args.index, family)
        clusters = dedup_clusters_df(
            shard, num_hashes=family["num_hashes"], bands=family["bands"], n=family["shingle_n"]
        ).select("doc_id", "cluster_id", "is_keeper")
        clusters.write.mode("overwrite").parquet(out_clusters)
        n = spark.read.parquet(out_clusters).count()
        print(json.dumps({"bootstrap": True, "clustered_docs": n, "hash_family": family}))
        spark.stop()
        return 0

    family = _resolve_family(args, args.index)
    clusters = spark.read.parquet(args.clusters).select("doc_id", "cluster_id")
    cross = minhash_probe_index(
        spark, args.index, shard,
        n=family["shingle_n"], num_hashes=family["num_hashes"], bands=family["bands"],
    )
    shard_pairs = minhash_lsh_pairs(
        shard, n=family["shingle_n"], num_hashes=family["num_hashes"], bands=family["bands"]
    )
    updated = update_clusters(clusters, cross, shard_pairs)
    updated.write.mode("overwrite").parquet(out_clusters)

    # idempotent append: this shard's buckets land in their own subdir —
    # a rerun overwrites the same subdir instead of appending duplicates
    _write_shard_buckets(spark, shard, args.index, name, family)

    res = spark.read.parquet(out_clusters)
    summary = {
        "bootstrap": False,
        "shard": name,
        "shard_docs": shard.count(),
        "cross_candidates": cross.count(),
        "clustered_docs": res.count(),
        "clusters": res.select("cluster_id").distinct().count(),
        "hash_family": family,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
