"""Pin the full-cascade flagship queries' outputs into fixture parquets,
so the three rows-only registry entries get VALUE oracles (the same
pattern tools/gen_langid_fixture.py established for the 60-language
classifier, blessed in the round-4 verdict).

extract_transcript_turns and extract_turn_metadata run over the
DETERMINISTIC synthetic transcript corpus (fixtures.transcripts_df),
keyed by (conv_id, turn_idx) and independent of the sf dir — so their
outputs, computed once here, replay identically at any scale factor.
The driver's DuckDB oracle reads the fixture while Spark runs the live
cascade: a hash match proves the run reproduces the pinned rows exactly
(determinism + regression pinning; extraction CORRECTNESS vs the
reference is pinned separately by the parity suites and the
oracle-checked extract_documents_* queries).  extract_tier_metrics gets
a real SQL oracle derived from the turns fixture by aggregation.

Regenerate (only when cascade behavior intentionally changes):
    python tools/gen_cascade_fixture.py
"""

import os
import sys

sys.path.insert(0, ".")

OUT_TURNS = "tests/fixtures/cascade_turns_expected.parquet"
OUT_META = "tests/fixtures/turn_metadata_expected.parquet"


def main() -> None:
    from pyspark.sql import SparkSession

    from trafilatura_spark import queries as Q

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("gen-cascade-fixture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        turns = Q.extract_transcript_turns(spark, "").toPandas()
        meta = Q.extract_turn_metadata(spark, "").toPandas()
    finally:
        spark.stop()
    os.makedirs("tests/fixtures", exist_ok=True)
    turns.to_parquet(OUT_TURNS, compression="zstd", index=False)
    meta.to_parquet(OUT_META, compression="zstd", index=False)
    print(f"wrote {OUT_TURNS}: {len(turns)} rows; {OUT_META}: {len(meta)} rows")


if __name__ == "__main__":
    main()
