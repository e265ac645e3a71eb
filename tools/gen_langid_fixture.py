"""Pin the 60-language char-n-gram classifier's outputs for the test
corpora into a fixture parquet, so text_lang_id_ngram gets a VALUE oracle
instead of a rows-only check.

The fixture maps md5(text) -> pred_lang for every distinct document text
across the sf dirs, computed by the kernel classifier itself at
generation time.  The driver-side oracle then joins `documents` to this
parquet in DuckDB while the Spark query runs the live classifier — a
hash match proves the classifier still produces exactly the pinned
labels (determinism + regression pinning; real-page ACCURACY is bounded
separately by tools/langid_agreement.py, 97.0% over 871 eval pages).

Regenerate (only when the classifier intentionally changes):
    python tools/gen_langid_fixture.py
"""

import hashlib
import sys

sys.path.insert(0, ".")

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = "tests/fixtures/langid_expected.parquet"


def main() -> None:
    import pyarrow.dataset as ds

    from trafilatura_spark.kernel.langid import classify_language

    seen = {}
    for sf in SF_DIRS:
        table = ds.dataset(f"{sf}/documents.parquet").to_table(columns=["text"])
        for text in table.column("text").to_pylist():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key not in seen:
                seen[key] = classify_language(text) if isinstance(text, str) else None
        print(f"{sf}: {len(seen)} distinct texts so far")
    out = pa.table(
        {
            "text_md5": pa.array(list(seen.keys()), pa.string()),
            "pred_lang": pa.array(list(seen.values()), pa.string()),
        }
    )
    pq.write_table(out, OUT, compression="zstd")
    print(f"wrote {OUT}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
