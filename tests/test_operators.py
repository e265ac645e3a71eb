"""Training-pipeline operators: semantic assertions beyond the DuckDB
oracle (which checks value parity — these check meaning)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_exact_dedup_finds_planted_dups(spark):
    from trafilatura_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], ["doc_id", "text"]
    )
    rows = exact_dedup(df).collect()
    assert len(rows) == 1
    assert rows[0].keep_id == 1
    assert rows[0].dup_count == 2


def test_minhash_identical_docs_share_signature(spark):
    from trafilatura_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank"),
            (3, "completely different words appear in this sentence about spark engines"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_lsh_pairs_catch_near_dups(spark):
    from trafilatura_spark.operators.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    df = spark.createDataFrame(
        [(1, base), (2, base + " rho"), (3, "unrelated content entirely about different topics and words")],
        ["doc_id", "text"],
    )
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jaccard_exact_value(spark):
    from trafilatura_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z z z z z")], ["doc_id", "text"]
    )
    rows = ngram_jaccard_pairs(df, threshold=0.9).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == 1.0


def test_simhash_deterministic_sketch(spark):
    "Identical docs share a signature; values match a local recomputation."
    import hashlib

    from trafilatura_spark.operators.dedup import SIMHASH_BITS, simhash

    def local_simhash(text):
        toks = " ".join(text.lower().strip().split()).split(" ")
        votes = [0] * SIMHASH_BITS
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(SIMHASH_BITS):
                votes[j] += 1 if h[j] in "13579bdf" else -1
        return sum((1 << j) for j in range(SIMHASH_BITS) if votes[j] > 0)

    texts = {
        1: "spark cluster executes distributed extraction pipelines with arrow batches",
        2: "spark cluster executes distributed extraction pipelines with arrow batches",
        3: "entirely unrelated poem about mountains rivers forests and evening skies",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    sigs = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert sigs[1] == sigs[2]
    for doc_id, text in texts.items():
        assert sigs[doc_id] == local_simhash(text)


def test_cosine_topk_self_similarity(spark):
    from trafilatura_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.01, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    rows = cosine_topk(df, n_queries=1, k=3).collect()
    by_rank = {r.rank: r.neighbor_id for r in rows}
    assert by_rank[1] == 1  # most similar
    assert by_rank[3] == 3  # opposite vector last


def test_lang_id_marks_languages(spark):
    from trafilatura_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is in that it for with"),
            (2, "der hund und die katze ist nicht ein mit den von das"),
            (3, "le chat et la maison est dans les pour que des une"),
        ],
        ["doc_id", "text"],
    )
    preds = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert preds == {1: "en", 2: "de", 3: "fr"}


def test_token_stats_values(spark):
    from trafilatura_spark.operators.textstats import token_stats

    df = spark.createDataFrame([(1, "Hello world, test.")], ["doc_id", "text"])
    r = token_stats(df).collect()[0]
    assert r.n_tokens == 3
    assert r.n_chars_measured == 18


def test_broadcast_in_topk_plan(spark):
    "The query side of ANN must broadcast, not shuffle."
    from trafilatura_spark.operators.similarity import cosine_topk

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = cosine_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
