"""Round-6 pipeline operators: URL normalization/filtering, C4 cleaning,
PII scrubbing, corpus-level line dedup.

Each operator's value semantics are driver-gated by its DuckDB twin
(tools/check_oracle.py); these tests pin the EDGE cases the synthetic
corpus can't reach (invalid URLs, all-boilerplate documents, empty
text) and the parity between the Spark column expression and the
kernel's Python normalize_url (kernel/metadata.py:141)."""

import duckdb
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


# --- URL normalization -------------------------------------------------------

URL_CASES = [
    # (raw, expected_norm)
    ("HTTP://WWW.Ex.COM:80/a/index.html?utm_source=x&b=2&a=1", "http://www.ex.com/a/?a=1&b=2"),
    ("https://Ex.com:443/path/?gclid=123&q=term#frag", "https://ex.com/path/?q=term"),
    ("https://ex.com/app#!route/42", "https://ex.com/app#!route/42"),
    ("https://ex.com/x?sessionid=abc&SID=1", "https://ex.com/x"),  # session ids match case-insensitively
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),  # non-default port kept
    ("not a url", "not a url"),  # invalid: untouched passthrough
    ("/relative/path?utm_source=x", "/relative/path?utm_source=x"),  # relative: untouched
]


def test_normalize_url_col_cases(spark):
    from trafilatura_spark.operators.urltools import normalize_url_col

    df = spark.createDataFrame([Row(url=raw) for raw, _ in URL_CASES])
    got = [r[0] for r in df.select(normalize_url_col(F.col("url"))).collect()]
    assert got == [exp for _, exp in URL_CASES]


def test_normalize_url_col_matches_kernel(spark):
    """The Spark column expression and kernel/metadata.py:normalize_url
    agree on absolute URLs without query params (the kernel keeps param
    ORDER — reference courlan behavior at the metadata callsite — while
    the column op sorts params for dedup-key stability, so the parity
    set is the param-free grammar both implement identically)."""
    from trafilatura_spark.kernel.metadata import normalize_url
    from trafilatura_spark.operators.urltools import normalize_url_col

    urls = [
        "HTTP://WWW.Ex.COM:80/Some/Path",
        "https://ex.com:443/a",
        "https://sub.EX.com/a#section",
        "https://ex.com/a#!page=2",
        "http://ex.com:8080/keep/port",
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    got = [r[0] for r in df.select(normalize_url_col(F.col("url"))).collect()]
    # the kernel keeps /index.html (courlan scrubs it on the CLI path
    # only), so compare on the shared rule set: scheme/host/port/fragment
    assert got == [normalize_url(u) for u in urls]


def test_normalize_urls_flags(spark):
    from trafilatura_spark.operators.urltools import normalize_urls

    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://ex.com/blog/page/3/"),
            Row(doc_id=2, url="https://ex.com/login?next=/"),
            Row(doc_id=3, url="https://ex.com/article?page=2"),
            Row(doc_id=4, url="https://ex.com/fine"),
            Row(doc_id=5, url="garbage"),
        ]
    )
    rows = {r["doc_id"]: r for r in normalize_urls(df).collect()}
    assert rows[1]["is_navigation"] and not rows[1]["keep"]
    assert rows[2]["is_not_crawlable"] and not rows[2]["keep"]
    assert rows[3]["is_navigation"]
    assert rows[4]["keep"] and rows[4]["host"] == "ex.com"
    assert rows[5]["host"] == "" and not rows[5]["keep"]


def test_normalize_urls_domain_and_lang(spark):
    from trafilatura_spark.operators.urltools import normalize_urls

    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://www.news.Ex.CO.UK/de/story-1"),
            Row(doc_id=2, url="https://blog.sub.example.com/post?hl=PT"),
            Row(doc_id=3, url="https://localhost/x"),
            Row(doc_id=4, url="https://ex.com/fr"),  # bare 2-letter terminal segment
            Row(doc_id=5, url="https://ex.com/developer/x"),  # 'de' prefix must NOT match
        ]
    )
    rows = {r["doc_id"]: r for r in normalize_urls(df).collect()}
    assert rows[1]["domain"] == "ex.co.uk" and rows[1]["url_lang"] == "de"
    assert rows[2]["domain"] == "example.com" and rows[2]["url_lang"] == "pt"
    assert rows[3]["domain"] == "localhost" and rows[3]["url_lang"] == ""
    assert rows[4]["url_lang"] == "fr"
    assert rows[5]["url_lang"] == ""


# --- C4 cleaning -------------------------------------------------------------

def test_quality_c4_edge_cases(spark):
    from trafilatura_spark.operators.textstats import quality_c4

    good = "\n".join(
        [
            "This is a perfectly fine first sentence with enough words.",
            "Here is another sentence that also terminates properly.",
            "And a third sentence keeps the document above the floor.",
        ]
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=""),  # empty doc: nothing kept, not a crash
            Row(doc_id=3, text=good + "\nPlease enable JavaScript to continue viewing."),
            Row(doc_id=4, text=good.replace("third", "{third}")),  # brace: doc dropped
            Row(doc_id=5, text="One good sentence is simply not enough here."),
        ]
    )
    rows = {r["doc_id"]: r for r in quality_c4(docs).collect()}
    assert rows[1]["c4_keep"] and rows[1]["n_kept_lines"] == 3 and rows[1]["n_sentences"] == 3
    assert rows[2]["n_kept_lines"] == 0 and rows[2]["clean_text"] == "" and not rows[2]["c4_keep"]
    # the javascript line is removed but the doc survives (3 clean sentences)
    assert rows[3]["n_kept_lines"] == 3 and rows[3]["c4_keep"]
    assert not rows[4]["c4_keep"]  # brace rule fires even though lines are clean
    assert rows[5]["n_kept_lines"] == 1 and not rows[5]["c4_keep"]  # < 3 sentences


def test_quality_c4_duckdb_twin_on_edge_corpus(spark):
    "The SQL twin reproduces the Spark verdicts on a hand-built corpus."
    from trafilatura_spark.operators.textstats import quality_c4, quality_c4_sql

    texts = [
        "A first proper sentence for the corpus here.\nshort\nA second one arrives with words.\nAnd a third closes it out properly.",
        "Lorem Ipsum dolor sit amet is the classic filler text sentence.\nAnother fine sentence follows it here.\nA third sentence completes the set.",
        "no terminal punctuation at all",
    ]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["doc_id"]: (r["n_kept_lines"], r["n_sentences"], r["c4_keep"], r["clean_text"])
        for r in quality_c4(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    # twin columns: doc_id, n_lines, n_kept_lines, n_sentences, clean_text, c4_keep
    want = {
        r[0]: (r[2], r[3], r[5], r[4])
        for r in con.execute(quality_c4_sql("text", "docs")).fetchall()
    }
    assert got == want


# --- PII scrubbing -----------------------------------------------------------

def test_scrub_pii(spark):
    from trafilatura_spark.operators.textstats import scrub_pii

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="Mail a.b-c+tag@sub.example.co.uk or call +44-207-9460123 from 10.0.0.1."),
            Row(doc_id=2, text="No pii in this one at all."),
            Row(doc_id=3, text="Version 1.2.3.4 of the spec."),  # version strings DO match the ipv4 shape
        ]
    )
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 1 and rows[1]["n_phones"] == 1
    assert rows[1]["scrubbed_text"] == "Mail <EMAIL> or call <PHONE> from <IP>."
    assert not rows[2]["has_pii"] and rows[2]["scrubbed_text"] == "No pii in this one at all."
    assert rows[3]["n_ips"] == 1  # documented false-positive class: dotted quads


# --- corpus-level line dedup ---------------------------------------------------

def test_line_dedup_all_boilerplate_doc_survives(spark):
    "A doc whose EVERY line is boilerplate keeps a row with kept_text=''."
    from trafilatura_spark.operators.dedup import line_dedup

    footer = "All rights reserved."
    promo = "Subscribe now."
    rows = [Row(doc_id=i, text=f"{footer}\nUnique line {i}.\n{promo}") for i in range(12)]
    rows.append(Row(doc_id=99, text=f"{footer}\n{promo}"))  # all boilerplate
    out = {r["doc_id"]: r for r in line_dedup(spark.createDataFrame(rows), min_doc_freq=10).collect()}
    assert len(out) == 13
    assert out[99]["n_kept"] == 0 and out[99]["kept_text"] == "" and out[99]["n_removed"] == 2
    assert out[3]["n_kept"] == 1 and out[3]["kept_text"] == "Unique line 3."
    assert out[3]["n_removed"] == 2


def test_line_dedup_keeps_order_and_threshold(spark):
    from trafilatura_spark.operators.dedup import line_dedup

    # 5 docs share a line — below min_doc_freq=10 — nothing is removed,
    # and multi-line reassembly preserves original line order
    rows = [Row(doc_id=i, text=f"alpha {i}\nshared line\nomega {i}") for i in range(5)]
    out = {r["doc_id"]: r for r in line_dedup(spark.createDataFrame(rows), min_doc_freq=10).collect()}
    assert all(r["n_removed"] == 0 for r in out.values())
    assert out[2]["kept_text"] == "alpha 2\nshared line\nomega 2"

    # same corpus at min_doc_freq=5: the shared line goes
    out = {r["doc_id"]: r for r in line_dedup(spark.createDataFrame(rows), min_doc_freq=5).collect()}
    assert all(r["n_removed"] == 1 for r in out.values())
    assert out[2]["kept_text"] == "alpha 2\nomega 2"


def test_line_dedup_duplicate_line_within_one_doc(spark):
    "A line repeated WITHIN one doc counts once toward doc frequency."
    from trafilatura_spark.operators.dedup import line_dedup

    rows = [Row(doc_id=1, text="x\nx\nx\nbody one"), Row(doc_id=2, text="x\nbody two")]
    out = {r["doc_id"]: r for r in line_dedup(spark.createDataFrame(rows), min_doc_freq=3).collect()}
    # doc frequency of "x" is 2 (< 3): kept everywhere, duplicates intact
    assert out[1]["kept_text"] == "x\nx\nx\nbody one" and out[1]["n_removed"] == 0


def test_line_dedup_skip_empty_preserves_blank_separators(spark):
    """skip_empty=True (the conversation-pipeline setting): blank lines
    are excluded from the census AND from removal — '\\n\\n'-assembled
    conversations keep their turn separators even when every document
    contains the empty line (round-7 ADVICE item: without the flag, 12
    documents sharing '' makes '' corpus boilerplate and every doc
    collapses to single-newline separation)."""
    from trafilatura_spark.operators.dedup import line_dedup

    rows = [
        Row(doc_id=i, text=f"user: question {i}\n\nassistant: answer {i}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    # default (oracle semantics): '' occurs in all 12 docs -> censused out
    legacy = {r["doc_id"]: r for r in line_dedup(df, min_doc_freq=10).collect()}
    assert legacy[5]["n_removed"] == 1 and "\n\n" not in legacy[5]["kept_text"]
    # skip_empty: separators survive verbatim, nothing else changes
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_freq=10, skip_empty=True).collect()}
    assert out[5]["n_removed"] == 0
    assert out[5]["kept_text"] == "user: question 5\n\nassistant: answer 5"


def test_postprocess_conversations_keeps_turn_separation(spark):
    "--dedup-lines over '\\n\\n'-assembled conversations keeps blank separators."
    from trafilatura_spark.operators.extract import postprocess_conversations

    rows = [
        Row(
            conv_id=str(i),
            n_turns=2,
            n_kept=2,
            conversation_text=f"user: question {i}\n\nassistant: answer {i}",
        )
        for i in range(12)
    ]
    out = postprocess_conversations(spark.createDataFrame(rows), dedup_lines=10)
    got = {r["conv_id"]: r for r in out.collect()}
    assert got["4"]["n_boilerplate_removed"] == 0
    assert got["4"]["conversation_text"] == "user: question 4\n\nassistant: answer 4"


# --- post-assembly pipeline (tools/submit_extract.py stages) -------------------

def test_postprocess_conversations_pipeline(spark):
    """dedup-lines -> C4 -> PII over assembled conversation documents:
    the composition the entrypoint's --dedup-lines/--c4-clean/--scrub-pii
    flags run, with each stage's effect visible in the output."""
    from trafilatura_spark.operators.extract import postprocess_conversations

    footer = "Generated by the export tool."
    rows = [
        Row(
            conv_id=str(i),
            n_turns=2,
            n_kept=2,
            conversation_text=(
                f"{footer}\n"
                f"This conversation number {i} contains a proper sentence.\n"
                f"Another full sentence numbered {i} keeps the document above the floor.\n"
                f"And a third one about {i} closes it out for the verdict.\n"
                f"Reach me at user{i}@example.com please."
            ),
        )
        for i in range(12)
    ]
    convs = spark.createDataFrame(rows)
    out = postprocess_conversations(convs, dedup_lines=10, c4_clean=True, scrub_pii=True)
    got = {r["conv_id"]: r for r in out.collect()}
    assert len(got) == 12
    r = got["3"]
    # stage 1: the shared footer (12 >= 10 conversations) is gone
    assert r["n_boilerplate_removed"] == 1 and footer not in r["conversation_text"]
    # stage 2: C4 keeps the 4 terminal-punctuated sentences, verdict true
    assert r["c4_keep"] and r["conversation_text"].count("\n") == 3
    # stage 3: the email was counted then scrubbed
    assert r["n_pii"] == 1 and "<EMAIL>" in r["conversation_text"]
    assert "user3@example.com" not in r["conversation_text"]


def test_postprocess_conversations_noop_passthrough(spark):
    "With no stage enabled the frame is returned unchanged."
    from trafilatura_spark.operators.extract import postprocess_conversations

    convs = spark.createDataFrame(
        [Row(conv_id="a", n_turns=1, n_kept=1, conversation_text="hello")]
    )
    assert postprocess_conversations(convs).collect() == convs.collect()


# --- streaming parity -----------------------------------------------------------

def test_streaming_r6_projections_stateless(spark, tmp_path):
    """URL normalization, C4 cleaning and PII scrubbing are pure
    projections, so they run NATIVELY under Structured Streaming with no
    state: stream output must equal the batch run row-for-row."""
    from trafilatura_spark.operators.textstats import quality_c4, scrub_pii
    from trafilatura_spark.operators.urltools import normalize_urls

    docs = [
        (1, "A first fine sentence with enough words here.\nshort\nMail me at a@b.co now please today.",
         "HTTP://Ex.COM:80/a/index.html?utm_source=x&b=1"),
        (2, "Second doc sentence one is here now.\nAnd sentence two arrives with words.\nAnd three closes it out now.",
         "https://ex.com/login"),
    ]
    schema = "doc_id long, text string, url string"
    inp = str(tmp_path / "r6_in")
    out = str(tmp_path / "r6_out")
    ckpt = str(tmp_path / "r6_ckpt")
    batch_df = spark.createDataFrame(docs, schema)
    batch_df.write.parquet(inp)

    def pipe(df):
        return (
            quality_c4(df)
            .join(scrub_pii(df).select("doc_id", "n_emails", "scrubbed_text"), "doc_id")
            .join(normalize_urls(df).select("doc_id", "url_norm", "keep"), "doc_id")
        )

    stream = spark.readStream.schema(schema).parquet(inp)
    q = (
        pipe(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.doc_id: r.asDict() for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: r.asDict() for r in pipe(batch_df).collect()}
    assert got == want
    assert got[1]["url_norm"] == "http://ex.com/a/?b=1"
    assert got[2]["keep"] is False


# --- persisted IVF index (build once / probe many) ------------------------------

def test_ivf_persisted_index_matches_inline(spark, tmp_path):
    """Probing the persisted index returns EXACTLY the inline ivf_topk
    results (centroids are rounded before persisting, so the parquet
    round-trip is exact), and the probe's cid join drives dynamic
    partition pruning into the cell-partitioned inverted scan — the
    read-only-probed-cells behavior that makes the index worth
    persisting at scale."""
    from trafilatura_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_from_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(emb, idx)
    queries = emb.filter(F.col("vec_id") < 5)
    from_index = ivf_topk_from_index(spark, idx, queries, k=5)
    inline = ivf_topk(emb, n_queries=5, k=5)
    assert sorted(map(tuple, from_index.collect())) == sorted(map(tuple, inline.collect()))

    plan = from_index._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


# --- incremental minhash dedup (persisted bucket index + shard probe) -----------

def test_minhash_probe_index_matches_direct_cross_pairs(spark, tmp_path):
    """Probing a new shard against the persisted corpus index finds
    EXACTLY the cross-corpus candidate pairs the one-shot pair generator
    finds over the union (same hash family => same buckets), and the
    probe never recomputes corpus signatures."""
    from trafilatura_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_pairs,
        minhash_probe_index,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # new shard: re-crawls of 10 corpus docs (one appended token — high
    # Jaccard near-dups) + 5 genuinely new docs
    recrawl = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" update")).alias("text"),
    )
    fresh = base.filter(F.col("doc_id").between(10, 14)).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    shard = recrawl.union(fresh)

    idx = str(tmp_path / "mh_index")
    build_minhash_index(base, idx)
    got = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_probe_index(spark, idx, shard).collect()
    }

    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in minhash_lsh_pairs(base.union(shard)).collect()
        if (r["id_a"] >= 10_000) != (r["id_b"] >= 10_000)  # cross pairs only
    }
    assert got == want
    # the planted re-crawls must actually be found
    assert sum(1 for new, old in got if new == old + 10_000) >= 8


def test_minhash_probe_index_streaming(spark, tmp_path):
    """The projection-rewritten signatures are STATELESS, so a newly
    crawled stream probes the persisted index as a plain stream-static
    join — streaming incremental dedup with no aggregation state, no
    watermark, results equal to the batch probe."""
    from trafilatura_spark.operators.dedup import (
        _band_buckets,
        build_minhash_index,
        minhash_probe_index,
        minhash_signatures,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    shard = base.filter(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" again")).alias("text"),
    )
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(base, idx)

    inp = str(tmp_path / "shard_in")
    out = str(tmp_path / "probe_out")
    ckpt = str(tmp_path / "probe_ckpt")
    shard.write.parquet(inp)

    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
    probes = _band_buckets(minhash_signatures(stream), "doc_id", 8, 4).withColumnRenamed(
        "doc_id", "new_id"
    )
    index = spark.read.parquet(idx)
    q = (
        probes.join(index, "bucket")
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r["new_id"], r["corpus_id"]) for r in spark.read.parquet(out).collect()}
    want = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_probe_index(spark, idx, shard).collect()
    }
    assert got == want and len(want) >= 8


def test_update_clusters_equals_full_recompute(spark):
    """Incremental cluster maintenance over hand-built pairs covering
    every case: join-one-cluster, BRIDGE-merge of two old clusters,
    first-pairing of a previously-unclustered corpus doc, shard-internal
    pair, untouched old cluster — result equals CC over the union."""
    from trafilatura_spark.operators.dedup import connected_components, update_clusters

    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    clusters = connected_components(old_pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    # new docs 100..102: 100 bridges clusters {1,2,3} and {10,11};
    # 101 pairs with unclustered corpus doc 50 and with shard-mate 102
    cross = spark.createDataFrame(
        [(100, 3), (100, 11), (101, 50)], "new_id long, corpus_id long"
    )
    shard = spark.createDataFrame([(101, 102)], "id_a long, id_b long")

    got = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in update_clusters(clusters, cross, shard).collect()
    }
    union_pairs = old_pairs.union(
        cross.select(F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b"))
    ).union(shard)
    want = {
        (r["node"], r["label"], r["node"] == r["label"])
        for r in connected_components(union_pairs).collect()
    }
    assert got == want
    # spot-check the semantics: the bridge merged everything into label 1,
    # the 50-group formed fresh, cluster {20,21} is untouched
    labels = {d: c for d, c, _ in got}
    assert labels[100] == labels[10] == labels[3] == 1
    assert labels[50] == labels[101] == labels[102] == 50
    assert labels[20] == 20 and labels[21] == 20


def test_update_clusters_end_to_end_with_probe(spark, tmp_path):
    "index -> probe -> update_clusters over real minhash on planted dups."
    from trafilatura_spark.operators.dedup import (
        build_minhash_index,
        dedup_clusters_df,
        minhash_lsh_pairs,
        minhash_probe_index,
        update_clusters,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # plant near-dups INSIDE the base corpus so it has clusters to start
    base = base.union(
        base.filter(F.col("doc_id") < 6).select(
            (F.col("doc_id") + 1_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    shard = base.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" redux")).alias("text"),
    )

    clusters = dedup_clusters_df(base).select("doc_id", "cluster_id")
    idx = str(tmp_path / "mh_idx2")
    build_minhash_index(base, idx)
    cross = minhash_probe_index(spark, idx, shard)
    shard_pairs = minhash_lsh_pairs(shard)

    got = {
        (r["doc_id"], r["cluster_id"])
        for r in update_clusters(clusters, cross, shard_pairs).collect()
    }
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters_df(base.union(shard)).collect()
    }
    assert got == want and len(want) >= 10
