"""Property tests for the round-6 cleaning operators.

Canonicalization must be IDEMPOTENT: applying the operator to its own
output changes nothing.  This is the property that catches rules which
rewrite into a form another rule then rewrites again (e.g. stripping
/index.html exposing a path that looks strippable again), and it holds
per-row, so one Spark round-trip over a generated corpus checks it.
"""

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

# URL grammar that exercises every normalization rule, including junk
_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_host = st.sampled_from(["Ex.COM", "www.ex.com", "SUB.ex.org:8080", "ex.com:80", "ex.com:443"])
_path = st.sampled_from(["", "/", "/A/b", "/a/index.html", "/page/2/", "/login", "/a/index.php"])
_query = st.sampled_from(
    ["", "?utm_source=x", "?b=2&a=1", "?id=7&utm_medium=rss&sessionid=s", "?page=3", "?x"]
)
_frag = st.sampled_from(["", "#top", "#!route/1", "#comments"])
_url = st.builds(lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}", _scheme, _host, _path, _query, _frag)
_junk = st.sampled_from(["", "not a url", "/rel/path?utm_source=x", "mailto:a@b.co", "  "])


@settings(max_examples=12, deadline=None)
@given(st.lists(st.one_of(_url, _junk), min_size=1, max_size=24))
def test_normalize_url_idempotent(spark, urls):
    from trafilatura_spark.operators.urltools import normalize_url_col

    df = spark.createDataFrame([Row(url=u) for u in urls])
    once = df.select(normalize_url_col(F.col("url")).alias("url"))
    twice = once.select(normalize_url_col(F.col("url")).alias("url"))
    assert once.collect() == twice.collect()


_line = st.one_of(
    st.sampled_from(
        [
            "A proper sentence with enough words right here.",
            "short.",
            "no punct but quite a few words in this line",
            "Please enable javascript to continue with it.",
            'code { mode: "dark" }',
            "",
        ]
    ),
    st.text(alphabet="abc .!?{", min_size=0, max_size=40),
)
_doc = st.lists(_line, min_size=0, max_size=8).map("\n".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=16))
def test_c4_clean_idempotent(spark, docs):
    """Cleaning already-clean text keeps every line: surviving lines are
    trimmed, terminal-punctuated, >= 5 words, boilerplate-free — each
    rule is stable under re-application."""
    from trafilatura_spark.operators.textstats import c4_clean_text

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    once = df.select("doc_id", c4_clean_text(F.col("text")).alias("text"))
    twice = once.select("doc_id", c4_clean_text(F.col("text")).alias("text"))
    assert sorted(once.collect()) == sorted(twice.collect())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab @._+-0123456789\n", min_size=0, max_size=60),
        min_size=1,
        max_size=16,
    )
)
def test_pii_scrub_idempotent(spark, texts):
    "Placeholders never re-match any PII pattern."
    from trafilatura_spark.operators.textstats import pii_scrubbed

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    once = df.select("doc_id", pii_scrubbed(F.col("text")).alias("text"))
    twice = once.select("doc_id", pii_scrubbed(F.col("text")).alias("text"))
    assert sorted(once.collect()) == sorted(twice.collect())
