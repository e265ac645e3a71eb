"""Baseline extractor parity: exact behaviors from the reference's
baseline_tests.py (cited per case)."""

from trafilatura_spark.kernel.baseline import baseline, html2txt
from trafilatura_spark.kernel.dom import Element


def jsonld_doc(payload: str, body: str = "") -> str:
    return (
        f'<html><head><script type="application/ld+json">{payload}</script></head>'
        f"<body>{body}</body></html>"
    )


def test_baseline_empty_inputs():
    "baseline_tests.py:20-34"
    for inp in (b"", ""):
        result = baseline(inp)
        assert isinstance(result, tuple) and len(result) == 3
        assert result[0].tag == "body"
        assert result[1] == ""
        assert result[2] == 0


def test_baseline_simple_strategies():
    "baseline_tests.py:37-52"
    tests = [
        (
            "<html><body><article>" + "The article consists of this text." * 10 + "</article></body></html>",
            "The article consists of this text.",
        ),
        (
            "<html><body><article><b>The article consists of this text.</b></article></body></html>",
            "The article consists of this text.",
        ),
        (
            "<html><body><quote>This is only a quote but it is better than nothing.</quote></body></html>",
            "This is only a quote but it is better than nothing.",
        ),
    ]
    for doc, expected in tests:
        _, result, _ = baseline(doc)
        assert expected in result


def test_baseline_invalid_json_ignored():
    "baseline_tests.py:55-66"
    filecontent = b"""
        <html><body><script type="application/ld+json">
            {"articleBody": "This is the article body, it has to be long enough to fool the length threshold which is set at len 100."  # invalid JSON
        </script></body></html>
    """
    _, result, _ = baseline(filecontent)
    assert result == ""


def test_baseline_json_ok():
    "baseline_tests.py:69-82"
    filecontent = b"""
        <html><body><script type="application/ld+json">
            {"@type": "Article",
             "articleBody": "This is the article body, it has to be long enough to fool the length threshold which is set at len 100."}
        </script></body></html>
    """
    _, result, _ = baseline(filecontent)
    assert len(result) > 100


def test_baseline_escaped_markup_parsed():
    "baseline_tests.py:85-99: markup inside articleBody is parsed, not leaked"
    filecontent = rb"""
        <html><body><script type="application/ld+json">
            {"@type": "Article",
             "articleBody": "<p>This is the article body, it has to be long enough to fool the length threshold which is set at len 100.<\/p>"}
        </script></body></html>
    """
    _, result, _ = baseline(filecontent)
    assert result.startswith("This is the article body") and "<p>" not in result


def test_baseline_body_dump_trimmed():
    "baseline_tests.py:106-108"
    doc = "<html><body><div>   Document body...   </div><script> console.log('x') </script></body></html>"
    _, result, _ = baseline(doc)
    assert result == "Document body..."


def test_baseline_strategy_fallthrough():
    "baseline_tests.py:111-115: short JSON body must not block later strategies"
    para = (
        "Real paragraph content that should be extracted by the paragraph strategy, "
        "comfortably long enough for the gate."
    )
    _, result, length = baseline(jsonld_doc('{"articleBody": "Too short."}', body=f"<p>{para}</p>"))
    assert para in result and length > 100


def test_baseline_jsonld_nested_shapes():
    "baseline_tests.py:118+: list-wrapped and @graph-nested articleBody"
    body_text = (
        "Body text from structured data, made comfortably long enough to pass the "
        "one hundred character length threshold."
    )
    for payload in (
        f'[{{"@type": "Article", "articleBody": "{body_text}"}}]',
        f'{{"@graph": [{{"@type": "Article", "articleBody": "{body_text}"}}]}}',
        f'{{"mainEntity": {{"articleBody": "{body_text}"}}}}',
    ):
        _, result, _ = baseline(jsonld_doc(payload))
        assert body_text in result, payload


def test_html2txt():
    "html2txt block-boundary spacing on minified pages (baseline.py:271-301)"
    doc = "<html><body><div>one</div><div>two</div><p>three</p></body></html>"
    assert html2txt(doc) == "one two three"
    assert html2txt("") == ""
    # basic_cleaning drops footers/scripts
    doc2 = "<html><body><p>keep</p><footer>drop</footer><script>var x;</script></body></html>"
    assert html2txt(doc2) == "keep"
