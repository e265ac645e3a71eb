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


def test_html2txt_len_matches_html2txt_over_corpus():
    """html2txt_len (the copy-free escalation-gate fast path) must equal
    len(html2txt(tree)) — property-pinned over the synthetic corpus
    including the removed-tail merge and block-spacing interactions."""
    from trafilatura_spark.fixtures import generate_rows
    from trafilatura_spark.kernel.baseline import html2txt, html2txt_len
    from trafilatura_spark.kernel.loader import load_html
    from trafilatura_spark.operators.extract import wrap_if_fragment

    n = 0
    for row in generate_rows(60):
        tree = load_html(wrap_if_fragment(row[3]))
        if tree is None:
            continue
        n += 1
        assert html2txt_len(tree) == len(html2txt(tree))
    assert n > 500


def test_html2txt_len_merge_and_block_edges():
    "Hand-built edges: removed tail into block vs inline target,control chars."
    from trafilatura_spark.kernel.baseline import html2txt, html2txt_len
    from trafilatura_spark.kernel.loader import load_html

    cases = [
        # removed <aside> tail merges into a BLOCK sibling's tail
        "<html><body><div>a</div><aside>drop</aside>tail-text<p>b</p></body></html>",
        # removed element first child: tail merges into parent text
        "<html><body><div><aside>x</aside>kept tail<span>s</span></div></body></html>",
        # consecutive removed siblings, inline merge target
        "<html><body><span>s</span><aside>1</aside>t1<footer>2</footer>t2<p>p</p></body></html>",
        # control character in a merged tail under a block target
        "<html><body><div>a</div><aside>x</aside>c\x01d</body></html>",
        # nested removed inside removed
        "<html><body><aside>a<footer>b</footer>c</aside>tail<p>p</p></body></html>",
        # empty-everything block spacing
        "<html><body><div></div><p></p></body></html>",
    ]
    for html in cases:
        tree = load_html(html)
        assert html2txt_len(tree) == len(html2txt(tree)), html
