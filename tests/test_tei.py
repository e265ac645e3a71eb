"""TEI output format."""

from trafilatura_spark.kernel import Options, extract

DOC = (
    "<html><head><title>Article Title – Site.com</title>"
    '<meta name="author" content="Jane Doe"/></head><body><article>'
    "<h2>Heading</h2><p>First paragraph with plenty of words to extract cleanly.</p>"
    "<p>Second paragraph continues with more text for the body.</p></article></body></html>"
)


def test_tei_structure():
    out = extract(DOC, Options(format="xmltei", min_extracted_size=0, with_metadata=True))
    assert out.startswith('<TEI xmlns="http://www.tei-c.org/ns/1.0">')
    assert "<teiHeader>" in out
    assert "<fileDesc>" in out
    assert '<div type="entry">' in out
    assert '<div type="comments"' in out
    assert "First paragraph with plenty of words" in out


def test_tei_head_becomes_ab():
    out = extract(DOC, Options(format="xmltei", min_extracted_size=0, with_metadata=True))
    assert '<ab rend="h2" type="header">Heading</ab>' in out
    assert "<head" not in out.replace("teiHeader", "")


def test_tei_metadata_in_header():
    out = extract(DOC, Options(format="xmltei", min_extracted_size=0, with_metadata=True))
    assert "Jane Doe" in out
    assert "Article Title" in out


def test_tei_without_metadata():
    out = extract(DOC, Options(format="xmltei", min_extracted_size=0))
    assert out.startswith('<TEI xmlns="http://www.tei-c.org/ns/1.0">')
    assert '<div type="entry">' in out


def test_validate_tei_accepts_serializer_output():
    """The structural validator (DTD stand-in, reference xml.py:284-297)
    must accept what build_tei_output itself emits."""
    from trafilatura_spark.kernel.dom import Element, SubElement
    from trafilatura_spark.kernel.tei import validate_tei, write_fullheader

    class M:
        title, author, url, hostname = "T", "A B", "https://x.example/p", "x.example"
        description, sitename, date, license = "D", "X", "2024-01-01", "CC BY 4.0"
        categories, tags, fingerprint, id, image, pagetype, filedate = ["c"], ["t"], "fp", None, None, None, "2024"

    teidoc = Element("TEI", {"xmlns": "http://www.tei-c.org/ns/1.0"})
    write_fullheader(teidoc, M())
    text = SubElement(teidoc, "text")
    body = SubElement(text, "body")
    div = SubElement(body, "div", {"type": "entry"})
    SubElement(div, "head").text = "Heading"
    p = SubElement(div, "p")
    p.text = "Paragraph "
    SubElement(p, "hi", {"rend": "#b"}).text = "bold"
    lst = SubElement(div, "list", {"rend": "ul"})
    SubElement(lst, "item").text = "item one"
    tbl = SubElement(div, "table")
    row = SubElement(tbl, "row")
    SubElement(row, "cell").text = "cell"
    ok, errors = validate_tei(teidoc)
    assert ok, errors


def test_validate_tei_rejects_structural_violations():
    from trafilatura_spark.kernel.dom import Element, SubElement
    from trafilatura_spark.kernel.tei import validate_tei

    # wrong root
    bad = Element("tei")
    assert validate_tei(bad)[0] is False

    # div directly under p; stray text in <list>; foreign attribute
    teidoc = Element("TEI")
    SubElement(teidoc, "teiHeader")
    text = SubElement(teidoc, "text")
    body = SubElement(text, "body")
    p = SubElement(body, "p")
    SubElement(p, "div")
    lst = SubElement(body, "list")
    lst.text = "stray"
    cell = SubElement(body, "p", {"style": "color:red"})
    ok, errors = validate_tei(teidoc)
    assert not ok
    msgs = " | ".join(errors)
    assert "<div> not allowed under <p>" in msgs
    assert "text content not allowed in <list>" in msgs
    assert "attribute 'style' not allowed" in msgs


def test_check_tei_div_normalization_parity():
    "unit_tests.py:1048-1079: check_tei div text/tail merging into adjacent p."
    from trafilatura_spark.kernel.dom import Element, SubElement
    from trafilatura_spark.kernel.tei import check_tei

    def run(build):
        t = Element("TEI")
        tx = SubElement(t, "text")
        b = SubElement(tx, "body")
        d = SubElement(b, "div")
        build(d)
        return check_tei(t)

    def inner_div(c):
        outer = c.find(".//div")
        return next((ch for ch in outer if ch.tag == "div"), None)

    c = run(lambda d: setattr(d, "text", "text"))
    assert [(e.tag, e.text) for e in c.find(".//div").iter()] == [("div", None), ("p", "text")]

    def case2(d):
        inner = SubElement(d, "div"); inner.text = "text1"
        SubElement(inner, "p").text = "text2"
    assert [(e.tag, e.text) for e in run(case2).find(".//div").iter()] == [
        ("div", None), ("div", None), ("p", "text1 text2")]

    def case3(d):
        inner = SubElement(d, "div"); inner.text = "text1"
        SubElement(inner, "head").text = "text2"
    assert [(e.tag, e.text) for e in run(case3).find(".//div").iter()] == [
        ("div", None), ("div", None), ("p", "text1"), ("ab", "text2")]

    def case4(d):
        inner = SubElement(d, "div"); inner.text = "text1"
        SubElement(inner, "p").text = "text2"
        inner.tail = "has to be there"
    assert [(e.tag, e.text, e.tail) for e in inner_div(run(case4)).iter()] == [
        ("div", None, None), ("p", "text1 text2 has to be there", None)]

    def case5(d):
        inner = SubElement(d, "div"); inner.text = "text1"
        SubElement(inner, "quote").text = "text2"
        inner.tail = "has to be there"
    assert [(e.tag, e.text, e.tail) for e in inner_div(run(case5)).iter()] == [
        ("div", None, None), ("p", "text1", None), ("quote", "text2", None), ("p", "has to be there", None)]

    def case6(d):
        inner = SubElement(d, "div"); inner.text = "text1"
        p = SubElement(inner, "p"); p.text = "text2"; p.tail = "has to be there"
    assert [(e.tag, e.text, e.tail) for e in inner_div(run(case6)).iter()] == [
        ("div", None, None), ("p", "text1 text2 has to be there", None)]


def test_tei_headers_and_complex_head_parity():
    "unit_tests.py:1080-1100: ab header rendering and complex heads keep lists inside."
    from trafilatura_spark.kernel import Options, extract

    Z = dict(min_extracted_size=0, min_output_size=0)
    doc = "<html><body><article><h1>title</h1><h2>subtitle</h2><p>text</p></article></body></html>"
    out = extract(doc, Options(format="xmltei", fast=True, url="http://mocked.example", **Z))
    assert '<ab rend="h1" type="header">title</ab>' in out
    assert '<ab rend="h2" type="header">subtitle</ab>' in out

    complex_doc = (
        "<html><body><article><h2><div><p>content</p>"
        "<ul><li>text1</li><li>text2</li></ul></div></h2></article></body></html>"
    )
    out = extract(complex_doc, Options(format="xmltei", fast=True, url="http://mocked.example", **Z))
    flat = out.replace("\n", "").replace("  ", "").replace("> <", "><")
    assert '<ab rend="h2" type="header">content<list rend="ul"><item>text1' in flat
