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
