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
