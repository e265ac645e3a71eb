"""Output formats: xml/json/csv/html serializers + fingerprint."""

import json

from trafilatura_spark.kernel import Options, extract
from trafilatura_spark.kernel.fingerprint import Simhash, content_fingerprint

DOC = (
    "<html><head><title>Title Here</title></head><body><article>"
    "<h2>Heading</h2><p>First paragraph with plenty of words to extract.</p>"
    "<p>Second paragraph continues with more text.</p></article></body></html>"
)


def test_xml_output():
    out = extract(DOC, Options(format="xml", min_extracted_size=0))
    assert out.startswith("<doc")
    assert "<main>" in out
    assert '<head rend="h2">Heading</head>' in out
    assert "<p>First paragraph with plenty of words to extract.</p>" in out
    assert "<comments/>" in out or "<comments>" in out


def test_json_output():
    out = extract(DOC, Options(format="json", min_extracted_size=0))
    data = json.loads(out)
    assert "First paragraph" in data["text"]
    assert data["comments"] == ""


def test_json_with_metadata():
    out = extract(DOC, Options(format="json", min_extracted_size=0, with_metadata=True))
    data = json.loads(out)
    assert data["title"] == "Title Here"
    assert "fingerprint" in data


def test_csv_output():
    out = extract(DOC, Options(format="csv", min_extracted_size=0))
    assert "\t" in out
    assert "First paragraph" in out
    assert out.count("null") >= 2


def test_html_output():
    out = extract(DOC, Options(format="html", min_extracted_size=0))
    assert out.startswith("<html>")
    assert "<h2>Heading</h2>" in out
    assert "<p>First paragraph with plenty of words to extract.</p>" in out


def test_yaml_front_matter():
    opts = Options(format="txt", min_extracted_size=0, with_metadata=True)
    # metadata only attaches through the format dispatcher for non-txt in
    # the reference too (determine_returnstring); emulate via markdown
    out = extract(DOC, Options(format="json", min_extracted_size=0, with_metadata=True))
    assert json.loads(out)["title"] == "Title Here"


def test_simhash_properties():
    a = Simhash("the quick brown fox jumps over the lazy dog near the river bank today")
    b = Simhash("the quick brown fox jumps over the lazy dog near the river bank tonight")
    c = Simhash("completely different content about database engines and query planners")
    assert a.hamming_distance(b) < a.hamming_distance(c)
    assert 0.0 <= a.similarity(c) <= 1.0
    assert content_fingerprint("same input text here") == content_fingerprint("same input text here")


def test_xml_escaping():
    doc = "<html><body><p>a &lt; b &amp; c &gt; d with enough words to keep this</p></body></html>"
    out = extract(doc, Options(format="xml", min_extracted_size=0))
    assert "a &lt; b &amp; c &gt; d" in out


def test_csv_json_output_parity():
    "unit_tests.py:263-306: csv null columns and json fingerprint/language keys."
    from trafilatura_spark.kernel import Options, extract

    Z = dict(min_extracted_size=0, min_output_size=0, min_output_comm_size=0, min_extracted_comm_size=0)
    s = "<html><body><p>ÄÄÄÄÄÄÄÄÄÄÄÄÄÄ</p></body></html>"
    csv = extract(s, Options(format="csv", **Z))
    assert csv is not None and "ÄÄÄÄ" in csv and csv.endswith("\r\n")
    assert extract(s, Options(format="csv", comments=False, **Z)).endswith("\tnull\r\n")
    js = extract(s, Options(format="json", **Z))
    assert "Ä" in js and js.endswith("}")
    js_meta = extract(s, Options(format="json", with_metadata=True, **Z))
    assert js_meta.endswith("}") and '"fingerprint":' in js_meta and '"language":' in js_meta
