"""Reference-parity golden tests: exact expected outputs taken from the
reference's own test suite (tests/unit_tests.py — cited per case), run
against the from-scratch kernel.  The reference package cannot execute
here (lxml absent), so these pins ARE the parity evidence."""

import pytest

from trafilatura_spark.kernel import Options, extract

# reference tests run with ZERO_CONFIG (MIN_EXTRACTED_SIZE=0, unit_tests.py:66-70)
MD = Options(format="markdown", formatting=True, min_extracted_size=0)
MD_NOFMT = Options(format="markdown", formatting=False, min_extracted_size=0)
TXT_FMT = Options(format="txt", formatting=True, min_extracted_size=0)
TXT = Options(format="txt", min_extracted_size=0)


def test_markdown_formatting_default():
    "unit_tests.py:713-715 (test_include_formatting_markdown)"
    doc = "<html><body><article><p>plain and <b>bold</b> text here.</p></article></body></html>"
    assert extract(doc, MD) == "plain and **bold** text here."
    assert extract(doc, MD_NOFMT) == "plain and bold text here."
    assert extract(doc, TXT_FMT) == "plain and **bold** text here."


def test_markdown_list_item_inline_spacing():
    "unit_tests.py:718-721 (issue #845)"
    doc = "<html><body><article><ol><li>Foo <em>bar</em> baz.</li></ol></article></body></html>"
    assert extract(doc, MD) == "1. Foo *bar* baz."


def test_markdown_sup_sub_keep_boundary():
    "unit_tests.py:724-734 (issue #889)"
    sup = "<html><body><article><p>The layer has 100<sup>2</sup>=10000 nodes.</p></article></body></html>"
    sub = "<html><body><article><p>Written 2011<sub>15ya</sub> in winter.</p></article></body></html>"
    assert extract(sup, MD) == "The layer has 100<sup>2</sup>=10000 nodes."
    assert extract(sub, MD) == "Written 2011<sub>15ya</sub> in winter."
    spaced = "<html><body><article><p>x <sup> 2 </sup> y</p></article></body></html>"
    bold = "<html><body><article><p>x <b> 2 </b> y</p></article></body></html>"
    assert extract(spaced, MD) == "x  <sup>2</sup>  y"
    assert extract(bold, MD) == "x  **2**  y"


def test_markdown_empty_sup_sub_dropped():
    "unit_tests.py:737-750 (issue #889)"
    for tag in ("sup", "sub"):
        doc = f"<html><body><article><p>a<{tag}></{tag}>b</p></article></body></html>"
        assert extract(doc, MD) == "ab"
    footnote = '<html><body><article><p>Fact<sup><img src="x.png"/></sup> follows here.</p></article></body></html>'
    assert extract(footnote, MD) == "Fact follows here."
    tailed = "<html><body><article><p>alpha<sup></sup>beta gamma.</p></article></body></html>"
    assert extract(tailed, MD) == "alphabeta gamma."
    assert extract(tailed, MD.copy(focus="precision")) == "alphabeta gamma."


def test_heading_and_bold_markdown():
    "unit_tests.py:411-418 (test_formatting: titles as markdown)"
    doc = (
        "<html><body><article><h3>Title</h3>"
        "<p><b>This here is in bold font.</b>Non-bold here</p></article></body></html>"
    )
    assert extract(doc, TXT_FMT) == "### Title\n\n**This here is in bold font.**Non-bold here"
    assert extract(doc, MD) == "### Title\n\n**This here is in bold font.**Non-bold here"


def test_trailing_lb_removed():
    "unit_tests.py:403-406 (trailing <br> dropped from paragraph)"
    doc = "<html><body><p>This here is the text.<br/></p></body></html>"
    out = extract(doc, TXT)
    assert out == "This here is the text."


def test_simple_extract_abc():
    "unit_tests.py:241 shape: minimal well-formed page extracts"
    assert extract("<html><body><p>ABC</p></body></html>", TXT) == "ABC"
