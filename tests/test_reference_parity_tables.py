"""Reference-parity goldens: table algebra and code-block detection.
Expected values from the reference's unit tests (cited per case)."""

import pytest

from trafilatura_spark.kernel import Options, extract

TXT_FAST = Options(format="txt", fast=True, min_extracted_size=0)
MD = Options(format="markdown", formatting=True, min_extracted_size=0)
XML = Options(format="xml", min_extracted_size=0)

_INTRO = "enough intro text here for extraction"
_COLSPAN_ROWS = "<td>b</td></tr><tr><td>c</td><td>d</td><td>e</td></tr></table>"


def _doc(body, intro=True):
    inner = f"<p>{_INTRO}</p>{body}" if intro else body
    return f"<html><body><article>{inner}</article></body></html>"


def _table_txt(table):
    return extract(_doc(table, intro=False), TXT_FAST)


def _table_md(table):
    return extract(_doc(table), MD)


def test_table_colspan_padding():
    "unit_tests.py:2006-2009"
    assert "| a |  | b |" in _table_txt(f"<table><tr><td colspan='2'>a</td>{_COLSPAN_ROWS}")


@pytest.mark.parametrize("bad_span", ['span="2"', 'span="2.1"', 'span="-1"', 'span="abc"'])
def test_table_bad_span_attr(bad_span):
    "unit_tests.py:2012-2015"
    assert "| a | b |  |" in _table_txt(f"<table><tr><td {bad_span}>a</td>{_COLSPAN_ROWS}")


@pytest.mark.parametrize(
    "first_cell",
    ['<td colspan="9007199254740991">a</td>', '<th colspan="9007199254740991">a</th>', '<td colspan="2x">a</td>'],
)
def test_table_huge_or_bad_colspan_no_crash(first_cell):
    "unit_tests.py:2018-2022 (#657)"
    assert _table_txt(f"<table><tr>{first_cell}{_COLSPAN_ROWS}") is not None


def test_table_rowspan_aligned():
    "unit_tests.py:2035-2039"
    out = _table_md("<table><tr><td rowspan='2'>x</td><td>a</td></tr><tr><td>b</td></tr></table>")
    assert out.endswith("| x | a | \n|  | b |")


def test_table_rowspan_colspan_combined():
    "unit_tests.py:2042-2048"
    out = _table_md(
        "<table><tr><td rowspan='2' colspan='2'>big</td><td>c</td></tr><tr><td>x</td></tr></table>"
    )
    assert "|  |  | x |" in out


def test_table_rowspan_decrement_on_padding():
    "unit_tests.py:2051-2062"
    out = _table_md(
        "<table>"
        "<tr><td>a</td><td rowspan='2'>b</td><td>c</td></tr>"
        "<tr><td>x</td></tr>"
        "<tr><td>d</td><td>e</td><td>f</td></tr>"
        "</table>"
    )
    assert "| d | e | f |" in out


@pytest.mark.parametrize(
    "table_html,suffix",
    [
        ("<table><tr><td></td><td>b</td></tr></table>", "|  | b |"),
        ("<table><tr><td>a</td><td></td></tr></table>", "| a |  |"),
        ("<table><tr><td>a</td><td>b</td></tr><tr><td></td><td></td></tr></table>", "| a | b |"),
        (
            "<table><tr><td>a</td><td>c</td></tr><tr><td></td><td></td></tr><tr><td>d</td><td>e</td></tr></table>",
            "| a | c | \n| d | e |",
        ),
        (
            "<table><tr><td>a</td><td>c</td></tr><tr></tr><tr><td>d</td><td>e</td></tr></table>",
            "| a | c | \n| d | e |",
        ),
    ],
)
def test_table_empty_cells_and_rows(table_html, suffix):
    "unit_tests.py:2065-2084"
    out = _table_md(table_html)
    assert out.rstrip().endswith(suffix) or suffix in out


# --- code blocks (unit_tests.py:2944-3015) -----------------------------------

def test_code_block_inline_code_tag():
    doc = "<html><body><div><p>paragraph</p><p>here is <code>some</code> code</p></div></body></html>"
    out = extract(doc, XML)
    assert "<code>some</code>" in out and "quote" not in out


def test_code_block_pre_lang():
    doc = (
        "<html><body><div><p>Code:</p>"
        '<pre lang="python3"><span class="kn">import</span> <span class="nn">openai</span>\n'
        '<span class="kn">from</span> <span class="nn">openai_function_call</span> '
        '<span class="kn">import</span> <span class="n">openai_function</span></pre></div></body></html>'
    )
    out = extract(doc, XML)
    assert "<code>import openai\nfrom openai_function_call import openai_function</code>" in out
    assert "quote" not in out


def test_code_block_pre_single_code_child():
    doc = "<html><body><div><p>Code:</p><pre><code><span>my code</span></code></pre></div></body></html>"
    out = extract(doc, XML)
    assert "<code>my code</code>" in out and "quote" not in out


def test_blockquote_not_misdetected_as_code():
    bq_text = "<html><body><article><blockquote>see <code>x</code> above</blockquote></article></body></html>"
    assert "<quote>" in extract(bq_text, XML)
    bq_tail = "<html><body><article><blockquote><code>x</code> tail</blockquote></article></body></html>"
    assert "<quote>" in extract(bq_tail, XML)


def test_github_highlight_pre():
    doc = (
        '<html><body><div class="highlight highlight-source-shell notranslate">'
        "<pre>$ pip install PyGithub</pre></div></body></html>"
    )
    out = extract(doc, XML)
    assert "<code>$ pip install PyGithub</code>" in out and "quote" not in out
