"""Serializer-level parity: markdown escaping rules on constructed
internal-vocabulary trees (reference unit_tests.py:3013-3077)."""

from trafilatura_spark.kernel.dom import Element, SubElement
from trafilatura_spark.kernel.serialize import xmltotxt


def _body(*children):
    body = Element("body")
    for c in children:
        body.append(c)
    return body


def _el(tag, text=None, attrib=None, *children):
    el = Element(tag, dict(attrib or {}))
    el.text = text
    for c in children:
        el.append(c)
    return el


def test_pipe_escaped_in_cell():
    tree = _body(_el("table", None, None, _el("row", None, None, _el("cell", "a|b"), _el("cell", "c"))))
    assert "a\\|b" in xmltotxt(tree, True)


def test_pipe_escaped_in_formatted_cell():
    hi = _el("hi", "x|y", {"rend": "#b"})
    tree = _body(_el("table", None, None, _el("row", None, None, _el("cell", None, None, hi))))
    assert "x\\|y" in xmltotxt(tree, True)


def test_url_with_space_angle_brackets():
    tree = _body(_el("p", None, None, _el("ref", "link", {"target": "http://a b/c"})))
    assert "[link](<http://a b/c>)" in xmltotxt(tree, True)


def test_brackets_escaped_in_link_text():
    tree = _body(_el("p", None, None, _el("ref", "a[b]c", {"target": "http://x"})))
    assert "[a\\[b\\]c](http://x)" in xmltotxt(tree, True)


def test_brackets_escaped_in_image_alt():
    tree = _body(_el("graphic", None, {"src": "img.png", "alt": "a[b]c"}))
    assert "![a\\[b\\]c](img.png)" in xmltotxt(tree, True)


def test_ref_without_target():
    assert xmltotxt(_body(_el("p", None, None, _el("ref", "txt"))), True).strip() == "[txt]"
    assert (
        xmltotxt(_body(_el("p", None, None, _el("ref", "txt", {"target": ""}))), True).strip() == "[txt]"
    )
    assert xmltotxt(_body(_el("graphic", None, {"alt": "a"})), True).strip() == "![a]()"


def test_backtick_fences():
    tree = _body(_el("p", None, None, _el("hi", "a`b", {"rend": "#t"})))
    assert "``a`b``" in xmltotxt(tree, True)
    assert xmltotxt(_body(_el("p", None, None, _el("hi", "`x", {"rend": "#t"}))), True).strip() == "`` `x ``"
    assert xmltotxt(_body(_el("p", None, None, _el("hi", "x`", {"rend": "#t"}))), True).strip() == "`` x` ``"
    assert xmltotxt(_body(_el("p", None, None, _el("hi", "`", {"rend": "#t"}))), True).strip() == "`` ` ``"


def test_code_block_fence_widening():
    tree = _body(_el("code", "a```b"))
    result = xmltotxt(tree, True)
    assert "````" in result and "a```b" in result


def test_del_tilde_escaping():
    tree = _body(_el("p", None, None, _el("del", "a~~b")))
    assert "~~a~\\~b~~" in xmltotxt(tree, True)


def test_del_wrapping_inline_child():
    hi = _el("hi", "bold", {"rend": "#b"})
    tree = _body(_el("p", None, None, _el("del", None, None, hi)))
    assert "~~**bold**~~" in xmltotxt(tree, True)


def test_del_in_cell_via_extract():
    from trafilatura_spark.kernel import Options, extract

    result = extract(
        "<html><body><table><tr><td><del>gone</del></td></tr></table></body></html>",
        Options(format="markdown", formatting=True, min_extracted_size=0),
    )
    assert result and "~~gone~~" in result
