"""List-rendering parity goldens (reference unit_tests.py:2524-2567)."""

from trafilatura_spark.kernel import Options, extract

MD = Options(format="markdown", formatting=True, min_extracted_size=0)
_INTRO = "enough intro text here for extraction"


def _md_inline(body: str) -> str:
    return (
        extract(f"<html><body><article><p>{_INTRO}</p>{body}</article></body></html>", MD) or ""
    )


def test_ordered_list_numbering():
    "unit_tests.py:2557-2561 (#843 family)"
    assert _md_inline("<ol><li>one</li><li>two</li><li>three</li></ol>") == f"{_INTRO}\n\n1. one\n2. two\n3. three"
    assert _md_inline("<ol><li>only</li></ol>") == f"{_INTRO}\n\n1. only"


def test_nested_list_indentation():
    "unit_tests.py:2564-2567"
    assert (
        _md_inline("<ul><li>a<ul><li>b</li><li>c</li></ul></li><li>d</li></ul>")
        == f"{_INTRO}\n\n- a\n  - b\n  - c\n- d"
    )
    assert _md_inline("<ul><li>a<ol><li>b</li></ol></li></ul>") == f"{_INTRO}\n\n- a\n  1. b"


def test_list_item_block_child_single_bullet():
    "unit_tests.py:2524-2526"
    assert _md_inline("<ul><li><p>x <b>bold</b> y</p></li></ul>") == f"{_INTRO}\n\n- x **bold** y"


def test_list_item_image_gets_bullet():
    "unit_tests.py:2529-2532"
    opts = Options(format="markdown", formatting=True, images=True, min_extracted_size=0)
    result = extract(
        f"<html><body><article><p>{_INTRO}</p>"
        "<ul><li><img src='/i.jpg' alt='a'></li><li>plain</li></ul></article></body></html>",
        opts,
    )
    assert "- ![a](/i.jpg)\n" in result.replace("http:///i.jpg", "/i.jpg")
