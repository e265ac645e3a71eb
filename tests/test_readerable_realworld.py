"""is_probably_readerable parity (reference readability_lxml.py:410-471,
asserted by reference tests/unit_tests.py:3328-3437) plus real-world
resource-page pins from the reference's own suite (unit_tests.py:833-841).
Resource pages are read from the read-only reference checkout."""

import os

import pytest

from trafilatura_spark.kernel import Options, extract
from trafilatura_spark.kernel.loader import load_html
from trafilatura_spark.kernel.readability import is_probably_readerable

RESOURCES = "/root/reference/tests/resources"

VERY_SMALL = "hello there"
SMALL = "hello there " * 11
LARGE = "hello there " * 12
VERY_LARGE = "hello there " * 50
LINEBREAKS = f"{LARGE} <br>" * 10


def doc(s):
    return load_html(f"<html>{s}</html>")


def test_readerable_thresholds():
    assert not is_probably_readerable("ABC")
    very_small = doc(f"<p id='main'>{VERY_SMALL}</p>")
    small = doc(f"<p id='main'>{SMALL}</p>")
    large = doc(f"<p id='main'>{LARGE}</p>")
    very_large = doc(f"<p id='main'>{VERY_LARGE}</p>")

    # defaults: only the largest is readerable (unit_tests.py:3357-3361)
    assert not is_probably_readerable(very_small)
    assert not is_probably_readerable(small)
    assert not is_probably_readerable(large)
    assert is_probably_readerable(very_large)

    # lower min_content_length (unit_tests.py:3363-3368)
    opts = {"min_content_length": 120, "min_score": 0}
    assert not is_probably_readerable(very_small, opts)
    assert is_probably_readerable(small, opts)
    assert is_probably_readerable(large, opts)

    # higher min_content_length (unit_tests.py:3370-3375)
    opts = {"min_content_length": 200, "min_score": 0}
    assert not is_probably_readerable(large, opts)
    assert is_probably_readerable(very_large, opts)

    # min_score band (unit_tests.py:3377-3390)
    assert is_probably_readerable(small, {"min_content_length": 0, "min_score": 4})
    assert not is_probably_readerable(small, {"min_content_length": 0, "min_score": 11.5})
    assert is_probably_readerable(large, {"min_content_length": 0, "min_score": 11.5})


def test_readerable_class_id_and_linebreaks():
    likely = doc(
        f"<p id='main' class='header'>{VERY_LARGE}</p>"
        f"<p id='header' class='article'>{VERY_LARGE}</p>"
        f"<p id='footer' class='body'>{VERY_LARGE}</p>"
    )
    unlikely = doc(f"<p id='header'>{VERY_LARGE}</p><p class='footer'>{VERY_LARGE}</p>")
    assert is_probably_readerable(likely)
    assert not is_probably_readerable(unlikely)

    assert is_probably_readerable(doc(f"<div>{LINEBREAKS * 10}</div>"))
    assert not is_probably_readerable(doc(f"<div>{LARGE * 10}</div>"))


def test_readerable_visibility():
    visible = doc(
        f"<p id='main' style='display: block'>{VERY_LARGE}</p>"
        f"<p id='main'>{VERY_LARGE}</p>"
        f"<p id='main' aria-hidden='false'>{VERY_LARGE}</p>"
    )
    invisible = doc(
        f"<p id='main' style='display: none'>{VERY_LARGE}</p>"
        f"<p id='main' hidden>{VERY_LARGE}</p>"
        f"<p id='main' aria-hidden='true'>{VERY_LARGE}</p>"
    )
    assert is_probably_readerable(visible)
    assert not is_probably_readerable(invisible)

    calls = {"n": 0}

    def always_invisible(node):
        calls["n"] += 1
        return False

    very_large = doc(f"<p id='main'>{VERY_LARGE}</p>")
    assert not is_probably_readerable(very_large, {"visibility_checker": always_invisible})
    assert calls["n"] > 0


@pytest.mark.skipif(not os.path.isdir(RESOURCES), reason="reference checkout absent")
def test_mozilla_page_not_readerable():
    "Reference unit_tests.py:3427-3437: the Firefox developer page scores below."
    with open(os.path.join(RESOURCES, "mozilla.org.firefox.developer.html"), encoding="utf-8") as f:
        assert not is_probably_readerable(load_html(f.read()))


@pytest.mark.skipif(not os.path.isdir(RESOURCES), reason="reference checkout absent")
def test_apache_page_tables_toggle():
    "Reference unit_tests.py:833-837: table content follows include_tables."
    with open(os.path.join(RESOURCES, "apache.html"), encoding="utf-8") as f:
        page = f.read()
    assert "localhost:80" in extract(page, Options(fast=False, tables=True))
    assert "localhost:80" not in (extract(page, Options(fast=False, tables=False)) or "")


@pytest.mark.skipif(not os.path.isdir(RESOURCES), reason="reference checkout absent")
def test_scam_page_extracts_empty():
    "Reference unit_tests.py:838-841: the scam page yields no content at zero config."
    with open(os.path.join(RESOURCES, "scam.html"), encoding="utf-8") as f:
        page = f.read()
    zero = dict(min_extracted_size=0, min_output_size=0, tables=False)
    assert extract(page, Options(fast=True, **zero)) == ""
    assert extract(page, Options(fast=False, **zero)) == ""
