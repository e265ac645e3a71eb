"""Metadata parity goldens from the reference's metadata_tests.py
(cited per case)."""

import pytest

from trafilatura_spark.kernel.metadata import extract_metadata


@pytest.mark.parametrize(
    "doc,expected",
    [
        ('<html><body><h3 class="title">T</h3><h3 id="title"></h3></body></html>', None),
        (
            '<html><head><title>Test Title</title><meta property="og:title" content=" " /></head><body><h1>First</h1></body></html>',
            "First",
        ),
        ("<html><head><title>Test Title</title></head><body></body></html>", "Test Title"),
        ("<html><body><h1>First</h1><h1>Second</h1></body></html>", "First"),
        ('<html><body><h1>   </h1><div class="post-title">Test Title</div></body></html>', "Test Title"),
        (
            '<html><body><h2 class="block-title">Main menu</h2><h1 class="article-title">Test Title</h1></body></html>',
            "Test Title",
        ),
        ("<html><body><h2>First</h2><h1>Second</h1></body></html>", "Second"),
        ("<html><body><h2>First</h2><h2>Second</h2></body></html>", "First"),
        ("<html><body><title></title></body></html>", None),
        (
            "<html><head><title>Head Title</title></head><body><h1>First</h1><h1>Second</h1></body></html>",
            "Head Title",
        ),
        (
            "<html><head><title>example.com</title></head><body><h1>First</h1><h1>Second</h1></body></html>",
            "First",
        ),
        ("<html><body><h1>   </h1><h1>Real Title</h1></body></html>", "Real Title"),
        ("<html><body><h1>   </h1><h1>   </h1></body></html>", None),
    ],
)
def test_titles(doc, expected):
    "metadata_tests.py:28-65"
    assert extract_metadata(doc).title == expected


def test_title_separators():
    "metadata_tests.py:74-78"
    assert extract_metadata("<html><head><title> - Home</title></head><body/></html>").title == "- Home"
    assert (
        extract_metadata("<html><head><title>My Title » My Website</title></head><body/></html>").title
        == "My Title"
    )


def test_title_from_jsonld_headline():
    "metadata_tests.py:70-73 (Wikipedia JSON-LD)"
    doc = (
        '<html><body><script type="application/ld+json">'
        '{"@type":"Article","name":"Semantic satiation",'
        '"author":{"@type":"Organization","name":"Contributors"},'
        '"headline":"Semantic satiation"}</script></body></html>'
    )
    assert extract_metadata(doc).title == "Semantic satiation"


@pytest.mark.parametrize(
    "doc,default_url",
    [
        ('<html><head><meta property="og:url" content="https://example.org"/></head><body></body></html>', None),
        ('<html><head><link rel="canonical" href="https://example.org"/></head><body></body></html>', None),
        ('<html><head><meta name="twitter:url" content="https://example.org"/></head><body></body></html>', None),
        (
            '<html><head><link rel="alternate" hreflang="x-default" href="https://example.org"/></head><body></body></html>',
            None,
        ),
        (
            '<html><head><link rel="canonical" href="/article/medical-record"/></head><body></body></html>',
            "https://example.org",
        ),
        ('<html><head><base href="https://example.org" target="_blank"/></head><body></body></html>', None),
    ],
)
def test_url_selectors(doc, default_url):
    "metadata_tests.py:210-228"
    assert extract_metadata(doc, default_url).url == "https://example.org"


def test_relative_canonical_joined():
    "metadata_tests.py:231-247 (direct extract_url call, as in the reference test)"
    from trafilatura_spark.kernel.loader import load_html
    from trafilatura_spark.kernel.metadata import extract_url

    doc = (
        '<html><head><link rel="canonical" href="/article/medical-record"/>'
        '<meta name="twitter:url" content="https://example.org"/></head><body></body></html>'
    )
    assert extract_url(load_html(doc)) == "https://example.org/article/medical-record"
    doc2 = (
        '<html><head><link rel="canonical" href="/p"/>'
        '<meta property="og:url" content="https://example.org"/></head><body></body></html>'
    )
    assert extract_url(load_html(doc2)) == "https://example.org/p"


def test_description_itemprop():
    "metadata_tests.py:249-252"
    doc = '<html><head><meta itemprop="description" content="Description"/></head><body></body></html>'
    assert extract_metadata(doc).description == "Description"


@pytest.mark.parametrize(
    "doc,expected",
    [
        (
            '<html><body><p><a href="https://creativecommons.org/licenses/by-sa/4.0/" rel="license">CC BY-SA</a></p></body></html>',
            "CC BY-SA 4.0",
        ),
        (
            '<html><body><p><a href="https://licenses.org/unknown" rel="license">Unknown</a></p></body></html>',
            "Unknown",
        ),
        (
            '<html><body><footer><a href="https://creativecommons.org/licenses/by-sa/4.0/">CC BY-SA</a></footer></body></html>',
            "CC BY-SA 4.0",
        ),
        (
            '<html><body><footer class="entry-footer"><span class="cat-links">Posted in '
            '<a href="https://example.org/category/seasonal/birthday/" rel="category tag">Birthday</a></span></footer></body></html>',
            None,
        ),
        (
            '<html><body><footer class="entry-footer"><span>The license is <a href="https://example.org/1">CC BY-NC</a></span></footer></body></html>',
            "CC BY-NC",
        ),
        (
            '<html><body><footer><a href="/x"><span>CC BY-SA 4.0</span></a></footer></body></html>',
            "CC BY-SA 4.0",
        ),
        ('<html><body><p><a rel="license" href="/x"></a></p></body></html>', None),
    ],
)
def test_license_cases(doc, expected):
    "metadata_tests.py:484-527"
    assert extract_metadata(doc).license == expected
