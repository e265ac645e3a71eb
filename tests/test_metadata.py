"""Metadata extraction kernel (SURVEY.md §2.7)."""

from trafilatura_spark.kernel.metadata import extract_metadata, normalize_authors


PAGE = """<html><head>
<title>My Article Title – Example Site</title>
<meta property="og:title" content="OG Article Title"/>
<meta property="og:site_name" content="Example Site"/>
<meta property="og:type" content="article"/>
<meta property="og:image" content="https://example.com/img.jpg"/>
<meta name="description" content="A fine description of the page."/>
<meta name="author" content="Jane Doe"/>
<meta property="article:published_time" content="2023-05-17T10:00:00Z"/>
<link rel="canonical" href="https://www.example.com/posts/my-article"/>
<meta name="keywords" content="spark, extraction"/>
</head><body>
<h1>Visible Headline</h1>
<p>Body text of the article goes here.</p>
<div class="entry-meta"><a href="/category/tech/">Tech</a></div>
<footer><a href="https://creativecommons.org/licenses/by-sa/4.0/">CC license</a></footer>
</body></html>"""


def test_opengraph_priority():
    meta = extract_metadata(PAGE)
    assert meta.title == "OG Article Title"
    assert meta.sitename == "Example Site"
    assert meta.pagetype == "article"
    assert meta.image == "https://example.com/img.jpg"


def test_meta_fields():
    meta = extract_metadata(PAGE)
    assert meta.author == "Jane Doe"
    assert meta.description == "A fine description of the page."
    assert meta.url == "https://www.example.com/posts/my-article"
    assert meta.hostname == "example.com"
    assert meta.date == "2023-05-17"
    assert "spark, extraction" in meta.tags


def test_categories_and_license():
    meta = extract_metadata(PAGE)
    assert meta.categories == ["Tech"]
    assert meta.license == "CC BY-SA 4.0"


def test_title_fallbacks():
    meta = extract_metadata("<html><head></head><body><h1>Only Headline</h1><p>text</p></body></html>")
    assert meta.title == "Only Headline"
    meta2 = extract_metadata(
        "<html><head><title>Page Name – Site.com</title></head><body><p>x</p></body></html>"
    )
    assert meta2.title == "Page Name"
    assert meta2.sitename == "Site.com"


def test_json_ld_metadata():
    page = """<html><head><script type="application/ld+json">
    {"@context":"https://schema.org","@type":"NewsArticle",
     "headline":"JSON Headline","datePublished":"2022-11-03",
     "author":{"@type":"Person","name":"John Smith"},
     "publisher":{"@type":"Organization","name":"News Org"}}
    </script></head><body><p>text</p></body></html>"""
    meta = extract_metadata(page)
    assert meta.title == "JSON Headline"
    assert meta.author == "John Smith"
    assert meta.sitename == "News Org"
    assert meta.date == "2022-11-03"
    assert meta.pagetype == "newsarticle"


def test_author_xpath_ladder():
    page = """<html><head><title>T</title></head><body>
    <span class="author-name">Mary Major</span><p>text</p></body></html>"""
    meta = extract_metadata(page)
    assert meta.author == "Mary Major"


def test_normalize_authors():
    assert normalize_authors(None, "By Jane Doe") == "Jane Doe"
    assert normalize_authors(None, "jane doe") == "Jane Doe"
    assert normalize_authors(None, "Jane Doe and John Smith") == "Jane Doe; John Smith"
    assert normalize_authors(None, "https://example.com/author") is None
    assert normalize_authors("Jane Doe", "Jane Doe") == "Jane Doe"


def test_url_date_fallback():
    page = '<html><head><link rel="canonical" href="https://ex.com/2021/07/09/post"/></head><body><p>t</p></body></html>'
    meta = extract_metadata(page)
    assert meta.date == "2021-07-09"


def test_empty_page():
    meta = extract_metadata("<html><head></head><body></body></html>")
    assert meta.title is None
    assert meta.author is None
