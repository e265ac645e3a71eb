"""Option-gated behaviors: segment dedup (LRU), language filter, links,
images, focus modes."""

from trafilatura_spark.kernel import Options, bare_extract, extract
from trafilatura_spark.kernel.dedup_state import LRUCache, reset_caches

LONG = (
    "A long enough segment of text that is repeated across documents so the "
    "least-recently-used duplicate counter can see it come back again and again in a row."
)


def wrap(t):
    return f"<html><body>{t}</body></html>"


def test_lru_cache_semantics():
    cache = LRUCache(maxsize=2)
    cache.put("a", 1)
    cache.put("b", 1)
    assert cache.get("a") == 1  # refresh a
    cache.put("c", 1)  # evicts b (LRU)
    assert cache.get("b") == -1
    assert cache.get("a") == 1
    assert cache.get("c") == 1


def test_segment_dedup_across_documents():
    """Repeated long segments get discarded after max_repetitions
    (settings.cfg:41-42).  The unique filler keeps the documents in the
    main tier — on short docs the fallback extractors would re-grab the
    duplicate from the raw tree, masking the drop (same as reference)."""
    reset_caches()
    opts = Options(dedup=True, min_extracted_size=0)
    filler = " ".join(
        f"Unique filler sentence number UNIQ-{k} with plenty of additional words to keep the "
        "document comfortably above every fallback threshold in the cascade." for k in range(8)
    )
    outs = []
    for i in range(6):
        doc_i = wrap(f"<article><p>{LONG}</p><p>{filler.replace('UNIQ', str(i))}</p></article>")
        outs.append(extract(doc_i, opts))
    assert LONG in (outs[0] or "")
    assert LONG not in (outs[-1] or "")
    reset_caches()


def test_dedup_off_by_default():
    reset_caches()
    doc = wrap(f"<article><p>{LONG}</p></article>")
    for _ in range(6):
        out = extract(doc)
        assert LONG in out
    reset_caches()


def test_language_filter():
    opts = Options(lang="de", min_extracted_size=0)
    english = wrap(
        "<article><p>The house is on the hill and it is with the trees of the forest "
        "that it stands for all to see in the morning.</p></article>"
    )
    german = wrap(
        "<article><p>Das Haus steht nicht weit von der Stadt und ist ein Ort mit den "
        "alten Bäumen von früher und der Ruhe.</p></article>"
    )
    assert bare_extract(english, opts).tier == "wrong_language"
    assert bare_extract(german, opts).text is not None


def test_links_included():
    opts = Options(links=True, formatting=True, format="markdown", min_extracted_size=0)
    doc = wrap('<article><p>Click <a href="https://example.com/x">here for more</a> info.</p></article>')
    out = extract(doc, opts)
    assert "[here for more](https://example.com/x)" in out


def test_images_included():
    opts = Options(images=True, formatting=True, format="markdown", min_extracted_size=0)
    doc = wrap(
        '<article><p>Intro text for the image example follows here.</p>'
        '<img src="https://example.com/pic.jpg" alt="a picture"/></article>'
    )
    out = extract(doc, opts)
    assert "![a picture](https://example.com/pic.jpg)" in out


def test_no_tables_option():
    opts = Options(tables=False, min_extracted_size=0)
    doc = wrap(
        "<article><p>Before table text stays in the output.</p>"
        "<table><tr><td>cellcontent</td></tr></table></article>"
    )
    out = extract(doc, opts)
    assert "cellcontent" not in out
    assert "Before table" in out


# --- user pruning / blacklist job parameters (reference core.py:405-432) ----

def test_prune_selectors_class_and_id():
    "User pruning rules remove subtrees before the cascade (prune_xpath analog)."
    opts = Options(min_extracted_size=0, prune_selectors=(".ad-unit", "#promo"))
    doc = wrap(
        '<article><p>Kept paragraph with enough words to survive the gates.</p>'
        '<div class="ad-unit wide"><p>advertisement text should vanish</p></div>'
        '<div id="promo"><p>promotional block should vanish too</p></div>'
        "<p>Second kept paragraph rounds out the article body text.</p></article>"
    )
    out = extract(doc, opts)
    assert "Kept paragraph" in out and "Second kept" in out
    assert "advertisement" not in out and "promotional" not in out


def test_prune_selectors_tag_rule():
    opts = Options(min_extracted_size=0, prune_selectors=("blockquote",))
    doc = wrap(
        "<article><p>Narrative text stays in the extracted output here.</p>"
        "<blockquote><p>quoted digression is pruned by the user rule</p></blockquote></article>"
    )
    out = extract(doc, opts)
    assert "Narrative text" in out and "quoted digression" not in out


def test_prune_selector_invalid_spec_raises():
    import pytest

    from trafilatura_spark.kernel.selectors import compile_user_selector

    with pytest.raises(ValueError):
        compile_user_selector("div > p")  # combinators unsupported


def test_url_blacklist_discards_document():
    from trafilatura_spark.kernel.extract import bare_extract

    doc = wrap("<article><p>Body text that would normally extract fine.</p></article>")
    opts = Options(min_extracted_size=0, url="https://spam.example/x",
                   url_blacklist=frozenset({"https://spam.example/x"}))
    res = bare_extract(doc, opts)
    assert res.tier == "blacklisted_url" and res.text is None
    ok = bare_extract(doc, opts.copy(url="https://ok.example/y"))
    assert ok.text and "Body text" in ok.text


def test_author_blacklist_filters_names():
    from trafilatura_spark.kernel.metadata import check_authors, extract_metadata

    assert check_authors("Jane Doe; John Smith", {"john smith"}) == "Jane Doe"
    assert check_authors("John Smith", {"john smith"}) is None
    doc = (
        '<html><head><title>T – S</title>'
        '<meta name="author" content="John Smith"/></head>'
        "<body><p>text</p></body></html>"
    )
    meta = extract_metadata(doc, author_blacklist=frozenset({"john smith"}))
    assert meta.author is None


def test_only_with_metadata_gate():
    bare = wrap("<article><p>Long enough body text for a normal extraction result.</p></article>")
    opts = Options(min_extracted_size=0, only_with_metadata=True)
    assert extract(bare, opts) is None  # no title/date/url metadata
    full = (
        '<html><head><title>Doc Title – Site</title>'
        '<meta property="og:url" content="https://example.com/post"/>'
        '<meta property="article:published_time" content="2024-03-05"/></head>'
        "<body><article><p>Long enough body text for a normal extraction result.</p></article></body></html>"
    )
    assert extract(full, opts) is not None


# --- justext stoplist coverage (reference external.py:124-131 merges ALL
# justext language stoplists; rounds 1-2 ship built-in lists) -----------------

def test_justext_classifies_non_western_language():
    """Polish and Russian paragraphs must classify as GOOD via stopword
    density — they only can if the merged stoplist covers the language."""
    from trafilatura_spark.kernel.dom import Element
    from trafilatura_spark.kernel.justext import MERGED_STOPLIST, custom_justext
    from trafilatura_spark.kernel.loader import load_html

    pl = (
        "To jest bardzo długi akapit który ma wiele słów i jest napisany po polsku "
        "ponieważ chcemy sprawdzić czy nasze listy słów funkcyjnych działają dobrze "
        "dla tego języka oraz że klasyfikator potrafi uznać taki tekst za dobry "
        "kiedy gęstość słów funkcyjnych jest wystarczająco wysoka dla tej próby."
    )
    ru = (
        "Это очень длинный абзац на русском языке потому что мы хотим проверить "
        "что наши списки служебных слов работают для этого языка и что классификатор "
        "может признать такой текст хорошим когда плотность служебных слов достаточно "
        "высока и в нем есть все нужные слова для этой проверки классификации."
    )
    for text in (pl, ru):
        tree = load_html(f"<html><body><div><p>{text}</p><p>{text}</p></div></body></html>")
        paragraphs = custom_justext(tree)
        assert any(p.class_ == "good" for p in paragraphs), text[:40]


def test_justext_stopword_coverage_extended_languages():
    from trafilatura_spark.kernel.justext import MERGED_STOPLIST

    for probe in ("się", "että", "hogy", "și", "için", "yang", "что", "att", "ikke", "podle"):
        assert probe in MERGED_STOPLIST, probe


def test_classify_language_extended_coverage():
    "17-language function-word classifier (py3langid stand-in, round 2)."
    from trafilatura_spark.kernel.langid import classify_language

    samples = {
        "pl": "To jest bardzo dobre ale nie może być tak że tylko jego przez te lata",
        "ru": "Это не так как он и мы но они за что по от так было она",
        "tr": "Bu bir şey için çok daha iyi ile ama değil sonra kadar her onun gibi",
        "fi": "Ja on ei että oli hän mutta kun niin kuin myös sitä tai vain joka",
        "sv": "Och att det som är av inte med till den ett han har var vid från",
        "it": "Il che di non per sono della questo anche più gli nel alla hanno",
        "id": "Yang dan di itu dengan untuk tidak ini dari dalam akan pada juga mereka",
    }
    for lang, text in samples.items():
        assert classify_language(text) == lang, (lang, classify_language(text))
    assert classify_language("zzz qqq xxx") is None  # unknown stays unknown


def test_url_blacklist_checks_extracted_canonical_url():
    "unit_tests.py:1416-1421: the blacklist matches the page's canonical URL."
    from trafilatura_spark.kernel.extract import bare_extract

    doc = (
        '<html><head><link rel="canonical" href="https://example.org/page"/></head>'
        "<body><article><p>Some real article body text here.</p></article></body></html>"
    )
    opts = Options(min_extracted_size=0)
    assert bare_extract(doc, opts).text is not None
    black = opts.copy(url_blacklist=frozenset({"https://example.org/page"}))
    assert bare_extract(doc, black).tier == "blacklisted_url"
    # a canonical URL NOT in the blacklist wins over a blacklisted job URL
    other = opts.copy(
        url="https://spam.example/x", url_blacklist=frozenset({"https://spam.example/x"})
    )
    assert bare_extract(doc, other).text is not None


def test_check_html_lang_meta_gate():
    "utils.py:416-436 + core.py:399-402: declared-language fast-mode gate."
    from trafilatura_spark.kernel.extract import bare_extract
    from trafilatura_spark.kernel.langid import check_html_lang
    from trafilatura_spark.kernel.loader import load_html

    meta_de = (
        '<html><head><meta http-equiv="content-language" content="de-DE"/></head>'
        "<body><article><p>Inhalt des Artikels steht hier mit genug Text.</p></article></body></html>"
    )
    assert check_html_lang(load_html(meta_de), "de") is True
    assert check_html_lang(load_html(meta_de), "en") is False

    og = '<html><head><meta property="og:locale" content="en_US"/></head><body><p>x</p></body></html>'
    assert check_html_lang(load_html(og), "en") is True
    assert check_html_lang(load_html(og), "fr") is False

    # html@lang only counts in strict mode; absent markup passes
    lang_attr = '<html lang="fr"><body><p>x</p></body></html>'
    assert check_html_lang(load_html(lang_attr), "de") is True
    assert check_html_lang(load_html(lang_attr), "de", strict=True) is False
    assert check_html_lang(load_html("<html><body><p>x</p></body></html>"), "de") is True

    # wired into the cascade: fast mode discards on declared-language mismatch
    opts = Options(lang="en", fast=True, min_extracted_size=0)
    assert bare_extract(meta_de, opts).tier == "wrong_language"
    assert bare_extract(meta_de, opts.copy(lang="de")).text is not None


def test_justext_language_specific_stoplist():
    "external.py:146-150: a known target language selects its own stoplist."
    from trafilatura_spark.kernel.justext import LANG_STOPLISTS, MERGED_STOPLIST, try_justext
    from trafilatura_spark.kernel.loader import load_html

    assert len(LANG_STOPLISTS) >= 17
    assert all(v <= MERGED_STOPLIST for v in LANG_STOPLISTS.values())

    pl = (
        "To jest bardzo długi akapit który ma wiele słów i jest napisany po polsku "
        "ponieważ chcemy sprawdzić czy nasze listy słów funkcyjnych działają dobrze "
        "dla tego języka oraz że klasyfikator potrafi uznać taki tekst za dobry."
    )
    tree = load_html(f"<html><body><div><p>{pl}</p><p>{pl}</p></div></body></html>")
    # under its own stoplist the Polish page yields good paragraphs...
    assert len(try_justext(tree, None, "pl")) > 0
    # ...and under a PURELY-ENGLISH stoplist it yields none (proves the
    # language switch actually changes the stoplist in use)
    assert len(try_justext(tree, None, "en")) == 0
