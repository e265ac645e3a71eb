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
