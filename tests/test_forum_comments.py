"""Forum-thread routing and comment capture (core.py:137-154, 199-217,
276-285)."""

from trafilatura_spark.kernel import Options, bare_extract

LONG_POST = (
    "Opening post content with a substantial amount of words so that the main extractor "
    "accepts the thread body on its own, including several clauses, descriptions, and "
    "enough characters to clear the minimum extracted size threshold comfortably, with "
    "extra sentences about the topic under discussion to pad the body out even further."
)
REPLY_1 = "First reply with plenty of interesting words in it to count as a real post in the thread."
REPLY_2 = "Second reply also carrying enough content to matter for the extraction outcome overall."

FORUM_LD = '<script type="application/ld+json">{"@type": "DiscussionForumPosting", "headline": "T"}</script>'


def _page(ld: str) -> str:
    return (
        f"<html><body>{ld}"
        f"<article><p>{LONG_POST}</p></article>"
        f'<div id="comments"><div class="comment-list">'
        f"<p>{REPLY_1}</p><p>{REPLY_2}</p></div></div>"
        "</body></html>"
    )


def test_forum_posts_routed_into_body():
    "On a DiscussionForumPosting page, captured 'comments' are posts -> body."
    r = bare_extract(_page(FORUM_LD))
    assert REPLY_1 in r.text
    assert REPLY_2 in r.text
    assert LONG_POST in r.text
    assert r.len_comments == 0  # not emitted as comments


def test_blog_comments_stay_comments():
    "Without the forum marker, the same containers are comments."
    r = bare_extract(_page(""))
    assert LONG_POST in r.text
    assert r.len_comments > 0
    assert REPLY_1 in r.text  # appended after the body (comments section)


def test_comments_off_prunes_sections():
    r = bare_extract(_page(""), Options(comments=False))
    assert LONG_POST in r.text
    assert REPLY_1 not in (r.text or "")
    assert r.len_comments == 0


def test_comment_scoping_regressions_parity():
    """unit_tests.py:2431-2496: with include_comments=False comment
    containers are pruned before the MAIN pass (div- and details-wrapped
    threads), non-comment <details> survives, and the stage-4 retry must
    not lose content captured inside form wrappers."""
    from trafilatura_spark.kernel import Options, extract

    intro = "<p>Short intro under the escalation and rescue thresholds here.</p>"
    replies = "".join(
        f"<div>Reader comment number {i} that must never appear when comments are excluded, "
        "long enough to matter.</div>"
        for i in range(8)
    )
    doc = f"<html><body><article>{intro}</article><div id='comments' class='comments-area'>{replies}</div></body></html>"
    for fast in (False, True):
        result = extract(doc, Options(comments=False, fast=fast)) or ""
        assert "Short intro" in result
        assert result.count("Reader comment number") == 0

    body = (
        "<article>"
        + "<p>Real article paragraph with enough content to be extracted normally here.</p>" * 3
        + "</article>"
    )
    comments = (
        "<details id='comments'><summary>Comments</summary>"
        + "".join(f"<p>Reader comment number {i} that must never leak into the body text.</p>" for i in range(6))
        + "</details>"
    )
    doc = f"<html><body>{body}{comments}</body></html>"
    for fast in (False, True):
        result = extract(doc, Options(comments=False, fast=fast)) or ""
        assert "Real article paragraph" in result
        assert result.count("Reader comment number") == 0
    faq = "<details class='faq'><summary>More</summary><p>Kept expandable content paragraph that is genuine.</p></details>"
    assert "Kept expandable content" in (extract(f"<html><body>{body}{faq}</body></html>", Options()) or "")

    li_intro = "".join(f"<li>Point number {i} of the short visible article summary text here.</li>" for i in range(4))
    cont = "".join(
        f"<p>Continuation paragraph {i} with substantial article prose that only the "
        "recall retry can recover from inside the form wrapper element.</p>"
        for i in range(12)
    )
    reps = "".join(
        f"<p>Reply {i} ZQXJKVREPLY says something reasonably long about the topic at hand "
        "in this discussion thread below the article body.</p>"
        for i in range(8)
    )
    doc = (
        f"<html><body><article><h1>Title of the page</h1><ul>{li_intro}</ul>"
        f"<form>{cont}<div class='user-comment-area'>{reps}</div></form></article></body></html>"
    )
    result = extract(doc, Options(comments=True, fast=True)) or ""
    assert "Continuation paragraph 5" in result
    assert "ZQXJKVREPLY" in result
