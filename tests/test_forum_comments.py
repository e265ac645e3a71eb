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
