"""Deterministic synthetic transcript corpus (FIXTURES.md §1/§3).

Generates (conv_id, turn_idx, role, text, tool, ts) rows whose `text`
cells carry HTML genres derived from the behaviors the reference's own
test suites pin (tests/unit_tests.py, baseline_tests.py,
realworld_tests.py).  Fully deterministic: genre/content choice is a
function of (conv_id, turn_idx) via sha1, no RNG state, no clock.

Conversation sizes are heavy-tailed to exercise skew handling.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator, Optional

_EPOCH = datetime(2024, 1, 1)

_WORDS = (
    "analysis pipeline content extraction spark distributed partition shuffle broadcast "
    "cluster executor memory throughput latency benchmark parquet transcript conversation "
    "assistant message response heuristic cascade fallback readability paragraph boilerplate "
    "navigation sidebar article section heading sentence language quality token duplicate "
    "fingerprint similarity vector embedding neighbor window aggregate filter project join"
).split()


def _h(conv_id: str, turn_idx: int, salt: str = "") -> int:
    digest = hashlib.sha1(f"{conv_id}|{turn_idx}|{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def _sentence(seed: int, n_words: int) -> str:
    words = [_WORDS[(seed + i * 2654435761) % len(_WORDS)] for i in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(seed: int, n_sentences: int = 3, words_per: int = 12) -> str:
    return " ".join(_sentence(seed + i * 97, words_per) for i in range(n_sentences))


def _long_text(seed: int, approx_chars: int) -> str:
    parts = []
    total = 0
    i = 0
    while total < approx_chars:
        p = _paragraph(seed + i * 1009, 2, 10)
        parts.append(p)
        total += len(p) + 1
        i += 1
    return " ".join(parts)


# --- genres -----------------------------------------------------------------

def _genre_plain_article(seed: int) -> str:
    body = "".join(f"<p>{_paragraph(seed + i * 31, 3, 14)}</p>" for i in range(3))
    return f"<article><h2>{_sentence(seed, 5)[:-1]}</h2>{body}</article>"


def _genre_short_article(seed: int) -> str:
    "Below MIN_EXTRACTED_SIZE=250 so fallbacks engage."
    return f"<article><p>{_sentence(seed, 9)}</p></article>"


def _genre_class_div(seed: int) -> str:
    content = "".join(f"<p>{_paragraph(seed + i * 13, 3, 13)}</p>" for i in range(3))
    return (
        f'<div id="nav-menu"><ul><li><a href="/x">Home</a></li><li><a href="/y">About</a></li></ul></div>'
        f'<div class="post-content"><h3>{_sentence(seed + 5, 4)[:-1]}</h3>{content}</div>'
        f'<div class="sidebar"><p>{_sentence(seed + 7, 6)}</p></div>'
        f"<footer><p>Copyright notice</p></footer>"
    )


def _genre_boilerplate(seed: int) -> str:
    content = "".join(f"<p>{_paragraph(seed + i * 17, 3, 13)}</p>" for i in range(3))
    return (
        f'<div class="share-buttons"><a href="#">Twitter</a> <a href="#">Facebook</a></div>'
        f'<div id="newsletter-signup"><p>Subscribe to our newsletter now</p></div>'
        f'<article>{content}</article>'
        f'<div style="display:none"><p>hidden content should never appear</p></div>'
        f'<div aria-hidden="true"><p>also hidden from extraction</p></div>'
        f'<div class="tag-list"><a href="/t1">tag one</a> <a href="/t2">tag two</a></div>'
    )


def _genre_link_farm(seed: int) -> str:
    content = f"<p>{_paragraph(seed, 4, 14)}</p>"
    farm = "".join(f'<a href="/l{i}">{_sentence(seed + i, 2)[:-1]}</a> ' for i in range(8))
    return f'<div class="post-content">{content}</div><div><p>{farm}</p></div>'


def _genre_lists(seed: int) -> str:
    items = "".join(f"<li>{_sentence(seed + i * 7, 8)}</li>" for i in range(4))
    dl = f"<dl><dt>{_sentence(seed + 50, 3)[:-1]}</dt><dd>{_sentence(seed + 51, 7)}</dd><dt>{_sentence(seed + 52, 3)[:-1]}</dt><dd>{_sentence(seed + 53, 7)}</dd></dl>"
    intro = f"<p>{_paragraph(seed + 90, 2, 14)}</p>"
    return f"<article>{intro}<ul>{items}</ul>{dl}</article>"


def _genre_table(seed: int) -> str:
    rows = "".join(
        f"<tr><td>{_sentence(seed + r * 11, 3)[:-1]}</td><td>{_sentence(seed + r * 11 + 1, 4)[:-1]}</td></tr>"
        for r in range(3)
    )
    spanned = (
        f'<table><caption>{_sentence(seed + 77, 3)[:-1]}</caption>'
        f"<tr><th>Alpha</th><th>Beta</th></tr>"
        f'<tr><td colspan="2">{_sentence(seed + 78, 5)[:-1]}</td></tr>'
        f'<tr><td rowspan="2">{_sentence(seed + 79, 3)[:-1]}</td><td>{_sentence(seed + 80, 3)[:-1]}</td></tr>'
        f"<tr><td>{_sentence(seed + 81, 3)[:-1]}</td></tr></table>"
    )
    intro = f"<p>{_paragraph(seed + 99, 2, 14)}</p>"
    return f"<article>{intro}<table><tr><th>Key</th><th>Value</th></tr>{rows}</table>{spanned}</article>"


def _genre_quotes_code(seed: int) -> str:
    quote = f"<blockquote><p>{_paragraph(seed + 3, 2, 12)}</p></blockquote>"
    code = f'<pre lang="python">def f(x):\n    return {{"k": x}}</pre>'
    intro = f"<p>{_paragraph(seed + 4, 3, 14)}</p>"
    return f"<article>{intro}{quote}{code}</article>"


def _genre_headings_formatting(seed: int) -> str:
    return (
        f"<article><h1>{_sentence(seed, 4)[:-1]}</h1>"
        f"<p>{_sentence(seed + 1, 8)[:-1]} <b>bold words</b> and <i>italic words</i> continue {_sentence(seed + 2, 8)}</p>"
        f"<h3>{_sentence(seed + 3, 3)[:-1]}</h3>"
        f"<p>{_paragraph(seed + 4, 2, 14)}</p>"
        f"<p>Strike <s>removed words</s> kept tail here with trailing prose {_sentence(seed + 5, 7)}</p>"
        f"</article>"
    )


def _genre_comments(seed: int) -> str:
    article = f"<article>{''.join(f'<p>{_paragraph(seed + i * 19, 3, 13)}</p>' for i in range(2))}</article>"
    comments = (
        f'<div id="comments"><div class="comment-list">'
        f"<p>{_sentence(seed + 60, 10)}</p><p>{_sentence(seed + 61, 10)}</p></div></div>"
    )
    return article + comments


def _genre_json_ld(seed: int) -> str:
    body_text = _paragraph(seed + 8, 4, 14)
    return (
        '<script type="application/ld+json">'
        f'{{"@context":"https://schema.org","@type":"Article","articleBody":"{body_text}"}}'
        "</script><div><p>short teaser</p></div>"
    )


def _genre_baseline_paragraphs(seed: int) -> str:
    "No recognizable container: paragraph dump tier."
    return "".join(f"<p>{_sentence(seed + i * 3, 9)}</p>" for i in range(4))


def _genre_recall_escalation(seed: int) -> str:
    """Stage-4 trigger (core.py:239-274): a short extractable core in an
    unrecognized container, recall-only content in a list (lists are
    outside the balanced wild-text search), and bulk page text inside a
    <form> (dropped by cleaning and by readability's sanitize, counted
    by html2txt) so the escalation share gate fires."""
    core = f'<div class="xcontainer"><p>{_paragraph(seed, 3, 12)}</p></div>'
    items = "".join(f"<li>{_sentence(seed + 40 + i, 18)}</li>" for i in range(8))
    filler = f"<form>{_long_text(seed + 900, 4000)}</form>"
    return f"{core}<ul>{items}</ul>{filler}"


def _genre_malformed(seed: int) -> str:
    return f"<html ... /><p>{_paragraph(seed, 3, 12)}</p><unknowntag>{_sentence(seed + 2, 8)}</unknowntag>"


def _genre_duplicated(seed: int) -> str:
    long_p = _paragraph(seed, 2, 16)
    short = _sentence(seed + 1, 4)
    return f"<article><p>{long_p}</p><p>{long_p}</p><p>{short}</p><p>{short}</p><p>{_paragraph(seed + 2, 2, 12)}</p></article>"


def _genre_empty(seed: int) -> str:
    return "   " if seed % 2 == 0 else ""


def _genre_plain_text(seed: int) -> str:
    return _paragraph(seed, 3, 12)


def _genre_large_doc(seed: int) -> str:
    paras = "".join(f"<p>{_sentence(seed + i, 10)}</p>" for i in range(400))
    return f"<article>{paras}</article>"


GENRES = [
    _genre_plain_article,
    _genre_short_article,
    _genre_class_div,
    _genre_boilerplate,
    _genre_link_farm,
    _genre_lists,
    _genre_table,
    _genre_quotes_code,
    _genre_headings_formatting,
    _genre_comments,
    _genre_json_ld,
    _genre_baseline_paragraphs,
    _genre_recall_escalation,
    _genre_malformed,
    _genre_duplicated,
    _genre_empty,
    _genre_plain_text,
]

_ROLES = ("user", "assistant", "tool")


def conversation_sizes(n_convs: int) -> Iterator[int]:
    "Heavy-tailed sizes: ~80% small (2-10 turns), ~1% long (60-400 turns)."
    for k in range(n_convs):
        h = _h(f"conv{k:08d}", -1, "size")
        bucket = h % 100
        if bucket < 80:
            yield 2 + h % 9
        elif bucket < 99:
            yield 10 + h % 40
        else:
            yield 60 + h % 340


def turn_text(conv_id: str, turn_idx: int) -> str:
    h = _h(conv_id, turn_idx, "genre")
    genre = GENRES[h % len(GENRES)]
    return genre(h % 100_000)


def generate_rows(n_convs: int, large_docs: bool = False) -> Iterator[tuple]:
    """Yield (conv_id, turn_idx, role, text, tool, ts) in shuffled turn order
    (stable-ordering logic must actually be exercised: FIXTURES.md §1)."""
    for k, size in enumerate(conversation_sizes(n_convs)):
        conv_id = f"conv{k:08d}"
        # deterministic shuffle: order turns by hash
        order = sorted(range(size), key=lambda i: _h(conv_id, i, "shuffle"))
        for turn_idx in order:
            role = _ROLES[turn_idx % 3]
            h = _h(conv_id, turn_idx, "genre")
            if large_docs and h % 5000 == 0:
                text = _genre_large_doc(h % 100_000)
            else:
                text = turn_text(conv_id, turn_idx)
            tool = f"tool{h % 7}" if role == "tool" else None
            ts = _EPOCH + timedelta(minutes=turn_idx)
            yield (conv_id, turn_idx, role, text, tool, ts)


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def transcripts_df(spark, n_convs: int, large_docs: bool = False, num_slices: int = 32):
    "Create the transcripts DataFrame distributed across ``num_slices`` tasks."
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField("role", StringType(), False),
            StructField("text", StringType(), True),
            StructField("tool", StringType(), True),
            StructField("ts", TimestampType(), False),
        ]
    )
    # generate on executors: parallelize conv ranges, flatMap the generator
    bounds = list(range(0, n_convs, max(1, n_convs // max(1, num_slices)))) + [n_convs]
    ranges = list(zip(bounds[:-1], bounds[1:]))

    def gen_range(bound):
        lo, hi = bound
        sizes = list(conversation_sizes(hi))[lo:hi]
        for k, size in enumerate(sizes, start=lo):
            conv_id = f"conv{k:08d}"
            order = sorted(range(size), key=lambda i: _h(conv_id, i, "shuffle"))
            for turn_idx in order:
                role = _ROLES[turn_idx % 3]
                h = _h(conv_id, turn_idx, "genre")
                if large_docs and h % 5000 == 0:
                    text = _genre_large_doc(h % 100_000)
                else:
                    text = turn_text(conv_id, turn_idx)
                tool = f"tool{h % 7}" if role == "tool" else None
                ts = _EPOCH + timedelta(minutes=turn_idx)
                yield (conv_id, turn_idx, role, text, tool, ts)

    rdd = spark.sparkContext.parallelize(ranges, len(ranges)).flatMap(gen_range)
    return spark.createDataFrame(rdd, schema)
