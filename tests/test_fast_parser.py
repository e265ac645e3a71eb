"""Differential tests: the fast single-shot tokenizer vs the stdlib driver.

kernel/dom.py's _fast_feed re-implements HTMLParser's whole-document
tokenization (reusing the stdlib's own compiled regexes) to skip the
incremental-feed buffering and double tag scan — the invariant is that
parse_html (fast path, stdlib fallback on punt) and parse_html_stdlib
(html.parser-driven) produce IDENTICAL trees: same tags, same attribute
dicts in the same insertion order, same text/tail, same child order.

Pinned here three ways: a curated adversarial-snippet battery, a
seeded random fuzzer, and a slice of the reference's 926-page eval
corpus (/root/reference/tests/eval — real-world markup including the
broken kind).
"""

from __future__ import annotations

import os
import random

import pytest

from trafilatura_spark.kernel.dom import (
    Element,
    _FastUnsupported,
    _TreeBuilder,
    _fast_feed,
    parse_html,
    parse_html_stdlib,
)
from trafilatura_spark.kernel.loader import decode_file

EVAL_DIR = "/root/reference/tests/eval"


def _sig(elem: Element) -> tuple:
    "Full structural signature: tag, ordered attrs, text, tail, children."
    return (
        elem.tag,
        tuple(elem.attrib.items()),  # order-sensitive: dict insertion order
        elem.text,
        elem.tail,
        tuple(_sig(c) for c in elem._children),
    )


def _assert_same(html: str, label: str) -> None:
    fast = parse_html(html)
    slow = parse_html_stdlib(html)
    if slow is None:
        assert fast is None, f"{label}: fast parsed what stdlib rejected"
        return
    assert fast is not None, f"{label}: fast rejected what stdlib parsed"
    assert _sig(fast) == _sig(slow), f"{label}: tree divergence"


# -- curated adversarial snippets ------------------------------------------

SNIPPETS = [
    # plain + entities
    "<p>a &amp; b &lt;c&gt; &#65; &#x42; &unknown; &amp</p>",
    # unterminated start tag at EOF, with/without attr value in flight
    "<p>x<div", "<p>x<div ", "<p>x<div class", "<p>x<div class=", "<p>x<div class='a",
    '<p>x<div class="a', "<p>x<div class=a", "<p>x<div class=a ", "<p>x<a href=b c",
    # self-closing, slash handling
    "<br/>t<img src='x'/>u<div/>v", "<p>x<div /", "<p>a<b/", "<hr / >tail",
    # bogus '>' inside attr values, '<' in text
    '<a href="x>y">t</a>', "<p>1 < 2 and 3<4</p>", "a < b",
    # end-tag variants
    "<div><p>t</p ></div>", "<div>t</ div>", "<div>t</p junk>u</div>",
    "<div>t</></div>", "<div>t</", "<div>t</p", "</>x",
    # comments: normal, unterminated, bogus
    "<p>a<!-- c <b> -->b</p>", "<p>a<!-- unterminated", "<p>a<!>b", "<p>a<! doctype>b",
    "<p>a<!-->b", "<p>a<!--->b", "<p>a<!---->b",
    # processing instructions
    "<p>a<?php echo ?>b</p>", "<p>a<?unterminated",
    # doctype
    "<!DOCTYPE html><p>a</p>", "<!doctype html SYSTEM 'x'><p>a</p>", "<!DOCTYPE html",
    # marked sections (fast path punts to stdlib — must still match)
    "<p>a<![CDATA[ <b> ]]>b</p>", "<p>a<![IGNORE[x]]>b</p>", "<p>a<![",
    # script/style rawtext: entities NOT converted, nested markers, spacing
    "<script>var a = '<div>' && b &amp; 1;</script>after",
    "<script>if (a</b>) {}</script>t", "<script>x</script >t",
    "<script>x</ script>t</script>u",  # '</ script>' is NOT a close in rawtext
    "<style>p > a { content: '</x>'; }</style>t",
    "<script>unterminated rawtext &amp; <div>",
    "<SCRIPT>A</SCRIPT>b", "<script src='x'></script>c",
    # style with comment-looking content
    "<style>/* </style> */ p{}</style>tail",
    # attribute edge cases: dupes, case, entity in value, empty, weird chars
    '<p CLASS="A" class="b" id=c d e="">t</p>',
    "<a href='a&amp;b&notreal;c'>t</a>", "<p a=b=c>t</p>", "<p 'quoted'>t</p>",
    "<p a\t=\n'v'>t</p>", "<p =v>t</p>", "<p a='x<y'>t</p>",
    # nesting/implied structure exercised through the tree builder
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<ul><li>a<li>b</ul>", "<p>a<p>b", "<b><i>x</b>y</i>",
    # lone/trailing markup
    "<", "a<", "<p>a< b</p>", "<0>x</0>", "< p>x",
    # numeric charrefs incl. invalid/surrogate/overflow
    "<p>&#0; &#xD800; &#x110000; &#999999999999;</p>",
    # NULs and control chars
    "<p>a\x00b\x0cc</p>", "<p \x00a='b'>t</p>",
    # upper-case rawtext close + attributes on the close
    "<script>x</SCRIPT foo='bar'>y", "<style>x</STYLE\t>y",
    # empty / whitespace / doctype-only
    "", "   ", "<!DOCTYPE html>", "﻿<p>bom</p>",
]


@pytest.mark.parametrize("idx", range(len(SNIPPETS)))
def test_adversarial_snippets(idx):
    _assert_same(SNIPPETS[idx], f"snippet[{idx}]")


def test_marked_section_punts_to_stdlib():
    "The '<![' construct must raise _FastUnsupported, not mis-tokenize."
    b = _TreeBuilder()
    with pytest.raises(_FastUnsupported):
        _fast_feed(b, "<p>a<![CDATA[x]]>b</p>")
    # and the public entrypoint still parses it (stdlib fallback)
    assert parse_html("<p>a<![CDATA[x]]>b</p>") is not None


# -- seeded random fuzzer ---------------------------------------------------

_ATOMS = [
    "<div>", "</div>", "<p>", "</p>", "<br/>", "<a href='x'>", "</a>",
    "<script>", "</script>", "<style>", "</style>", "<!--", "-->", "<!", ">",
    "<?", "?>", "text", "&amp;", "&#65;", "&bogus;", "<", ">", "/", "=",
    "'", '"', " ", "\n", "\t", "<img src=", "<td", "class='c'", "<!DOCTYPE",
    "</", "<x y", "z='", "\x00", "é", "💡", "]]>", "<![",
]


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_differential(seed):
    rng = random.Random(9000 + seed)
    for trial in range(25):
        html = "".join(rng.choice(_ATOMS) for _ in range(rng.randint(1, 60)))
        _assert_same(html, f"fuzz seed={seed} trial={trial} html={html!r}")


# -- real-corpus slice ------------------------------------------------------

@pytest.mark.parametrize("stride_off", range(2))
def test_eval_corpus_slice(stride_off):
    "Every 8th real eval page (116 files/param): byte-identical trees."
    if not os.path.isdir(EVAL_DIR):
        pytest.skip("reference eval corpus not present")
    files = sorted(os.listdir(EVAL_DIR))[stride_off::8]
    assert files
    punts = 0
    for fn in files:
        with open(os.path.join(EVAL_DIR, fn), "rb") as f:
            raw = f.read()
        html = decode_file(raw)
        b = _TreeBuilder()
        try:
            _fast_feed(b, html)
            fast = b.root
        except _FastUnsupported:
            punts += 1
            continue
        slow = parse_html_stdlib(html)
        assert slow is not None, fn
        assert _sig(fast) == _sig(slow), f"tree divergence on {fn}"
    # the fast path must actually carry the corpus, not punt through it
    assert punts <= len(files) // 20, f"{punts}/{len(files)} punts"
