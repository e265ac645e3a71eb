"""Baseline rescue extractor and html2txt page-text measure.

Semantics mirror /root/reference/trafilatura/baseline.py (JSON-LD walk
:55-84, Discourse preload :87-107, strategy cascade :165-229, html2txt
:271-301).
"""

from __future__ import annotations

import json
import re
from html import unescape
from typing import Any, Iterable, Optional

from .cleaning import basic_cleaning
from .dom import Element, SubElement, parse_html
from .loader import load_html
from .settings import DEDUPE_SCAN_CAP, MIN_DUPLICATE_LENGTH
from .textutils import remove_control_characters, trim

_HTML_TAG_NAMES = (
    "a|abbr|address|article|aside|b|blockquote|body|br|caption|cite|code|dd|del|div|dl|dt|"
    "em|figcaption|figure|footer|h[1-6]|head|header|hr|html|i|img|ins|kbd|li|main|mark|nav|"
    "ol|p|pre|q|quote|s|section|small|span|strong|sub|summary|sup|table|tbody|td|tfoot|th|"
    "thead|time|title|tr|u|ul"
)
_HTML_MARKUP = re.compile(
    rf"</({_HTML_TAG_NAMES})>|<({_HTML_TAG_NAMES})(\s[^<>]*=[^<>]*)?/?>", re.IGNORECASE
)

_JSON_TEXT_KEYS = ("articleBody", "reviewBody")
_DESCRIPTION_TYPES = ("Product", "VideoObject")
_JSON_HOOKS = (
    _JSON_TEXT_KEYS
    + ("recipeInstructions", "acceptedAnswer")
    + tuple(f'"{t}"' for t in _DESCRIPTION_TYPES + ("HowTo",))
)
_JSON_HOOKS_RE = re.compile("|".join(re.escape(hook) for hook in _JSON_HOOKS))
_MIN_CONTENT_LENGTH = 100


def _as_list(value: Any) -> list:
    if value is None:
        return []
    return value if isinstance(value, list) else [value]


def _walk_json(node: Any, bodies: list, teasers: list) -> None:
    "Collect schema.org text content from parsed JSON-LD (baseline.py:55-84)."
    for item in _as_list(node):
        if not isinstance(item, dict):
            continue
        bodies.extend(
            item[key] for key in _JSON_TEXT_KEYS if isinstance(item.get(key), str) and item[key]
        )
        for key in ("recipeInstructions", "step"):
            for step in _as_list(item.get(key)):
                if isinstance(step, str):
                    bodies.append(step)
                elif isinstance(step, dict):
                    subs = [step, *_as_list(step.get("itemListElement"))]
                    bodies.extend(
                        sub["text"]
                        for sub in subs
                        if isinstance(sub, dict) and isinstance(sub.get("text"), str)
                    )
        answer = item.get("acceptedAnswer")
        if isinstance(answer, dict) and isinstance(answer.get("text"), str):
            bodies.append(answer["text"])
        if any(t in str(item.get("@type", "")) for t in _DESCRIPTION_TYPES) and isinstance(
            item.get("description"), str
        ):
            teasers.append(item["description"])
        for container in ("@graph", "mainEntity"):
            _walk_json(item.get(container), bodies, teasers)


def _discourse_texts(tree: Element) -> list:
    "Discourse forums: posts preloaded as JSON in an attribute (baseline.py:87-107)."
    node = next(
        (el for el in tree.iterdescendants("div") if el.get("id") == "data-preloaded"), None
    )
    if node is None:
        return []
    try:
        preloaded = json.loads(node.get("data-preloaded") or "")
    except Exception:
        return []
    if not isinstance(preloaded, dict):
        return []
    texts: list = []
    for key, value in preloaded.items():
        if not key.startswith("topic_"):
            continue
        try:
            posts = json.loads(value)["post_stream"]["posts"]
        except Exception:
            continue
        texts.extend(
            post["cooked"] for post in posts if isinstance(post, dict) and isinstance(post.get("cooked"), str)
        )
    return texts


def _render_text(raw: str) -> str:
    "Clean text from a JSON value which may carry (escaped) HTML (baseline.py:110-122)."
    raw = remove_control_characters(unescape(raw))
    if _HTML_MARKUP.search(raw):
        try:
            frag = parse_html(f"<html><body><div>{raw}</div></body></html>")
            if frag is not None:
                return trim(frag.text_content())
        except Exception:
            pass
    return trim(raw)


def _build_body(texts: Iterable, dedupe: bool = False) -> tuple:
    postbody = Element("body")
    temp_text = ""
    for text in texts:
        text = remove_control_characters(text)
        if text and (
            not dedupe
            or len(text) <= MIN_DUPLICATE_LENGTH
            or len(temp_text) > DEDUPE_SCAN_CAP
            or text not in temp_text
        ):
            SubElement(postbody, "p").text = text
            temp_text += "\n" + text if temp_text else text
    return postbody, temp_text


def _attempt(texts: Iterable, dedupe: bool = False) -> Optional[tuple]:
    postbody, temp_text = _build_body(texts, dedupe)
    return (postbody, temp_text, len(temp_text)) if len(temp_text) > _MIN_CONTENT_LENGTH else None


def _collect_json_content(tree: Element) -> tuple:
    bodies: list = []
    teasers: list = []
    for elem in tree.iterdescendants("script"):
        if elem.get("type") == "application/ld+json" and elem.text and _JSON_HOOKS_RE.search(elem.text):
            try:
                _walk_json(json.loads(elem.text, strict=False), bodies, teasers)
            except Exception:
                continue
    bodies.extend(_discourse_texts(tree))
    return bodies, teasers


def baseline(filecontent: Any) -> tuple:
    "Rescue extractor strategy cascade (baseline.py:165-229)."
    tree = load_html(filecontent)
    if tree is None:
        return Element("body"), "", 0
    if isinstance(filecontent, Element):
        tree = tree.copy_tree()

    json_bodies, json_teasers = _collect_json_content(tree)
    result = _attempt(map(_render_text, json_bodies), dedupe=True)
    if result:
        return result

    tree = basic_cleaning(tree)

    article_texts = []
    for elem in tree.iterdescendants("article"):
        if any(a.tag == "article" for a in elem.iterancestors()):
            continue
        text = trim(elem.text_content())
        if len(text) > _MIN_CONTENT_LENGTH:
            article_texts.append(text)
    if article_texts:
        cutoff = max(map(len, article_texts)) / 5
        result = _attempt(t for t in article_texts if len(t) >= cutoff)
        if result:
            return result

    paragraphs = (
        trim(element.text_content())
        for element in tree.iter("blockquote", "code", "p", "pre", "q", "quote")
    )
    result = _attempt(paragraphs, dedupe=True)
    if result:
        return result

    teaser = _attempt(map(_render_text, json_teasers), dedupe=True)

    postbody = Element("body")
    body_elem = tree.find(".//body")
    if body_elem is not None:
        p_elem = SubElement(postbody, "p")
        p_elem.text = remove_control_characters(
            "\n".join(text for e in body_elem.itertext() if (text := trim(e)))
        )
        if not teaser or len(p_elem.text) >= teaser[2]:
            return postbody, p_elem.text, len(p_elem.text)

    return teaser or (postbody, "", 0)


_BLOCK_ELEMS = frozenset(
    "address article aside blockquote br dd div dl dt figcaption figure footer form "
    "h1 h2 h3 h4 h5 h6 header hr li main nav ol p pre section summary table td th tr ul".split()
)


def html2txt_len(tree: Element, clean: bool = True) -> int:
    """``len(html2txt(tree))`` for an Element WITHOUT copying or mutating
    the tree — the recall-escalation gate (kernel/extract.py) only needs
    the length, and html2txt's copy + basic_cleaning deletes + block
    mutation loop cost ~6% of the plain extraction path.

    One read-only walk reproduces the exact output string: removed
    subtrees are skipped but their tails kept (delete_element keep_tail
    semantics — a removed tail joins the nearest preceding surviving
    sibling's tail, else the parent's text, so the transformation that
    applies to it is THAT attribute owner's block status; the block
    transform distributes over the concatenation because
    remove_control_characters is a per-character filter).  Equality with
    len(html2txt(tree)) is property-tested over the synthetic and
    real-page corpora."""
    body = tree.find(".//body")
    if body is None:
        body = tree
    from .selectors import basic_clean_pred

    rcc = remove_control_characters
    blocks = _BLOCK_ELEMS
    parts: list = []
    emit = parts.append
    bblock = body.tag in blocks
    t = body.text
    if bblock:
        emit(f" {rcc(t)}" if t else " ")
    elif t:
        emit(t)
    # (element, next_child_index, blockness of the attribute a removed
    # child's tail would currently merge into)
    stack = [(body, 0, bblock)]
    while stack:
        el, i, cur_block = stack.pop()
        children = el._children
        n = len(children)
        descended = False
        while i < n:
            c = children[i]
            i += 1
            if clean and basic_clean_pred(c):
                tl = c.tail
                if tl:
                    emit(rcc(tl) if cur_block else tl)
                continue
            cblock = c.tag in blocks
            t = c.text
            if cblock:
                emit(f" {rcc(t)}" if t else " ")
            elif t:
                emit(t)
            stack.append((el, i, cblock))
            stack.append((c, 0, cblock))
            descended = True
            break
        if not descended and el is not body:
            tl = el.tail
            if el.tag in blocks:
                emit(f" {rcc(tl)}" if tl else " ")
            elif tl:
                emit(tl)
    return len(" ".join("".join(parts).split()))


def html2txt(content: Any, clean: bool = True) -> str:
    "Whole-page text with block-boundary spacing (baseline.py:271-301)."
    tree = load_html(content)
    if tree is None:
        return ""
    if isinstance(content, Element):
        tree = tree.copy_tree()
    body = tree.find(".//body")
    if body is None:
        if not isinstance(content, Element):
            return ""
        body = tree
    if clean:
        body = basic_cleaning(body)
    for elem in body.iter(*_BLOCK_ELEMS):
        elem.text = f" {remove_control_characters(elem.text)}" if elem.text else " "
        elem.tail = f" {remove_control_characters(elem.tail)}" if elem.tail else " "
    return " ".join(body.text_content().split())
