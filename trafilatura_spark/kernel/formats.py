"""Output-format serializers: XML, JSON, CSV, HTML + YAML front matter.

Semantics mirror /root/reference/trafilatura/xml.py:138-296, 626-655
(control_xml_output, build_json_output, xmltocsv) and
htmlprocessing.py:450-496 (convert_to_html, build_html_output); format
dispatch mirrors core.py:78-132 (determine_returnstring)."""

from __future__ import annotations

import csv
import json
import re
from io import StringIO
from typing import Optional

from .dom import Element
from .serialize import xmltotxt
from .settings import Options
from .textutils import normalize_unicode, text_chars_test

META_ATTRIBUTES = [
    "sitename", "title", "author", "date", "url", "hostname", "description",
    "categories", "tags", "license", "id", "fingerprint", "language",
]

WITH_ATTRIBUTES = {"cell", "row", "del", "graphic", "head", "hi", "item", "list", "ref"}
NESTING_WHITELIST = {"cell", "figure", "item", "note", "quote"}

HTML_TAG_MAPPING = {"#i": "em", "#b": "strong", "#u": "u", "#t": "tt", "#sub": "sub", "#sup": "sup"}

_YAML_RESERVED = frozenset(
    {"true", "false", "yes", "no", "on", "off", "y", "n", "null", "none", "~"}
)


def _yaml_scalar(value: str) -> str:
    "YAML-safe scalar rendering (core.py:61-75)."
    if (
        value
        and value == value.strip()
        and value[0].isalpha()
        and ": " not in value
        and " #" not in value
        and not value.endswith(":")
        and value.lower() not in _YAML_RESERVED
        and all(ch >= " " and ch != "\x7f" for ch in value)
    ):
        return value
    return json.dumps(value, ensure_ascii=False)


def yaml_header(metadata) -> str:
    "Markdown/TXT YAML front matter (core.py:100-128)."
    header = "---\n"
    for attr in ("title", "author", "url", "hostname", "description", "sitename",
                 "date", "categories", "tags", "fingerprint", "id", "license"):
        value = getattr(metadata, attr, None)
        if value:
            if isinstance(value, str):
                value = _yaml_scalar(value)
            header += f"{attr}: {value}\n"
    header += "---\n"
    return header


# --- XML ---------------------------------------------------------------------

def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return _escape_text(s).replace('"', "&quot;")


def tostring_xml(el: Element, pretty: bool = True, level: int = 0) -> str:
    "Serialize the internal tree to XML (lxml tostring pretty_print analog)."
    attrs = "".join(f' {k}="{_escape_attr(str(v))}"' for k, v in el.attrib.items())
    # mixed content (element text OR any child tail) must serialize inline:
    # indentation would inject whitespace into the text (lxml pretty_print
    # likewise skips elements with mixed content)
    children_only = (
        len(el) > 0
        and not text_chars_test(el.text)
        and not any(text_chars_test(child.tail) for child in el)
    )
    indent = "  " * level if pretty else ""
    if len(el) == 0 and not el.text:
        return f"{indent}<{el.tag}{attrs}/>"
    parts = [f"{indent}<{el.tag}{attrs}>"]
    if el.text:
        parts.append(_escape_text(el.text))
    for child in el:
        if pretty and children_only:
            parts.append("\n")
        parts.append(tostring_xml(child, pretty and children_only, level + 1))
        if child.tail:
            parts.append(_escape_text(child.tail))
    if pretty and children_only and len(el) > 0:
        parts.append(f"\n{indent}")
    parts.append(f"</{el.tag}>")
    return "".join(parts)


def _merge_with_parent(element: Element) -> None:
    "xml.py:117-135."
    parent = element.getparent()
    if parent is None:
        return
    full_text = element.text or ""
    if element.tail is not None:
        full_text += element.tail
    previous = element.getprevious()
    if previous is not None:
        previous.tail = f"{previous.tail} {full_text}" if previous.tail else full_text
    elif parent.text is not None:
        parent.text = f"{parent.text} {full_text}"
    else:
        parent.text = full_text
    parent.remove(element)


def strip_double_tags(tree: Element) -> Element:
    "Prevent nested head/code/p (xml.py:150-156)."
    targets = [el for el in tree.iterdescendants() if el.tag in ("head", "code", "p")]
    for elem in reversed(targets):
        for subelem in list(elem.iterdescendants("code", "head", "p")):
            parent = subelem.getparent()
            if subelem.tag == elem.tag and parent is not None and parent.tag not in NESTING_WHITELIST:
                _merge_with_parent(subelem)
    return tree


def remove_empty_elements(tree: Element) -> Element:
    "xml.py:138-147."
    for element in list(tree.iterdescendants()):
        if (
            len(element) == 0
            and not text_chars_test(element.text)
            and not text_chars_test(element.tail)
        ):
            parent = element.getparent()
            if parent is not None and element.tag != "graphic" and parent.tag != "code":
                parent.remove(element)
    return tree


def clean_attributes(tree: Element) -> Element:
    for elem in tree.iter():
        if elem.tag not in WITH_ATTRIBUTES:
            elem.attrib.clear()
    return tree


def build_xml_output(body: Element, commentsbody: Optional[Element], metadata=None) -> str:
    "<doc> tree with meta attributes (xml.py:191-213)."
    output = Element("doc")
    if metadata is not None:
        for attribute in META_ATTRIBUTES:
            value = getattr(metadata, attribute, None)
            if value:
                output.set(attribute, value if isinstance(value, str) else ";".join(value))
    strip_double_tags(body)
    remove_empty_elements(body)
    body.tag = "main"
    output.append(clean_attributes(body))
    comments = commentsbody if commentsbody is not None else Element("body")
    comments.tag = "comments"
    output.append(clean_attributes(comments))
    return tostring_xml(output, pretty=True).strip()


# --- JSON / CSV ----------------------------------------------------------------

def build_json_output(body: Element, commentsbody: Optional[Element], metadata=None, with_metadata: bool = True) -> str:
    "xml.py:159-180."
    if with_metadata and metadata is not None:
        outputdict = metadata.as_dict()
        outputdict.update(
            {
                "source": outputdict.pop("url", None),
                "source-hostname": outputdict.pop("sitename", None),
                "excerpt": outputdict.pop("description", None),
                "categories": ";".join(outputdict.pop("categories", None) or []),
                "tags": ";".join(outputdict.pop("tags", None) or []),
                "text": xmltotxt(body, include_formatting=False),
            }
        )
    else:
        outputdict = {"text": xmltotxt(body, include_formatting=False)}
    outputdict["comments"] = xmltotxt(commentsbody, include_formatting=False) if commentsbody is not None else ""
    return json.dumps(outputdict, ensure_ascii=False)


def xmltocsv(body: Element, commentsbody: Optional[Element], metadata=None,
             include_formatting: bool = False, delim: str = "\t", null: str = "null") -> str:
    "Single-row TSV (xml.py:626-655)."
    posttext = xmltotxt(body, include_formatting) or null
    commentstext = (xmltotxt(commentsbody, include_formatting) if commentsbody is not None else "") or null
    m = metadata
    output = StringIO()
    writer = csv.writer(output, delimiter=delim, quoting=csv.QUOTE_MINIMAL)
    writer.writerow(
        [
            d if d else null
            for d in (
                getattr(m, "url", None),
                getattr(m, "id", None),
                getattr(m, "fingerprint", None),
                getattr(m, "hostname", None),
                getattr(m, "title", None),
                getattr(m, "image", None),
                getattr(m, "date", None),
                posttext,
                commentstext,
                getattr(m, "license", None),
                getattr(m, "pagetype", None),
            )
        ]
    )
    return output.getvalue()


# --- HTML ------------------------------------------------------------------------

HTML_CONVERSIONS = {
    "list": "ul",
    "item": "li",
    "code": "pre",
    "quote": "blockquote",
    "head": lambda elem: f"h{int((elem.get('rend') or 'h3')[1:]) if (elem.get('rend') or 'h3')[1:].isdigit() else 3}",
    "lb": "br",
    "graphic": "img",
    "ref": "a",
    "hi": lambda elem: HTML_TAG_MAPPING.get(elem.get("rend", "#i"), "em"),
    "row": "tr",
    "cell": lambda elem: "th" if elem.get("role") == "head" else "td",
}


def convert_to_html(tree: Element) -> Element:
    "Internal vocabulary -> simplified HTML (htmlprocessing.py:465-482)."
    for elem in list(tree.iter()):
        conversion = HTML_CONVERSIONS.get(elem.tag)
        if conversion is None:
            continue
        elem.tag = conversion(elem) if callable(conversion) else conversion
        if elem.tag == "a":
            elem.set("href", elem.attrib.pop("target", ""))
        elif elem.tag != "img":
            keep = {k: v for k, v in elem.attrib.items() if k == "href"}
            elem.attrib.clear()
            elem.attrib.update(keep)
    tree.tag = "body"
    root = Element("html")
    root.append(tree)
    return root


def build_html_output(body: Element, metadata=None, with_metadata: bool = False) -> str:
    "htmlprocessing.py:485-496."
    html_tree = convert_to_html(body)
    if with_metadata and metadata is not None:
        head = Element("head")
        for item in META_ATTRIBUTES:
            value = getattr(metadata, item, None)
            if value:
                meta = Element("meta", {"name": item, "content": value if isinstance(value, str) else ";".join(value)})
                head.append(meta)
        html_tree.insert(0, head)
    return tostring_xml(html_tree, pretty=True).strip()


def determine_returnstring(body: Element, commentsbody: Optional[Element],
                           options: Options, metadata=None) -> str:
    "Format dispatch (core.py:78-132)."
    if options.format == "xmltei":
        from .metadata import Metadata
        from .tei import build_tei_output

        strip_double_tags(body)
        remove_empty_elements(body)
        returnstring = build_tei_output(body, commentsbody, metadata or Metadata())
    elif options.format == "xml":
        returnstring = build_xml_output(body, commentsbody, metadata)
    elif options.format == "csv":
        returnstring = xmltocsv(body, commentsbody, metadata, options.formatting)
    elif options.format == "json":
        returnstring = build_json_output(body, commentsbody, metadata)
    elif options.format == "html":
        returnstring = build_html_output(body, metadata, metadata is not None)
    else:
        header = yaml_header(metadata) if metadata is not None else ""
        returnstring = f"{header}{xmltotxt(body, options.formatting)}"
        if commentsbody is not None:
            returnstring = f"{returnstring}\n{xmltotxt(commentsbody, options.formatting)}".strip()
    return normalize_unicode(returnstring)
