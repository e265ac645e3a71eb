"""TEI-XML output (xmltei format).

Semantics mirror /root/reference/trafilatura/xml.py:658-873
(write_teitree, write_fullheader, check_tei repairs): the extracted body
and comments are bundled as <div type=entry|comments> under
<TEI><text><body>, with a teiHeader built from the metadata; head
elements become <ab type=header>, invalid tags merge into their parent,
and attributes are restricted to the TEI-valid set.
"""

from __future__ import annotations

from typing import Optional

from .dom import Element, SubElement
from .formats import _merge_with_parent, clean_attributes, tostring_xml

TEI_VALID_TAGS = {
    "ab", "body", "cell", "code", "del", "div", "graphic", "head", "hi",
    "item", "lb", "list", "p", "quote", "ref", "row", "table",
}
TEI_VALID_ATTRS = {"rend", "rendition", "role", "target", "type"}
TEI_REMOVE_TAIL = {"ab", "p"}
TEI_DIV_SIBLINGS = {"p", "list", "table", "quote", "ab"}

ENGINE_IDENT = "trafilatura-spark"
ENGINE_URL = "https://github.com/adbar/trafilatura"  # semantics source


def _sub(parent: Element, tag: str, text: Optional[str] = None, **attrs) -> Element:
    el = SubElement(parent, tag, dict(attrs))
    if text is not None:
        el.text = text
    return el


def _publisher_string(m) -> str:
    "xml.py:677-685."
    hostname = getattr(m, "hostname", None)
    sitename = getattr(m, "sitename", None)
    if hostname and sitename:
        return f"{sitename.strip()} ({hostname})"
    return hostname or sitename or "N/A"


def write_fullheader(teidoc: Element, m) -> Element:
    "TEI header from metadata (xml.py:688-758)."
    header = SubElement(teidoc, "teiHeader")
    filedesc = SubElement(header, "fileDesc")
    bib_titlestmt = SubElement(filedesc, "titleStmt")
    _sub(bib_titlestmt, "title", getattr(m, "title", None), type="main")
    if getattr(m, "author", None):
        _sub(bib_titlestmt, "author", m.author)

    publicationstmt_a = SubElement(filedesc, "publicationStmt")
    publisher_string = _publisher_string(m)
    if getattr(m, "license", None):
        _sub(publicationstmt_a, "publisher", publisher_string)
        availability = SubElement(publicationstmt_a, "availability")
        _sub(availability, "p", m.license)
    else:
        SubElement(publicationstmt_a, "p")

    notesstmt = SubElement(filedesc, "notesStmt")
    if getattr(m, "id", None):
        _sub(notesstmt, "note", m.id, type="id")
    _sub(notesstmt, "note", getattr(m, "fingerprint", None), type="fingerprint")

    sourcedesc = SubElement(filedesc, "sourceDesc")
    source_bibl = SubElement(sourcedesc, "bibl")
    sigle = ", ".join(filter(None, [getattr(m, "sitename", None), getattr(m, "date", None)]))
    source_bibl.text = ", ".join(filter(None, [getattr(m, "title", None), sigle]))
    _sub(sourcedesc, "bibl", sigle, type="sigle")

    biblfull = SubElement(sourcedesc, "biblFull")
    bib_titlestmt2 = SubElement(biblfull, "titleStmt")
    _sub(bib_titlestmt2, "title", getattr(m, "title", None), type="main")
    if getattr(m, "author", None):
        _sub(bib_titlestmt2, "author", m.author)

    publicationstmt = SubElement(biblfull, "publicationStmt")
    _sub(publicationstmt, "publisher", publisher_string)
    if getattr(m, "url", None):
        _sub(publicationstmt, "ptr", None, type="URL", target=m.url)
    _sub(publicationstmt, "date", getattr(m, "date", None))

    profiledesc = SubElement(header, "profileDesc")
    abstract = SubElement(profiledesc, "abstract")
    _sub(abstract, "p", getattr(m, "description", None))

    categories = getattr(m, "categories", None) or []
    tags = getattr(m, "tags", None) or []
    if categories or tags:
        textclass = SubElement(profiledesc, "textClass")
        keywords = SubElement(textclass, "keywords")
        if categories:
            _sub(keywords, "term", ",".join(categories), type="categories")
        if tags:
            _sub(keywords, "term", ",".join(tags), type="tags")

    creation = SubElement(profiledesc, "creation")
    _sub(creation, "date", getattr(m, "filedate", None), type="download")

    encodingdesc = SubElement(header, "encodingDesc")
    appinfo = SubElement(encodingdesc, "appInfo")
    application = SubElement(appinfo, "application", {"version": "0.1.0", "ident": ENGINE_IDENT})
    _sub(application, "label", ENGINE_IDENT)
    _sub(application, "ptr", None, target=ENGINE_URL)

    return header


def _handle_unwanted_tails(element: Element) -> None:
    "Move ab/p tail text into the element or a new sibling p (xml.py analog)."
    tail = (element.tail or "").strip()
    element.tail = None
    if not tail:
        return
    if element.tag == "p":
        element.text = f"{element.text} {tail}".strip() if element.text else tail
    else:
        sibling = Element("p")
        sibling.text = tail
        element.addnext(sibling)


def _handle_text_content_of_div_nodes(element: Element) -> None:
    """Wrap loose div text/tail in <p> for TEI conformity, MERGING into an
    adjacent existing <p> when there is one (xml.py
    _handle_text_content_of_div_nodes: leading text joins the first child
    p, the div's tail joins the last child p)."""
    if element.text and element.text.strip():
        if len(element) > 0 and element[0].tag == "p":
            element[0].text = f"{element.text} {element[0].text or ''}".strip()
        else:
            new_child = Element("p")
            new_child.text = element.text
            element.insert(0, new_child)
        element.text = None

    if element.tail and element.tail.strip():
        if len(element) > 0 and element[-1].tag == "p":
            element[-1].text = f"{element[-1].text or ''} {element.tail}".strip()
        else:
            new_child = Element("p")
            new_child.text = element.tail
            element.append(new_child)
        element.tail = None


TEI_DIV_SIBLINGS = {"p", "list", "table", "quote", "ab"}


def _wrap_unwanted_siblings_of_div(div_element: Element) -> None:
    "Wrap block siblings following a div in a new div (xml.py analog)."
    new_sibling = Element("div")
    new_sibling_index = None
    parent = div_element.getparent()
    if parent is None:
        return
    for sibling in list(div_element.itersiblings()):
        if sibling.tag == "div":
            break
        if sibling.tag in TEI_DIV_SIBLINGS:
            new_sibling_index = new_sibling_index or parent.index(sibling)
            parent.remove(sibling)
            new_sibling.append(sibling)
        else:
            if new_sibling_index and len(new_sibling) > 0:
                parent.insert(new_sibling_index, new_sibling)
                new_sibling = Element("div")
                new_sibling_index = None
    if new_sibling_index and len(new_sibling) != 0:
        parent.insert(new_sibling_index, new_sibling)


def _move_element_one_level_up(element: Element) -> None:
    """Move an <ab> outside its <p> parent, splitting the p around it
    (xml.py _move_element_one_level_up)."""
    parent = element.getparent()
    grand_parent = parent.getparent() if parent is not None else None
    if parent is None or grand_parent is None:
        return

    new_elem = Element("p")
    trailing = list(element.itersiblings())
    for sib in trailing:
        parent.remove(sib)
    new_elem.extend(trailing)

    parent.remove(element)
    grand_parent.insert(grand_parent.index(parent) + 1, element)

    tail = element.tail.strip() if element.tail else None
    if tail:
        new_elem.text = tail
        element.tail = None

    tail = parent.tail.strip() if parent.tail else None
    if tail:
        new_elem.tail = tail
        parent.tail = None

    if len(new_elem) > 0 or new_elem.text or new_elem.tail:
        grand_parent.insert(grand_parent.index(element) + 1, new_elem)

    if len(parent) == 0 and not parent.text:
        grand_parent.remove(parent)


def _tei_handle_complex_head(element: Element) -> Element:
    """Convert a head with children to <ab>: p children fold into the ab
    text (joined with <lb/>), other children (lists, tables) are carried
    inside the ab verbatim (xml.py _tei_handle_complex_head)."""
    new_element = Element("ab", dict(element.attrib))
    new_element.text = element.text.strip() if element.text else None
    for child in list(element):
        if child.tag == "p":
            if len(new_element) > 0 or new_element.text:
                if len(new_element) == 0 or new_element[-1].tail:
                    SubElement(new_element, "lb")
                new_element[-1].tail = child.text
            else:
                new_element.text = child.text
        else:
            element.remove(child)
            new_element.append(child)
    tail = element.tail.strip() if element.tail else None
    if tail:
        new_element.tail = tail
    return new_element


def check_tei(xmldoc: Element) -> Element:
    "Scrub remaining non-TEI tags/attributes (xml.py check_tei semantics)."
    for elem in list(xmldoc.iterdescendants("head")):
        elem.tag = "ab"
        elem.set("type", "header")
        parent = elem.getparent()
        if parent is None:
            continue
        if len(elem) > 0:
            new_elem = _tei_handle_complex_head(elem)
            idx = parent.index(elem)
            parent.remove(elem)
            parent.insert(idx, new_elem)
            elem = new_elem
        if parent.tag == "p":
            _move_element_one_level_up(elem)
    # <lb/> child of a body div with tail text becomes a <p> (xml.py)
    for body in xmldoc.iterdescendants("body"):
        for div in body.iterdescendants("div"):
            for elem in list(div):
                if elem.tag == "lb" and elem.tail and elem.tail.strip():
                    elem.tag, elem.text, elem.tail = "p", elem.tail, None
    bodies = [el for el in xmldoc.iterdescendants("body")]
    for body in bodies:
        for elem in list(body.iterdescendants()):
            if elem.tag not in TEI_VALID_TAGS:
                _merge_with_parent(elem)
                continue
            if elem.tag in TEI_REMOVE_TAIL:
                _handle_unwanted_tails(elem)
            elif elem.tag == "div":
                _handle_text_content_of_div_nodes(elem)
                _wrap_unwanted_siblings_of_div(elem)
            for attribute in [a for a in elem.attrib if a not in TEI_VALID_ATTRS]:
                elem.attrib.pop(attribute)
    return xmldoc


def build_tei_output(body: Element, commentsbody: Optional[Element], metadata) -> str:
    "Full TEI document string (xml.py:215-240, 658-674)."
    teidoc = Element("TEI", {"xmlns": "http://www.tei-c.org/ns/1.0"})
    write_fullheader(teidoc, metadata)
    textelem = SubElement(teidoc, "text")
    textbody = SubElement(textelem, "body")
    postbody = clean_attributes(body)
    postbody.tag = "div"
    postbody.set("type", "entry")
    textbody.append(postbody)
    comments = commentsbody if commentsbody is not None else Element("body")
    comments = clean_attributes(comments)
    comments.tag = "div"
    comments.set("type", "comments")
    textbody.append(comments)
    check_tei(teidoc)
    return tostring_xml(teidoc, pretty=True).strip()


# --- structural TEI validation (stand-in for DTD validation) -----------------

# Content models for the TEI P5 subset this serializer emits, transcribed
# from the tei_corpus DTD the reference validates against
# (reference xml.py:284-297, data/tei_corpus.dtd).  lxml's DTD engine is
# unavailable here, so validation is structural: allowed children,
# text-forbidden elements, allowed attributes, required skeleton.
_TEI_INLINE = {"hi", "ref", "del", "code", "lb", "graphic"}
_TEI_BLOCK = {"div", "head", "p", "list", "table", "quote", "ab", "lb", "graphic", "code"}
_TEI_CHILD_MODEL = {
    "TEI": {"teiHeader", "text"},
    "teiHeader": {"fileDesc", "profileDesc", "encodingDesc"},
    "fileDesc": {"titleStmt", "publicationStmt", "notesStmt", "sourceDesc"},
    "titleStmt": {"title", "author"},
    "publicationStmt": {"publisher", "availability", "p", "ptr", "date"},
    "availability": {"p", "licence"},
    "notesStmt": {"note"},
    "sourceDesc": {"bibl", "biblFull", "p"},
    "biblFull": {"titleStmt", "publicationStmt"},
    "profileDesc": {"abstract", "textClass", "creation"},
    "abstract": {"p"},
    "textClass": {"keywords"},
    "keywords": {"term"},
    "creation": {"date"},
    "encodingDesc": {"appInfo"},
    "appInfo": {"application"},
    "application": {"label", "ptr"},
    "text": {"body"},
    "body": _TEI_BLOCK,
    "div": _TEI_BLOCK,
    "p": _TEI_INLINE,
    "head": _TEI_INLINE,
    "ab": _TEI_INLINE,
    "quote": _TEI_INLINE | {"p"},
    "item": _TEI_INLINE | {"list", "p"},
    "cell": _TEI_INLINE | {"p", "list"},
    "list": {"head", "item"},
    "table": {"head", "row"},
    "row": {"cell"},
    "hi": _TEI_INLINE,
    "ref": _TEI_INLINE - {"ref"},
    "del": _TEI_INLINE,
    "code": {"lb"},
}
_TEI_NO_TEXT = {
    "TEI", "teiHeader", "fileDesc", "titleStmt", "publicationStmt", "notesStmt",
    "sourceDesc", "biblFull", "profileDesc", "textClass", "keywords", "creation",
    "encodingDesc", "appInfo", "application", "availability",
    "text", "body", "list", "table", "row",
}
_TEI_HEADER_ATTRS = {"type", "target", "version", "ident", "xmlns"}


def validate_tei(teidoc: Element) -> tuple:
    """Structural TEI validation: returns (is_valid, errors).

    Checks the skeleton (TEI > teiHeader(fileDesc(titleStmt,
    publicationStmt, sourceDesc)) + text(body)), per-element child
    models, text-forbidden structural elements, and attributes
    (TEI_VALID_ATTRS in the text body, header vocabulary in the header)."""
    errors = []
    if teidoc.tag != "TEI":
        return False, [f"root must be TEI, got {teidoc.tag}"]
    top = [c.tag for c in teidoc]
    if top != ["teiHeader", "text"]:
        errors.append(f"TEI children must be [teiHeader, text], got {top}")
    header = next(teidoc.iterdescendants("teiHeader"), None)
    if header is not None:
        filedesc = next((c for c in header if c.tag == "fileDesc"), None)
        if filedesc is None:
            errors.append("teiHeader missing fileDesc")
        else:
            tags = [c.tag for c in filedesc]
            for required in ("titleStmt", "publicationStmt", "sourceDesc"):
                if required not in tags:
                    errors.append(f"fileDesc missing {required}")
    body = next(teidoc.iterdescendants("body"), None)
    if body is None:
        errors.append("no text/body")

    in_header = set()
    if header is not None:
        in_header = {id(el) for el in header.iterdescendants()} | {id(header)}
    for el in teidoc.iterdescendants():
        model = _TEI_CHILD_MODEL.get(el.tag)
        if model is not None:
            for child in el:
                if child.tag not in model:
                    errors.append(f"<{child.tag}> not allowed under <{el.tag}>")
        if el.tag in _TEI_NO_TEXT and (el.text or "").strip():
            errors.append(f"text content not allowed in <{el.tag}>")
        allowed_attrs = _TEI_HEADER_ATTRS if id(el) in in_header else TEI_VALID_ATTRS
        for attr in el.attrib:
            if attr not in allowed_attrs:
                errors.append(f"attribute {attr!r} not allowed on <{el.tag}>")
    return not errors, errors


# --- real DTD validation (reference xml.py:284-296 parity) -------------------

_DTD_SCHEMA_CACHE: dict = {}


def load_tei_dtd(path: Optional[str] = None):
    """Parse a TEI DTD into a validatable schema (kernel/dtd.py — the
    from-scratch DTD engine standing in for lxml.etree.DTD).  The path
    resolves from the argument, then $TEI_DTD_PATH; returns None when no
    DTD file is available (callers fall back to the structural
    validator).  Parsed schemas are cached per path."""
    import os

    path = path or os.environ.get("TEI_DTD_PATH")
    if not path or not os.path.exists(path):
        return None
    if path not in _DTD_SCHEMA_CACHE:
        from .dtd import parse_dtd

        with open(path, "r", encoding="utf-8") as fh:
            _DTD_SCHEMA_CACHE[path] = parse_dtd(fh.read())
    return _DTD_SCHEMA_CACHE[path]


def validate_tei_dtd(teidoc: Element, dtd_path: Optional[str] = None) -> tuple:
    """TEI validation against an actual DTD when one is available
    (reference validate_tei, xml.py:284-296: `DTD(TEI_SCHEMA).validate`),
    else the structural validator.  Returns (is_valid, errors)."""
    schema = load_tei_dtd(dtd_path)
    if schema is None:
        return validate_tei(teidoc)
    errors = schema.validate(teidoc)
    return not errors, errors
