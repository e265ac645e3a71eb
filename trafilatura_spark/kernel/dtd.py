"""From-scratch XML DTD validator (TEI output validation).

The reference validates its TEI output against the bundled TEI P5 DTD
through libxml2 (`lxml.etree.DTD`, reference xml.py:284-296); lxml does
not exist in this environment, so the required DTD subset is implemented
directly from the XML 1.0 specification (public):

- parameter entities  <!ENTITY % name "value">  with recursive %name;
  expansion (the TEI DTD is built almost entirely from them),
- element declarations  <!ELEMENT name content-model>  with EMPTY / ANY /
  mixed (#PCDATA|a|b)* / deterministic child models using , | ? * +,
- attribute lists  <!ATTLIST name attr type default ...>  with
  enumerated types, #REQUIRED / #IMPLIED / #FIXED defaults.

Validation compiles each content model to a regular expression over the
child-element name sequence (each child contributes one `<name>` token —
the classic construction: DTD content models ARE regular expressions),
so conformance checking is a single re.fullmatch per element.  Checked
per element: child sequence against the model, forbidden text content in
element-only/EMPTY models, undeclared attributes, #REQUIRED attributes
present, enumerated attribute values, #FIXED values, and ID uniqueness.

Not implemented (unused by the TEI corpus DTD): conditional sections,
NOTATION declarations, external entities.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_PE_DECL_RE = re.compile(r"<!ENTITY\s+%\s+([\w.:-]+)\s+(\"[^\"]*\"|'[^']*')\s*>", re.S)
_PE_REF_RE = re.compile(r"%([\w.:-]+);")
_ELEMENT_RE = re.compile(r"<!ELEMENT\s+([\w.:-]+)\s+(.*?)>", re.S)
_ATTLIST_RE = re.compile(r"<!ATTLIST\s+([\w.:-]+)\s+(.*?)>", re.S)
_NAME_RE = re.compile(r"[\w.:-]+")

_MAX_EXPANSION_DEPTH = 50


class AttDef:
    __slots__ = ("name", "enum", "default_kind", "fixed_value")

    def __init__(self, name: str, enum: Optional[frozenset], default_kind: str,
                 fixed_value: Optional[str]):
        self.name = name
        self.enum = enum  # allowed values for enumerated types, else None
        self.default_kind = default_kind  # REQUIRED | IMPLIED | FIXED | DEFAULT
        self.fixed_value = fixed_value


class ElementDecl:
    __slots__ = ("name", "model", "regex", "mixed", "empty", "any")

    def __init__(self, name: str, model: str):
        self.name = name
        self.model = model
        self.mixed = "#PCDATA" in model
        self.empty = model == "EMPTY"
        self.any = model == "ANY"
        self.regex = None if (self.empty or self.any) else _compile_model(model)


def _expand_pes(text: str, entities: Dict[str, str]) -> str:
    "Recursively substitute %name; parameter-entity references."
    for _ in range(_MAX_EXPANSION_DEPTH):
        out, n = _PE_REF_RE.subn(lambda m: entities.get(m.group(1), ""), text)
        if n == 0:
            return out
        text = out
    raise ValueError("parameter-entity expansion did not terminate (cycle?)")


def _compile_model(model: str) -> "re.Pattern":
    """Compile a DTD content model to a regex over `<childname>` tokens.

    Mixed content `(#PCDATA|a|b)*` becomes `(?:<a>|<b>)*` (text itself is
    checked separately); `(#PCDATA)` alone allows no children."""
    out: List[str] = []
    i, n = 0, len(model)
    while i < n:
        c = model[i]
        if c.isspace():
            i += 1
        elif c in "(),|?*+":
            out.append({",": "", "|": "|"}.get(c, c))
            i += 1
        elif model.startswith("#PCDATA", i):
            # contributes nothing to the child-sequence language
            i += 7
            # drop a dangling leading | : (#PCDATA|a|b) -> (a|b)
            # handled below by cleaning empty alternation arms
        else:
            m = _NAME_RE.match(model, i)
            if not m:
                raise ValueError(f"unparseable content model near: {model[i:i+40]!r}")
            out.append(f"(?:<{re.escape(m.group(0))}>)")
            i = m.end()
    pattern = "".join(out)
    # clean alternation arms emptied by #PCDATA removal: "(|a|b)" -> "(a|b)",
    # "(||)" -> "()"
    pattern = re.sub(r"\(\|+", "(", pattern)
    pattern = re.sub(r"\|+\)", ")", pattern)
    pattern = re.sub(r"\|{2,}", "|", pattern)
    # "()" (PCDATA-only model) matches only the empty child sequence; its
    # trailing * stays harmless
    return re.compile(pattern.replace("()", "(?:)") or "")


def _parse_attlist(body: str) -> List[AttDef]:
    "Tokenize one ATTLIST body: (name, type, default) triples."
    tokens: List[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c.isspace():
            i += 1
        elif c == "(":
            j = body.index(")", i)
            tokens.append(body[i : j + 1])
            i = j + 1
        elif c in "\"'":
            j = body.index(c, i + 1)
            tokens.append(body[i : j + 1])
            i = j + 1
        else:
            m = re.match(r"[#\w.:-]+", body[i:])
            if not m:
                raise ValueError(f"unparseable ATTLIST near: {body[i:i+40]!r}")
            tokens.append(m.group(0))
            i += m.end()
    defs: List[AttDef] = []
    k = 0
    while k < len(tokens):
        name = tokens[k]
        typ = tokens[k + 1]
        k += 2
        enum = None
        if typ.startswith("("):
            enum = frozenset(v.strip() for v in typ[1:-1].split("|"))
        default = tokens[k]
        k += 1
        fixed_value = None
        if default == "#FIXED":
            fixed_value = tokens[k][1:-1]
            k += 1
            kind = "FIXED"
        elif default == "#REQUIRED":
            kind = "REQUIRED"
        elif default == "#IMPLIED":
            kind = "IMPLIED"
        else:  # a quoted literal default
            kind = "DEFAULT"
        defs.append(AttDef(name, enum, kind, fixed_value))
    return defs


class DTDSchema:
    def __init__(self, elements: Dict[str, ElementDecl],
                 attlists: Dict[str, Dict[str, AttDef]]):
        self.elements = elements
        self.attlists = attlists

    # --- validation ----------------------------------------------------------

    def validate(self, root, max_errors: int = 20) -> List[str]:
        "All conformance violations of the tree (empty list == valid)."
        errors: List[str] = []
        seen_ids: Dict[str, str] = {}

        def walk(el) -> None:
            if len(errors) >= max_errors:
                return
            tag = el.tag
            decl = self.elements.get(tag)
            if decl is None:
                errors.append(f"undeclared element <{tag}>")
                return
            children = list(el)
            if decl.empty and (children or (el.text or "").strip()):
                errors.append(f"<{tag}> is declared EMPTY but has content")
            elif not decl.any:
                seq = "".join(f"<{c.tag}>" for c in children)
                if decl.regex is not None and not decl.regex.fullmatch(seq):
                    errors.append(
                        f"<{tag}> children {[c.tag for c in children]!r} "
                        f"do not match content model {decl.model[:120]}"
                    )
                if not decl.mixed and not decl.empty:
                    text = (el.text or "") + "".join(c.tail or "" for c in children)
                    if text.strip():
                        errors.append(
                            f"<{tag}> has text content but its model is element-only"
                        )
            atts = self.attlists.get(tag, {})
            for aname, avalue in el.attrib.items():
                adef = atts.get(aname)
                if adef is None:
                    errors.append(f"<{tag}> has undeclared attribute {aname!r}")
                    continue
                if adef.enum is not None and avalue not in adef.enum:
                    errors.append(
                        f"<{tag}> attribute {aname}={avalue!r} not in {sorted(adef.enum)}"
                    )
                if adef.default_kind == "FIXED" and avalue != adef.fixed_value:
                    errors.append(
                        f"<{tag}> attribute {aname}={avalue!r} must be fixed "
                        f"{adef.fixed_value!r}"
                    )
                if aname == "xml:id":
                    if avalue in seen_ids:
                        errors.append(f"duplicate xml:id {avalue!r}")
                    seen_ids[avalue] = tag
            for adef in atts.values():
                if adef.default_kind == "REQUIRED" and adef.name not in el.attrib:
                    errors.append(f"<{tag}> missing required attribute {adef.name!r}")
            for child in children:
                walk(child)

        walk(root)
        return errors


def parse_dtd(text: str) -> DTDSchema:
    "Parse a DTD document into a validatable schema."
    text = _COMMENT_RE.sub(" ", text)
    entities: Dict[str, str] = {}
    for m in _PE_DECL_RE.finditer(text):
        # first declaration wins, per XML 1.0 §4.2
        entities.setdefault(m.group(1), m.group(2)[1:-1])
    # entity values may themselves carry %refs — expand the whole document
    expanded = _expand_pes(text, entities)
    elements: Dict[str, ElementDecl] = {}
    for m in _ELEMENT_RE.finditer(expanded):
        name, model = m.group(1), " ".join(m.group(2).split())
        if name not in elements:
            elements[name] = ElementDecl(name, model)
    attlists: Dict[str, Dict[str, AttDef]] = {}
    for m in _ATTLIST_RE.finditer(expanded):
        name, body = m.group(1), m.group(2)
        target = attlists.setdefault(name, {})
        for adef in _parse_attlist(body):
            target.setdefault(adef.name, adef)
    return DTDSchema(elements, attlists)
