"""Minimal from-scratch PDF text extraction (north-rule "PDF/layout
parse" path).

No PDF library exists in this environment, so this is a self-contained
reader of the PDF text model (ISO 32000, public): content streams are
located by their stream/endstream brackets, FlateDecode streams are
inflated with stdlib zlib, and text is recovered from the text-showing
operators inside BT..ET blocks:

  (string) Tj        show string
  (string) ' / "     next-line + show
  [(a) -120 (b)] TJ  show array with kerning
  Td / TD / T* / TL  line-positioning operators -> line breaks

Escapes (\\n, \\(, \\), \\\\, octal \\ooo) are decoded; literal strings
only (hex <...> strings are rare for text and skipped).  Scope: simple
fonts with standard encodings — the overwhelming majority of text-
bearing machine-generated PDFs; CID/Type0 composite-font PDFs yield
whatever ASCII survives, never a crash.

The Spark face: operators/extract.py routes %PDF- payloads here before
the HTML wrap, emitting tier='pdf' rows through the same mapInPandas
batch as HTML turns.
"""

from __future__ import annotations

import re
import zlib
from typing import Union

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)
# literal string followed by a text-showing operator
_SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|'|\")"  # (s) Tj / ' / "
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ"  # [(a) -120 (b)] TJ
    rb"|(T\*|Td|TD)",  # line-positioning -> newline
    re.S,
)
_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def is_pdf(payload: Union[bytes, str, None]) -> bool:
    if isinstance(payload, bytes):
        return payload[:5] == PDF_MAGIC
    if isinstance(payload, str):
        return payload[:5] == "%PDF-"
    return False


def _decode_pdf_string(raw: bytes) -> str:
    "Decode a literal-string body: escapes, octal, line continuations."
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        b = raw[i : i + 1]
        if b == b"\\" and i + 1 < n:
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
                continue
            nxt = raw[i + 1 : i + 2]
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and raw[i : i + 1] == b"\n":
                    i += 1
                continue
            out.extend(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.extend(b)
        i += 1
    # PDFDocEncoding is latin-1-compatible in the printable range
    return out.decode("latin-1", errors="replace")


def _text_of_block(block: bytes) -> str:
    parts: list = []
    for m in _SHOW_RE.finditer(block):
        if m.group(1) is not None:  # (s) Tj / ' / "
            if m.group(2) in (b"'", b'"') and parts and parts[-1] != "\n":
                parts.append("\n")
            parts.append(_decode_pdf_string(m.group(1)))
        elif m.group(3) is not None:  # [(..) .. (..)] TJ
            parts.append(
                "".join(_decode_pdf_string(s.group(1)) for s in _ARRAY_STR_RE.finditer(m.group(3)))
            )
        else:  # Td / TD / T*
            if parts and parts[-1] != "\n":
                parts.append("\n")
    return "".join(parts)


def extract_pdf_text(payload: Union[bytes, str]) -> str:
    """All recoverable text of a PDF, BT..ET blocks in document order,
    one line per line-positioning operator, blocks separated by
    newlines.  Never raises on malformed input — returns ''."""
    data = payload.encode("latin-1", errors="replace") if isinstance(payload, str) else payload
    lines: list = []
    try:
        for sm in _STREAM_RE.finditer(data):
            raw = sm.group(1)
            try:
                content = zlib.decompress(raw)  # FlateDecode
            except zlib.error:
                content = raw  # uncompressed content stream
            for bm in _BT_ET_RE.finditer(content):
                text = _text_of_block(bm.group(1))
                if text.strip():
                    lines.append(text.strip())
    except Exception:
        return ""
    return "\n".join(lines)
