"""Input loading: decode, repair, parse.

Semantics mirror /root/reference/trafilatura/utils.py:107-278
(decode_file, repair_faulty_html, load_html).  The graft's wrapping
convention (`<html><body>{turn}</body></html>`) means the dubious-HTML
rejection path is normally unreachable; it is kept for unwrapped input.
"""

from __future__ import annotations

import gzip
import re
import zlib
from typing import Any, Optional

from .dom import Element, parse_html

try:
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover
    _cn_from_bytes = None

DOCTYPE_TAG = re.compile("^< ?! ?DOCTYPE[^>]*/[^<>]*>", re.I)
FAULTY_HTML = re.compile(r"(<html.*?)\s*/>", re.I)
INVALID_XML_CHARS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f￾￿]")
UNICODE_ALIASES = {"utf-8", "utf_8"}


class UnsupportedCompression(ValueError):
    """Payload compressed with a codec this environment cannot decode
    (zstd/brotli libraries absent, no pip): raised so callers emit a
    LABELED discard (tier='unsupported_input') instead of parsing the
    compressed bytes as latin-1 soup."""


# zstandard frame magic, little-endian 0xFD2FB528 (reference utils.py:118
# delegates to the zstandard lib which checks the same frame header)
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def handle_compressed_file(filecontent: bytes) -> bytes:
    """Magic-number decompression cascade in the reference's order
    (utils.py:107-141: gzip -> zstd -> brotli -> zlib).  zstd and brotli
    bind the SYSTEM shared libraries via ctypes (kernel/cdecompress.py,
    no pip); when a library is absent, a zstd-magic payload is rejected
    as UnsupportedCompression (labeled discard beats a garbage parse)
    and brotli — which has no magic number — stays undetectable, exactly
    the reference's HAS_* degradation."""
    if not isinstance(filecontent, bytes):
        return filecontent
    from .cdecompress import HAS_BROTLI, HAS_ZSTD, brotli_decompress, zstd_decompress

    if filecontent[:3] == b"\x1f\x8b\x08":
        try:
            return gzip.decompress(filecontent)
        except Exception:
            pass
    if filecontent[:4] == ZSTD_MAGIC:
        if not HAS_ZSTD:
            raise UnsupportedCompression("zstd")
        try:
            return zstd_decompress(filecontent)
        except (ValueError, RuntimeError):
            pass  # invalid frame despite the magic: fall through as-is
    if HAS_BROTLI:
        try:
            return brotli_decompress(filecontent)
        except (ValueError, RuntimeError):
            pass
    try:
        return zlib.decompress(filecontent)
    except zlib.error:
        pass
    return filecontent


def isutf8(data: bytes) -> bool:
    try:
        data.decode("UTF-8")
    except UnicodeDecodeError:
        return False
    return True


def detect_encoding(bytesobject: bytes) -> list:
    "utf-8 test then charset_normalizer on first/last 5KB (utils.py:153-174)."
    if isutf8(bytesobject):
        return ["utf-8"]
    guesses: list = []
    if _cn_from_bytes is not None:
        if len(bytesobject) < 10000:
            detection_results = _cn_from_bytes(bytesobject)
        else:
            detection_results = _cn_from_bytes(bytesobject[:5000] + bytesobject[-5000:]) or _cn_from_bytes(
                bytesobject
            )
        if len(detection_results) > 0:
            guesses.extend([r.encoding for r in detection_results])
    return [g for g in guesses if g not in UNICODE_ALIASES]


def decode_file(filecontent) -> str:
    "Decompress if needed and decode to str (utils.py:177-199)."
    if isinstance(filecontent, str):
        return filecontent
    htmltext = None
    filecontent = handle_compressed_file(filecontent)
    for guessed_encoding in detect_encoding(filecontent):
        try:
            htmltext = filecontent.decode(guessed_encoding)
        except (LookupError, UnicodeDecodeError):
            htmltext = None
        else:
            break
    return htmltext or str(filecontent, encoding="utf-8", errors="replace")


def repair_faulty_html(htmlstring: str, beginning: str) -> str:
    "Strip invalid XML chars, fix doctype and '<html ... />' (utils.py:207-221)."
    htmlstring = INVALID_XML_CHARS.sub("", htmlstring)
    if "doctype" in beginning:
        firstline, _, rest = htmlstring.partition("\n")
        htmlstring = DOCTYPE_TAG.sub("", firstline, count=1) + "\n" + rest
    for i, line in enumerate(htmlstring.splitlines()):
        if "<html" in line and line.endswith("/>"):
            htmlstring = FAULTY_HTML.sub(r"\1>", htmlstring, count=1)
            break
        if i > 2:
            break
    return htmlstring


def load_html(htmlobject: Any) -> Optional[Element]:
    "Load and validate input (utils.py:234-278)."
    if isinstance(htmlobject, Element):
        return htmlobject
    # response-like objects exposing .data are unwrapped (utils.py:241-243)
    if hasattr(htmlobject, "data") and isinstance(getattr(htmlobject, "data"), (bytes, str)):
        htmlobject = htmlobject.data
    if not isinstance(htmlobject, (bytes, str)):
        raise TypeError("incompatible input type", type(htmlobject))
    htmlobject = decode_file(htmlobject)
    beginning = htmlobject[:50].lower()
    check_flag = "html" not in beginning
    htmlobject = repair_faulty_html(htmlobject, beginning)
    tree = parse_html(htmlobject)
    if tree is not None and check_flag:
        body = tree.find("body")
        if body is None or len(body) < 2:
            tree = None
    return tree
