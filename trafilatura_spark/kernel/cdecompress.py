"""zstd / brotli decompression via ctypes bindings to the SYSTEM shared
libraries (libzstd.so.1, libbrotlidec.so.1) — no pip packages.

The reference's handle_compressed_file (utils.py:107-141) delegates to
the `zstandard` and `brotli` wheels; neither is installable here, but
the underlying C libraries ship with the OS, so the same capability is
bound directly.  Everything degrades gracefully: when a library is
absent, HAS_ZSTD / HAS_BROTLI are False and the loader keeps its
labeled `unsupported_input` discard path.

Outputs are capped (default 256 MiB) so a decompression bomb inside a
crawled payload cannot OOM an executor — the cap raises ValueError,
which the loader treats as invalid input.

Compression counterparts (zstd_compress / brotli_compress) are bound
when the encoder libraries exist; production code never calls them —
they exist so tests can round-trip REAL frames instead of fixtures.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

_MAX_OUT_DEFAULT = 256 * 1024 * 1024
_CHUNK = 1 << 20


def _load(*names: str) -> Optional[ctypes.CDLL]:
    for name in names:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    found = ctypes.util.find_library(names[0].split(".")[0].replace("lib", ""))
    if found:
        try:
            return ctypes.CDLL(found)
        except OSError:
            pass
    return None


# --- zstd --------------------------------------------------------------------

class _ZstdInBuffer(ctypes.Structure):
    _fields_ = [("src", ctypes.c_void_p), ("size", ctypes.c_size_t), ("pos", ctypes.c_size_t)]


class _ZstdOutBuffer(ctypes.Structure):
    _fields_ = [("dst", ctypes.c_void_p), ("size", ctypes.c_size_t), ("pos", ctypes.c_size_t)]


_zstd = _load("libzstd.so.1", "libzstd.so")
if _zstd is not None:
    try:
        _zstd.ZSTD_createDCtx.restype = ctypes.c_void_p
        _zstd.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
        _zstd.ZSTD_decompressStream.restype = ctypes.c_size_t
        _zstd.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_ZstdOutBuffer),
            ctypes.POINTER(_ZstdInBuffer),
        ]
        _zstd.ZSTD_isError.restype = ctypes.c_uint
        _zstd.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _zstd.ZSTD_compressBound.restype = ctypes.c_size_t
        _zstd.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        _zstd.ZSTD_compress.restype = ctypes.c_size_t
        _zstd.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ]
    except AttributeError:
        _zstd = None

HAS_ZSTD = _zstd is not None


def zstd_decompress(data: bytes, max_out: int = _MAX_OUT_DEFAULT) -> bytes:
    "Streaming zstd decompression (handles unknown frame content size)."
    if _zstd is None:
        raise RuntimeError("libzstd not available")
    dctx = _zstd.ZSTD_createDCtx()
    if not dctx:
        raise RuntimeError("ZSTD_createDCtx failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        inbuf = _ZstdInBuffer(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        out = ctypes.create_string_buffer(_CHUNK)
        outbuf = _ZstdOutBuffer(ctypes.cast(out, ctypes.c_void_p), _CHUNK, 0)
        parts = []
        total = 0
        while True:
            outbuf.pos = 0
            ret = _zstd.ZSTD_decompressStream(
                dctx, ctypes.byref(outbuf), ctypes.byref(inbuf)
            )
            if _zstd.ZSTD_isError(ret):
                raise ValueError("invalid zstd frame")
            if outbuf.pos:
                total += outbuf.pos
                if total > max_out:
                    raise ValueError("zstd output exceeds cap")
                parts.append(out.raw[: outbuf.pos])
            if ret == 0 and inbuf.pos >= inbuf.size:
                break
            if outbuf.pos == 0 and inbuf.pos >= inbuf.size:
                # frame truncated: no progress possible
                raise ValueError("truncated zstd frame")
        return b"".join(parts)
    finally:
        _zstd.ZSTD_freeDCtx(dctx)


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    "One-shot zstd compression (tests only)."
    if _zstd is None:
        raise RuntimeError("libzstd not available")
    bound = _zstd.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    ret = _zstd.ZSTD_compress(ctypes.cast(dst, ctypes.c_void_p), bound, data, len(data), level)
    if _zstd.ZSTD_isError(ret):
        raise ValueError("zstd compression failed")
    return dst.raw[:ret]


# --- brotli ------------------------------------------------------------------

_brotli_dec = _load("libbrotlidec.so.1", "libbrotlidec.so")
if _brotli_dec is not None:
    try:
        _brotli_dec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        _brotli_dec.BrotliDecoderCreateInstance.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _brotli_dec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
        _brotli_dec.BrotliDecoderDecompressStream.restype = ctypes.c_int
        _brotli_dec.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
    except AttributeError:
        _brotli_dec = None

HAS_BROTLI = _brotli_dec is not None

_BROTLI_RESULT_ERROR = 0
_BROTLI_RESULT_SUCCESS = 1
_BROTLI_RESULT_NEEDS_MORE_INPUT = 2
_BROTLI_RESULT_NEEDS_MORE_OUTPUT = 3


def brotli_decompress(data: bytes, max_out: int = _MAX_OUT_DEFAULT) -> bytes:
    "Streaming brotli decompression; raises ValueError on invalid input."
    if _brotli_dec is None:
        raise RuntimeError("libbrotlidec not available")
    state = _brotli_dec.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise RuntimeError("BrotliDecoderCreateInstance failed")
    try:
        src = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(src, ctypes.POINTER(ctypes.c_ubyte))
        out = (ctypes.c_ubyte * _CHUNK)()
        total_out = ctypes.c_size_t(0)
        parts = []
        total = 0
        while True:
            avail_out = ctypes.c_size_t(_CHUNK)
            next_out = ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte))
            res = _brotli_dec.BrotliDecoderDecompressStream(
                state,
                ctypes.byref(avail_in),
                ctypes.byref(next_in),
                ctypes.byref(avail_out),
                ctypes.byref(next_out),
                ctypes.byref(total_out),
            )
            produced = _CHUNK - avail_out.value
            if produced:
                total += produced
                if total > max_out:
                    raise ValueError("brotli output exceeds cap")
                parts.append(bytes(out[:produced]))
            if res == _BROTLI_RESULT_SUCCESS:
                # Reference `brotli.decompress` rejects trailing garbage; the
                # loader probes brotli on EVERY non-gzip/zstd payload (no magic
                # bytes), so accepting a stream that ends before the input does
                # would silently replace a document whose prefix happens to be
                # a complete brotli stream with its decode.
                if avail_in.value != 0:
                    raise ValueError("brotli stream ends before input does")
                return b"".join(parts)
            if res == _BROTLI_RESULT_NEEDS_MORE_OUTPUT:
                continue
            # error, or needs-more-input on already-complete data
            raise ValueError("invalid brotli stream")
    finally:
        _brotli_dec.BrotliDecoderDestroyInstance(state)


_brotli_enc = _load("libbrotlienc.so.1", "libbrotlienc.so")
if _brotli_enc is not None:
    try:
        _brotli_enc.BrotliEncoderCompress.restype = ctypes.c_int
        _brotli_enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p,
        ]
    except AttributeError:
        _brotli_enc = None


def brotli_compress(data: bytes, quality: int = 5) -> bytes:
    "One-shot brotli compression (tests only)."
    if _brotli_enc is None:
        raise RuntimeError("libbrotlienc not available")
    enc_size = ctypes.c_size_t(len(data) + 1024)
    dst = ctypes.create_string_buffer(enc_size.value)
    ok = _brotli_enc.BrotliEncoderCompress(
        quality, 22, 0, len(data), data, ctypes.byref(enc_size),
        ctypes.cast(dst, ctypes.c_void_p),
    )
    if not ok:
        raise ValueError("brotli compression failed")
    return dst.raw[: enc_size.value]
