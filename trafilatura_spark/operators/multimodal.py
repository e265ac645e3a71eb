"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride along as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
batch functions over mapInPandas.  The decode step is STUBBED in this
container (no image/audio libraries available) behind a deterministic
fake — the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested:

- `attach_media_meta`: JVM-side metadata sniffing (magic numbers via
  built-in functions on the binary column — no Python).
- `media_features`: mapInPandas batch op producing fixed-width feature
  vectors.  Swap `_decode_stub` for a real decoder (PIL/ffmpeg) on a
  cluster that has one; the dataflow is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("n_bytes", IntegerType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

# magic-number prefixes, hex-encoded (JVM-side sniffing, no Python)
_MAGIC = {
    "png": "89504e47",
    "jpeg": "ffd8ff",
    "gif": "474946",
    "riff": "52494646",  # wav/webp container
    "mp4": "66747970",  # 'ftyp' at offset 4; checked separately
}


def attach_media_meta(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    "Sniff container format and size from the binary column, JVM-side."
    hexhead = F.lower(F.hex(F.substring(F.col(bin_col), 1, 8)))
    fmt = (
        F.when(hexhead.startswith(_MAGIC["png"]), "png")
        .when(hexhead.startswith(_MAGIC["jpeg"]), "jpeg")
        .when(hexhead.startswith(_MAGIC["gif"]), "gif")
        .when(hexhead.startswith(_MAGIC["riff"]), "riff")
        .when(F.substring(hexhead, 9, 8) == _MAGIC["mp4"], "mp4")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        F.col(bin_col),
        fmt.alias("format"),
        F.length(bin_col).cast("int").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: a real deployment replaces this with
    PIL.Image.open / soundfile / ffmpeg frame sampling.  The stub derives
    a stable FEATURE_DIM float vector from the payload digest so the
    distributed plumbing is fully exercisable and testable."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def decode_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    "Placeholder for the real decode path; libraries absent in this container."
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg/soundfile, not present in this environment; "
        "see _decode_stub for the deterministic stand-in"
    )


def make_feature_batch_fn(id_col: str = "media_id", bin_col: str = "payload"):
    def feature_batch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            feats = [_decode_stub(p).tolist() for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "format": pdf["format"].values if "format" in pdf else None,
                    "feature": feats,
                }
            )

    return feature_batch


def media_features(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """Binary payloads -> feature vectors via Arrow batches.  Upstream
    metadata sniffing stays JVM-side; only the (stubbed) decode crosses
    into Python, batched."""
    with_meta = attach_media_meta(df, id_col, bin_col)
    fn = make_feature_batch_fn(id_col, bin_col)
    return with_meta.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: derives a width*height byte grid from
    the payload digest (a real deployment decodes with PIL and re-encodes
    at the target size).  Byte-level plumbing — binary in, binary out —
    is what the Spark dataflow needs to be real for."""
    digest = hashlib.sha256(payload or b"")
    out = bytearray()
    counter = 0
    while len(out) < width * height:
        block = hashlib.sha256(digest.digest() + counter.to_bytes(4, "big")).digest()
        out.extend(block)
        counter += 1
    return bytes(out[: width * height])


def media_resize(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    id_col: str = "media_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Resize operator plumbing: binary payload in, resized binary payload
    out, metadata carried through.  Decode/re-encode is stubbed (no PIL
    in this container) — swap _resize_stub for a real resampler; schema,
    batching and partitioning are unchanged."""
    with_meta = attach_media_meta(df, id_col, bin_col)

    def resize_batch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "format": pdf["format"].values,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "payload": [_resize_stub(p, width, height) for p in pdf[bin_col]],
                }
            )

    return with_meta.mapInPandas(resize_batch, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_feature", ArrayType(FloatType()), False),
    ]
)


def video_frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one input video row fans out to
    ``n_frames`` output rows (the 1->N batch shape ffmpeg sampling
    needs).  Frame decode is stubbed deterministically per
    (payload, frame_idx); a real deployment replaces the stub with
    ffmpeg keyframe extraction — the mapInPandas contract is identical."""

    def frame_batch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            ids, idxs, feats = [], [], []
            for media_id, payload in zip(pdf[id_col], pdf[bin_col]):
                for f in range(n_frames):
                    ids.append(media_id)
                    idxs.append(f)
                    feats.append(_decode_stub((payload or b"") + f.to_bytes(4, "big")).tolist())
            yield pd.DataFrame({"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_feature": feats})

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(frame_batch, schema=FRAME_SCHEMA)


DIMENSIONS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("dim_source", StringType(), True),
    ]
)


def _be32(bin_col, pos: int):
    "Big-endian uint32 at 1-based byte offset, JVM-side."
    return F.conv(F.hex(F.substring(bin_col, pos, 4)), 16, 10).cast("int")


def _le16(bin_col, pos: int):
    "Little-endian uint16 at 1-based byte offset, JVM-side (byte swap)."
    return F.conv(
        F.concat(F.hex(F.substring(bin_col, pos + 1, 1)), F.hex(F.substring(bin_col, pos, 1))),
        16, 10,
    ).cast("int")


def jpeg_dimensions(payload: bytes):
    """REAL JPEG dimension parse (no image library): walk the segment
    stream to the first SOF0/1/2 frame header and read height/width
    (big-endian at +5/+7 inside the segment).  Returns (w, h) or None —
    never raises."""
    try:
        if not payload or payload[:2] != b"\xff\xd8":
            return None
        i, n = 2, len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1  # fill byte: 0xFF padding before a marker (B.1.1.2)
                continue
            if marker == 0xD9:
                return None  # EOI before any SOF frame header
            if marker in (0xC0, 0xC1, 0xC2):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return (w, h) if w and h else None
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # parameterless markers
                continue
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seglen < 2:
                return None
            i += 2 + seglen
        return None
    except Exception:
        return None


def wav_duration(payload: bytes):
    """REAL RIFF/WAVE duration parse (no audio library): walk the chunk
    list for 'fmt ' (byte rate) and 'data' (payload size); duration =
    data_size / byte_rate.  Returns seconds or None — never raises."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        i, n = 12, len(payload)
        byte_rate = data_size = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            size = int.from_bytes(payload[i + 4 : i + 8], "little")
            # byte_rate is read from payload[i+16:i+20], so the file must
            # reach i+20 (and the fmt chunk itself must declare >= 12
            # bytes) — a truncated fmt chunk otherwise yields a short
            # slice, a tiny bogus byte_rate, and a huge wrong duration
            if cid == b"fmt " and i + 20 <= n and size >= 12:
                byte_rate = int.from_bytes(payload[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = size
            if byte_rate and data_size is not None:
                break
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if not byte_rate or data_size is None:
            return None
        return data_size / byte_rate
    except Exception:
        return None


def mp4_duration(payload: bytes):
    """REAL ISO-BMFF duration parse: walk top-level boxes to 'moov', then
    its children to 'mvhd'; duration = mvhd.duration / mvhd.timescale
    (version 0: 32-bit fields, version 1: 64-bit).  Returns seconds or
    None — never raises."""

    def boxes(buf, i, end):
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            btype = buf[i + 4 : i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                body = i + 16
            else:
                body = i + 8
            if size < 8 or i + size > end:
                return
            yield btype, body, i + size
            i += size

    try:
        if len(payload) < 16 or payload[4:8] != b"ftyp":
            return None
        for btype, body, bend in boxes(payload, 0, len(payload)):
            if btype != b"moov":
                continue
            for ctype, cbody, _ in boxes(payload, body, bend):
                if ctype != b"mvhd":
                    continue
                version = payload[cbody]
                if version == 1:
                    timescale = int.from_bytes(payload[cbody + 20 : cbody + 24], "big")
                    duration = int.from_bytes(payload[cbody + 24 : cbody + 32], "big")
                else:
                    timescale = int.from_bytes(payload[cbody + 12 : cbody + 16], "big")
                    duration = int.from_bytes(payload[cbody + 16 : cbody + 20], "big")
                if not timescale:
                    return None
                return duration / timescale
        return None
    except Exception:
        return None


DURATION_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("duration_s", FloatType(), True),
        StructField("duration_source", StringType(), True),
    ]
)


def media_durations(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """Audio/video duration per payload — REAL container-header parsing,
    no decode (the same dataflow discipline as image_dimensions): RIFF
    chunk walks and ISO-BMFF box walks need a scan, so riff/mp4 rows go
    through ONE Arrow batch pass; every other format never leaves the
    JVM (NULL projection).  At 100 TB the Python crossing reads only
    (id, payload) of the audio/video-classified rows."""
    base = attach_media_meta(df, id_col, bin_col)

    def batch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            durs = [
                wav_duration(p) if fmt == "riff" else mp4_duration(p)
                for p, fmt in zip(pdf[bin_col], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "format": pdf["format"],
                    "duration_s": pd.array(
                        [round(d, 6) if d is not None else None for d in durs],
                        dtype="Float32",
                    ),
                    "duration_source": "container-header",
                }
            )

    av = (
        base.filter(F.col("format").isin("riff", "mp4"))
        .select(id_col, bin_col, "format")
        .mapInPandas(batch, schema=DURATION_SCHEMA)
    )
    other = base.filter(~F.col("format").isin("riff", "mp4")).select(
        F.col(id_col),
        "format",
        F.lit(None).cast("float").alias("duration_s"),
        F.lit(None).cast("string").alias("duration_source"),
    )
    return av.unionByName(other)


def image_dimensions(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """Width/height per image payload — real header parsing, no decode:

    - PNG: IHDR width/height, big-endian at fixed offsets -> pure
      JVM-side substring/hex/conv (whole-stage codegen, no Python).
    - GIF: logical-screen dims, little-endian uint16 -> JVM-side.
    - JPEG: variable segment offsets need a scan -> a REAL stdlib parser
      (jpeg_dimensions) over Arrow batches, applied ONLY to jpeg rows.

    At 100 TB the jpeg branch is the only Python crossing and it reads
    just (id, payload) of jpeg-classified rows; png/gif never leave the
    JVM.  dim_source records which path produced the numbers."""
    base = attach_media_meta(df, id_col, bin_col)
    b = F.col(bin_col)
    png_gif = base.filter(F.col("format").isin("png", "gif")).select(
        F.col(id_col),
        "format",
        F.when(F.col("format") == "png", _be32(b, 17)).otherwise(_le16(b, 7)).alias("width"),
        F.when(F.col("format") == "png", _be32(b, 21)).otherwise(_le16(b, 9)).alias("height"),
        F.lit("jvm-header").alias("dim_source"),
    )

    def jpeg_batch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            dims = [jpeg_dimensions(p) for p in pdf[bin_col]]
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "format": "jpeg",
                    "width": pd.array([d[0] if d else None for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] if d else None for d in dims], dtype="Int32"),
                    "dim_source": "sof-scan",
                }
            )
            yield out

    jpeg = (
        base.filter(F.col("format") == "jpeg")
        .select(id_col, bin_col)
        .mapInPandas(jpeg_batch, schema=DIMENSIONS_SCHEMA)
    )
    other = base.filter(~F.col("format").isin("png", "gif", "jpeg")).select(
        F.col(id_col),
        "format",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("string").alias("dim_source"),
    )
    return png_gif.unionByName(jpeg).unionByName(other)
