"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (driver mandate: training-data pipeline ops).

:func:`decode_bytes` has two paths.  ``real=True`` parses actual image
headers — a dependency-free JPEG SOFn / PNG IHDR reader covering the
two dominant web-image formats (no pillow needed); other formats and
AV streams raise ``NotImplementedError`` (the container has no
ffmpeg — that residue is the one declared stub).  The default path is
a deterministic fake derived from the raw bytes so the plumbing can be
oracle-verified independently of decode.  Everything Spark-side —
schema, Arrow batch shape, ``mapInPandas`` plumbing, explode of
variable-length frame samples — is real and tested, which is the part
that must survive a 100 TB media corpus:

* the binary column never leaves the JVM except through Arrow batches
  (``mapInPandas``, bounded by ``maxRecordsPerBatch``);
* decode output is a fixed narrow schema so downstream stages prune the
  (huge) blob column immediately;
* frame sampling emits one row per frame from inside the same Arrow
  batch pass (UDTF shape) — no driver-side loop, no collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = ("doc_id long, width int, height int, n_pixels long, "
                     "format string, n_bytes long")
FRAME_SCHEMA = ("doc_id long, frame_idx int, frame_ts double, "
                "frame_md5 string")


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# SOF markers carrying frame dimensions: C0-CF except C4 (DHT),
# C8 (JPG extension) and CC (DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _png_dims(b: bytes):
    """Width/height from the IHDR chunk (PNG spec: IHDR MUST be the
    first chunk, at offset 8; width/height are the first 8 IHDR
    bytes, big-endian)."""
    if len(b) < 24 or b[12:16] != b"IHDR":
        return None
    return (int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"))


def _jpeg_dims(b: bytes):
    """Walk JPEG marker segments from SOI to the first SOFn and read
    the frame height/width (big-endian, after the 1-byte precision)."""
    i, n = 2, len(b)
    while i + 3 < n:
        if b[i] != 0xFF:          # not a marker — corrupt stream
            return None
        marker = b[i + 1]
        if marker == 0xFF:        # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2                # standalone markers, no length
            continue
        if marker == 0xD9:        # EOI before any SOF
            return None
        seglen = int.from_bytes(b[i + 2:i + 4], "big")
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            return (int.from_bytes(b[i + 7:i + 9], "big"),
                    int.from_bytes(b[i + 5:i + 7], "big"))
        i += 2 + seglen
    return None


def decode_bytes(b: bytes, real: bool = False) -> dict:
    """Decode kernel.  ``real=True`` parses actual image headers with
    a dependency-free JPEG SOFn / PNG IHDR reader (covers the two
    dominant web-image formats; no pillow needed).  Other formats and
    AV streams still raise — that residue is the declared stub (the
    container has no ffmpeg).  ``real=False`` keeps the deterministic
    fake used by the plumbing oracle."""
    n = len(b)
    if real:
        if b[:8] == PNG_MAGIC:
            dims = _png_dims(b)
            if dims:
                return {"width": dims[0], "height": dims[1],
                        "format": "image/png", "n_bytes": n}
        elif b[:2] == b"\xff\xd8":
            dims = _jpeg_dims(b)
            if dims:
                return {"width": dims[0], "height": dims[1],
                        "format": "image/jpeg", "n_bytes": n}
        raise NotImplementedError(
            "real decode implemented for JPEG/PNG headers only; other "
            "formats and AV need pillow/ffmpeg (not in container)")
    first = b[0] if n else 0
    return {"width": 16 + (n % 240),
            "height": 16 + ((first * 7) % 240),
            "format": "stub/raw",
            "n_bytes": n}


def with_blob(documents: DataFrame) -> DataFrame:
    """Stand-in media table: treat the utf-8 text bytes as an opaque
    blob (same shape as a real (id, content binary) media table)."""
    return documents.select(
        "doc_id", F.col("text").cast("binary").alias("content"))


def synth_image_blobs(documents: DataFrame) -> DataFrame:
    """Valid minimal PNG/JPEG byte streams built entirely JVM-side
    (concat of binary literals + unhex'd big-endian dims) — the
    closed-form corpus for the real decode path.  Even doc_ids get a
    33-byte PNG (sig + IHDR), odd get a 17-byte JPEG (SOI + SOF0 with
    one component + EOI); dims are pure functions of doc_id that the
    DuckDB oracle recomputes."""
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))   # noqa: E731
    be16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))   # noqa: E731
    d = F.col("doc_id")
    png_w, png_h = 16 + d % 240, 16 + (d * 7) % 240
    jpg_w, jpg_h = 8 + d % 500, 8 + (d * 3) % 300
    png = F.concat(F.lit(PNG_MAGIC), F.lit(b"\x00\x00\x00\x0dIHDR"),
                   be32(png_w), be32(png_h),
                   F.lit(b"\x08\x02\x00\x00\x00"),
                   F.lit(b"\x00\x00\x00\x00"))        # CRC unchecked
    jpg = F.concat(F.lit(b"\xff\xd8\xff\xc0\x00\x0b\x08"),
                   be16(jpg_h), be16(jpg_w),
                   F.lit(b"\x01\x01\x11\x00\xff\xd9"))
    return documents.select(
        "doc_id", F.when(d % 2 == 0, png).otherwise(jpg).alias("content"))


def image_meta(media: DataFrame, real: bool = False) -> DataFrame:
    """(doc_id, width, height, n_pixels, format, n_bytes) via
    mapInPandas over Arrow batches of the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_bytes(bytes(b), real=real)
                     for b in pdf["content"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_pixels"] = (out["width"].astype("int64")
                               * out["height"].astype("int64"))
            yield out[["doc_id", "width", "height", "n_pixels",
                       "format", "n_bytes"]]

    return media.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def sample_frames(media: DataFrame, fps: float = 2.0) -> DataFrame:
    """Frame-sampling UDTF shape: one input blob -> n_frames rows
    (n_frames = 1 + n_bytes % 4 in the stub), emitted from the same
    Arrow pass.  frame_md5 fingerprints the sampled "frame" slice."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(blob)
                n_frames = 1 + len(b) % 4
                for i in range(n_frames):
                    sl = b[i::n_frames][:64]
                    rows.append((int(doc_id), i, i / fps,
                                 hashlib.md5(sl).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "frame_ts", "frame_md5"])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
