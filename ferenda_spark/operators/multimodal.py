"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (driver mandate: training-data pipeline ops).

The container has no image/audio libraries, so the *decode* kernel is
stubbed (clearly marked) behind :func:`decode_bytes`: the default is a
deterministic fake derived from the raw bytes, and ``real=True`` raises
``NotImplementedError``.  Everything Spark-side — schema, Arrow batch
shape, ``mapInPandas`` plumbing, explode of variable-length frame
samples — is real and tested, which is the part that must survive a
100 TB media corpus:

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


def decode_bytes(b: bytes, real: bool = False) -> dict:
    """STUB decode kernel.  ``real=True`` is the production path
    (PIL/ffmpeg) and is intentionally unimplemented in this container;
    the fake is a deterministic pure function of the bytes so the
    DuckDB oracle can verify the full distributed plumbing."""
    if real:
        raise NotImplementedError(
            "real image/av decode needs pillow/ffmpeg (not in container); "
            "swap decode_bytes(real=True) in when available")
    n = len(b)
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


def image_meta(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, n_pixels, format, n_bytes) via
    mapInPandas over Arrow batches of the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_bytes(b) for b in pdf["content"]]
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
