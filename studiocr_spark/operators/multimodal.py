"""Multimodal (image/audio/video) column operators.

Binary payloads are opaque ``binary`` columns with typed metadata structs;
all processing runs in Arrow-batched ``mapInPandas`` UDFs. The container
lacks image/audio codecs (no PIL/cv2/ffmpeg), so:

- REAL and tested: header metadata extraction (PNG IHDR / JPEG SOF / MPDF
  page count — pure struct parsing), deterministic content fingerprints,
  frame sampling over multi-page (video-like) containers, and the full
  Spark plumbing (schemas, batch shapes, partitioning).
- STUBBED: pixel decode / resize / spectrogram — gated behind import-try
  with a deterministic-fake fallback ONLY when explicitly requested
  (``allow_fake=True``), else ``NotImplementedError`` with a clear
  message. The UDF signatures and output schemas are the production
  contract.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..sources.decode import MPDF_MAGIC, sniff_kind, unpack_mpdf

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)


def _png_size(data: bytes) -> tuple[int, int]:
    w, h = _struct.unpack(">II", data[16:24])
    return w, h


def _jpeg_size(data: bytes) -> tuple[int, int] | None:
    pos = 2
    while pos + 9 < len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in range(0xC0, 0xC4) or marker in range(0xC5, 0xCC):
            h, w = _struct.unpack(">HH", data[pos + 5 : pos + 9])
            return w, h
        (seg_len,) = _struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + seg_len
    return None


def media_metadata(
    df: DataFrame, url_col: str = "url", bin_col: str = "html"
) -> DataFrame:
    """Typed metadata for binary media payloads (pure header parsing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[bin_col]):
                row = {
                    "url": url, "kind": None, "n_bytes": None, "width": None,
                    "height": None, "n_frames": None, "content_md5": None,
                }
                if data is not None:
                    b = bytes(data)
                    kind = sniff_kind(b)
                    row.update(
                        kind=kind,
                        n_bytes=len(b),
                        content_md5=hashlib.md5(b).hexdigest(),
                    )
                    try:
                        if kind == "png":
                            row["width"], row["height"] = _png_size(b)
                            row["n_frames"] = 1
                        elif kind == "jpeg":
                            size = _jpeg_size(b)
                            if size:
                                row["width"], row["height"] = size
                            row["n_frames"] = 1
                        elif kind == "mpdf":
                            pages = unpack_mpdf(b)
                            row["n_frames"] = len(pages)
                            if pages and pages[0][:4] == b"\x89PNG":
                                row["width"], row["height"] = _png_size(pages[0])
                    except Exception:
                        pass  # malformed header: metadata stays null
                rows.append(row)
            yield pd.DataFrame(rows, columns=MEDIA_META_SCHEMA.fieldNames())

    return df.select(url_col, bin_col).mapInPandas(run, MEDIA_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every: int = 2, url_col: str = "url", bin_col: str = "html"
) -> DataFrame:
    """1-row -> N-frames sampling over multi-page/video-like containers.

    Keeps every ``every``-th frame (frame 0 always). Single-frame
    payloads pass through as frame 0.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[bin_col]):
                if data is None:
                    continue
                b = bytes(data)
                frames = unpack_mpdf(b) if b[:4] == MPDF_MAGIC else [b]
                for i, fr in enumerate(frames):
                    if i % every == 0:
                        rows.append({"url": url, "frame_no": i, "frame": fr})
            yield pd.DataFrame(rows, columns=FRAME_SCHEMA.fieldNames())

    return df.select(url_col, bin_col).mapInPandas(run, FRAME_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(
    df: DataFrame,
    dim: int = 8,
    allow_fake: bool = False,
    url_col: str = "url",
    bin_col: str = "html",
) -> DataFrame:
    """Image feature extraction (embedding per payload).

    Production path decodes pixels and runs a vision model — both absent
    here, so without ``allow_fake`` this raises NotImplementedError at
    plan time. With ``allow_fake=True`` it emits a deterministic
    md5-derived pseudo-embedding: the Spark plumbing (Arrow batches,
    schema, partitioning) is the real, tested artifact.
    """
    try:
        import cv2  # noqa: F401

        have_decoder = True
    except ImportError:
        have_decoder = False
    if not have_decoder and not allow_fake:
        raise NotImplementedError(
            "pixel decode requires cv2/PIL (absent in this container); "
            "pass allow_fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[bin_col]):
                if data is None:
                    rows.append({"url": url, "feature": None})
                    continue
                digest = hashlib.md5(bytes(data)).digest()
                vec = (
                    np.frombuffer((digest * ((4 * dim) // 16 + 1))[: 4 * dim],
                                  dtype=np.uint32)
                    .astype(np.float32)
                )
                vec = vec / np.float32(2**32)
                rows.append({"url": url, "feature": vec.tolist()})
            yield pd.DataFrame(rows, columns=FEATURE_SCHEMA.fieldNames())

    return df.select(url_col, bin_col).mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — pixel codecs absent in this container; the
    production body is ``cv2.resize`` inside the same mapInPandas shape
    as :func:`extract_features`."""
    raise NotImplementedError(
        "resize requires an image codec (cv2/PIL), not present in this "
        "container; plumbing contract is FRAME_SCHEMA -> FRAME_SCHEMA"
    )
