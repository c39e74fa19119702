"""Composable image-pipeline framework (the reference's U9).

Rebuilds /root/reference/StudiOCR/ImagePipeline.py:78-145: an ordered
chain of named image-processing steps with per-step kwargs and
capture-index handling (a step may return a tuple; the configured index
selects the image). The Spark discipline: the WHOLE chain composes
inside ONE pandas UDF — never one UDF per step, which would re-serialize
the image through Arrow at every stage.

Steps are numpy functions (HxW uint8 grayscale in this engine; the
production cv2 chain plugs the same interface). Built-ins mirror the
reference's preprocessing inventory (U2 grayscale, U3 flat-field, U4
threshold — OcrEngine.py:63-78, ImageGridSearch.py:92-93) with
dependency-free implementations.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .png import decode_png, encode_png


class ImagePipeline:
    """Ordered, named steps over ndarray images (ImagePipeline.py:78-100)."""

    def __init__(self) -> None:
        self._steps: list[tuple[str, Callable, dict, int | None]] = []

    def add_step(
        self,
        name: str,
        fn: Callable,
        kwargs: dict | None = None,
        capture_index: int | None = None,
    ) -> "ImagePipeline":
        """Append a step; ``capture_index`` selects from tuple returns
        (the reference's tuple-return capture, ImagePipeline.py:102-145)."""
        self._steps.append((name, fn, kwargs or {}, capture_index))
        return self

    @property
    def step_names(self) -> list[str]:
        return [s[0] for s in self._steps]

    def run(self, img: np.ndarray) -> np.ndarray:
        out = img
        for name, fn, kwargs, capture in self._steps:
            result = fn(out, **kwargs)
            if capture is not None:
                result = result[capture]
            if not isinstance(result, np.ndarray):
                raise TypeError(f"step {name!r} did not produce an ndarray")
            out = result
        return out


# -- built-in steps (numpy-only mirrors of the reference chain) -------------

def invert(img: np.ndarray) -> np.ndarray:
    return 255 - img


def threshold(
    img: np.ndarray, thresh: int = 20, maxval: int = 255
) -> tuple[int, np.ndarray]:
    """Binary threshold; returns (thresh, image) like cv2.threshold
    (ImageGridSearch.py:92-93) — use capture_index=1."""
    return thresh, np.where(img > thresh, maxval, 0).astype(np.uint8)


def flat_field(img: np.ndarray, ksize: int = 9) -> np.ndarray:
    """Flat-field illumination correction (OcrEngine.py:63-72):
    ``img * mean(blur) / blur`` with divide-by-zero tolerated, using a
    box blur as the dependency-free stand-in for medianBlur."""
    pad = ksize // 2
    padded = np.pad(img.astype(np.float64), pad, mode="edge")
    # separable box blur
    c = np.cumsum(padded, axis=0)
    v = (np.vstack([c[ksize - 1 : ksize], c[ksize:] - c[:-ksize]])) / ksize
    c2 = np.cumsum(v, axis=1)
    blur = (
        np.hstack([c2[:, ksize - 1 : ksize], c2[:, ksize:] - c2[:, :-ksize]])
        / ksize
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        out = img * (blur.mean() / blur)
    return np.clip(np.nan_to_num(out, nan=255, posinf=255), 0, 255).astype(
        np.uint8
    )


BUILTIN_STEPS: dict[str, tuple[Callable, dict, int | None]] = {
    "invert": (invert, {}, None),
    "threshold": (threshold, {}, 1),
    "flat_field": (flat_field, {}, None),
}


def pipeline_from_config(config: list[dict]) -> ImagePipeline:
    """Config-driven assembly (the reference's preset system,
    EditDocWindow.py:391-411): [{"step": name, **kwargs}, ...]."""
    p = ImagePipeline()
    for entry in config:
        entry = dict(entry)
        name = entry.pop("step")
        fn, defaults, capture = BUILTIN_STEPS[name]
        p.add_step(name, fn, {**defaults, **entry}, capture)
    return p


PIPELINE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("image", T.BinaryType(), True),
    ]
)


def apply_pipeline(
    pages_df: DataFrame, config: list[dict], image_col: str = "image"
) -> DataFrame:
    """Run a configured pipeline over stored page images.

    One Arrow batch -> decode PNG -> full step chain -> re-encode, all in
    a single UDF invocation per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe = pipeline_from_config(config)
        for pdf in batches:
            rows = []
            for url, page_no, img in zip(
                pdf["url"], pdf["page_no"], pdf[image_col]
            ):
                if img is None:
                    rows.append((url, int(page_no), None))
                    continue
                out = pipe.run(decode_png(bytes(img)))
                rows.append((url, int(page_no), encode_png(out)))
            yield pd.DataFrame(rows, columns=PIPELINE_SCHEMA.fieldNames())

    return pages_df.select("url", "page_no", image_col).mapInPandas(
        run, PIPELINE_SCHEMA
    )
