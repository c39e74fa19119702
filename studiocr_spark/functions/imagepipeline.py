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
        self._steps: list[
            tuple[str, Callable | str, dict, int | None, Callable | None]
        ] = []

    def add_step(
        self,
        name: str,
        fn: Callable | str,
        kwargs: dict | None = None,
        capture_index: int | None = None,
        outer: Callable | None = None,
    ) -> "ImagePipeline":
        """Append a step; ``capture_index`` selects from tuple returns
        (the reference's tuple-return capture, ImagePipeline.py:102-145).

        ``fn`` may instead be a METHOD NAME (string) dispatched on the
        object returned by ``outer(img)`` — the reference's PIL branch
        (ImagePipeline.py:133-140): wrap the array, call the named
        method with ``kwargs``, convert the result back to ndarray.
        A string step requires ``outer`` and vice versa, mirroring the
        reference's add_step validation (ImagePipeline.py:90-96) —
        except we raise instead of print-and-return.
        """
        if isinstance(fn, str) != (outer is not None):
            raise TypeError(
                "a string step needs outer=<wrapper>; a callable forbids it"
            )
        self._steps.append((name, fn, kwargs or {}, capture_index, outer))
        return self

    @property
    def step_names(self) -> list[str]:
        return [s[0] for s in self._steps]

    def size(self) -> int:
        """Number of steps (ImagePipeline.py:38-40)."""
        return len(self._steps)

    def clear(self) -> None:
        """Erase all steps (ImagePipeline.py:46-48)."""
        self._steps = []

    def copy_steps(
        self,
        other: "ImagePipeline",
        start: int = 0,
        end: int | None = None,
    ) -> "ImagePipeline":
        """Replace this pipeline's steps with ``other``'s ``[start:end]``
        slice (ImagePipeline.py:50-77). Deliberate fix vs the reference:
        its ``end > size or end is None`` check raises TypeError for the
        documented default ``end=None`` — here ``None`` means
        copy-to-end, and out-of-range bounds raise instead of printing.
        """
        n = other.size()
        if end is None:
            end = n
        if not (0 <= start <= end <= n):
            raise ValueError(
                f"copy_steps slice [{start}:{end}] out of range for "
                f"pipeline of {n} steps"
            )
        self._steps = list(other._steps[start:end])
        return self

    def run(self, img: np.ndarray, until: int | None = None) -> np.ndarray:
        """Run the chain; ``until`` stops after that many steps — the
        reference's partial-run surface (ImagePipeline.py:102-115), with
        raise-instead-of-print on a bad index."""
        if until is not None and not (0 <= until <= len(self._steps)):
            raise IndexError(
                f"until={until} outside pipeline of {len(self._steps)} steps"
            )
        out = img
        stop = len(self._steps) if until is None else until
        for name, fn, kwargs, capture, outer in self._steps[:stop]:
            if outer is not None:
                result = getattr(outer(out), fn)(**kwargs)
            else:
                result = fn(out, **kwargs)
            if capture is not None:
                result = result[capture]
            if outer is not None and not isinstance(result, np.ndarray):
                # mirror the reference's np.asarray() after PIL steps
                result = np.asarray(result)
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
