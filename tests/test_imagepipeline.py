"""U9 composable image pipeline + S7 export + grid-search eval."""

from __future__ import annotations

import numpy as np
import pytest

from studiocr_spark.functions.imagepipeline import (
    BUILTIN_STEPS,
    ImagePipeline,
    apply_pipeline,
    flat_field,
    invert,
    pipeline_from_config,
    threshold,
)
from studiocr_spark.functions.png import decode_png, encode_png


def test_pipeline_step_chain_and_capture_index():
    img = np.full((8, 8), 100, dtype=np.uint8)
    p = (
        ImagePipeline()
        .add_step("invert", invert)
        .add_step("threshold", threshold, {"thresh": 128}, capture_index=1)
    )
    out = p.run(img)
    # invert(100) = 155 > 128 -> 255
    assert (out == 255).all()
    assert p.step_names == ["invert", "threshold"]


def test_pipeline_rejects_non_ndarray():
    p = ImagePipeline().add_step("bad", lambda img: "nope")
    with pytest.raises(TypeError):
        p.run(np.zeros((2, 2), dtype=np.uint8))


def test_partial_run_until():
    """ImagePipeline.py:102-115 run(until=) — stop mid-chain."""
    img = np.full((4, 4), 100, dtype=np.uint8)
    p = (
        ImagePipeline()
        .add_step("invert", invert)
        .add_step("threshold", threshold, {"thresh": 128}, capture_index=1)
    )
    assert (p.run(img, until=0) == 100).all()  # no steps
    assert (p.run(img, until=1) == 155).all()  # invert only
    assert (p.run(img, until=2) == 255).all()  # full chain
    with pytest.raises(IndexError):
        p.run(img, until=3)
    with pytest.raises(IndexError):
        p.run(img, until=-1)


def test_copy_steps_slice_and_clear():
    """ImagePipeline.py:50-77 copy_steps + :38-48 size/clear."""
    src = (
        ImagePipeline()
        .add_step("invert", invert)
        .add_step("threshold", threshold, {"thresh": 128}, capture_index=1)
        .add_step("flat_field", flat_field)
    )
    dst = ImagePipeline().copy_steps(src, start=0, end=2)
    assert dst.step_names == ["invert", "threshold"]
    assert dst.size() == 2
    # end=None copies to the end (fixed vs the reference's TypeError)
    assert ImagePipeline().copy_steps(src).step_names == src.step_names
    with pytest.raises(ValueError):
        ImagePipeline().copy_steps(src, start=0, end=4)
    dst.clear()
    assert dst.size() == 0 and dst.step_names == []


class _Wrapped:
    """Stand-in for the reference's PIL object (ImagePipeline.py:133-140):
    wraps an array and exposes image methods by name."""

    def __init__(self, img):
        self.img = img

    def inverted(self):
        return 255 - self.img

    def scaled(self, factor=2):
        return (self.img.astype(np.int64) * factor).clip(0, 255).astype(
            np.uint8
        )


def test_method_dispatch_step():
    img = np.full((4, 4), 60, dtype=np.uint8)
    p = (
        ImagePipeline()
        .add_step("scale", "scaled", {"factor": 3}, outer=_Wrapped)
        .add_step("invert", "inverted", outer=_Wrapped)
    )
    assert (p.run(img) == 255 - 180).all()
    with pytest.raises(TypeError):
        ImagePipeline().add_step("bad", "scaled")  # string needs outer
    with pytest.raises(TypeError):
        ImagePipeline().add_step("bad", invert, outer=_Wrapped)


def test_flat_field_uniform_image_stays_uniform():
    img = np.full((16, 16), 120, dtype=np.uint8)
    out = flat_field(img, ksize=3)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - 120).max() <= 1


def test_config_driven_assembly():
    p = pipeline_from_config(
        [{"step": "invert"}, {"step": "threshold", "thresh": 200}]
    )
    assert p.step_names == ["invert", "threshold"]
    out = p.run(np.zeros((4, 4), dtype=np.uint8))
    assert (out == 255).all()  # invert(0)=255 > 200
    assert set(BUILTIN_STEPS) == {"invert", "threshold", "flat_field"}


def test_apply_pipeline_operator(spark):
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [("u", 0, bytearray(encode_png(img))), ("u", 1, None)],
        "url string, page_no int, image binary",
    )
    out = {
        r.page_no: r.image
        for r in apply_pipeline(df, [{"step": "invert"}]).collect()
    }
    assert (decode_png(bytes(out[0])) == 255 - img).all()
    assert out[1] is None


def test_export_document(spark, extracted):
    from studiocr_spark.operators.export import export_document
    from studiocr_spark.sources.decode import sniff_kind, unpack_mpdf

    _, ocr_pages, _ = extracted
    url = (
        ocr_pages.groupBy("url").count().filter("count > 1").first().url
    )
    blob = export_document(ocr_pages.select("url", "page_no", "image"), url)
    assert sniff_kind(blob) == "mpdf"
    n_pages = ocr_pages.filter(f"url = '{url}'").count()
    assert len(unpack_mpdf(blob)) == n_pages
    with pytest.raises(ValueError):
        export_document(ocr_pages, "https://nonexistent/")


def test_grid_search_eval(spark, pages_df):
    from studiocr_spark.operators.export import grid_search_eval

    out = grid_search_eval(
        spark,
        pages_df.limit(30),
        [{"name": "bitmap_default", "backend": "bitmap"}],
        tol=0,
    )
    rows = out.collect()
    assert len(rows) == 1
    # bitmap decode is exact -> every predicted word matches expected
    assert rows[0].mean_score >= 1.0
