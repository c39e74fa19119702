"""Codec invariants: render/decode are exact inverses; corpus is faithful."""

from __future__ import annotations

import numpy as np
import pytest

from studiocr_spark.functions.glyphs import (
    decode_page_text,
    page_image_to_data,
    render_page,
)
from studiocr_spark.functions.png import decode_png, encode_png
from studiocr_spark.gen import make_doc
from studiocr_spark.sources.decode import (
    bitmap_decode,
    pack_mpdf,
    sniff_kind,
    unpack_mpdf,
)


def test_png_roundtrip():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(33, 57), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@pytest.mark.parametrize(
    "text",
    [
        "This is a test sentence",
        "cat concatenate catalog",
        "x" * 85,
        "",
        "a  b",
        "(nested) O'Brien e.g. 100% [42]",
        " leading and trailing ",
    ],
)
def test_text_roundtrip(text):
    assert decode_page_text(render_page(text)) == text


def test_image_to_data_shape():
    d = page_image_to_data(render_page("cat dog"))
    assert set(d) == {"left", "top", "width", "height", "conf", "text"}
    # structural rows: one page + one line, conf=-1, text=''
    assert d["text"][:2] == ["", ""] and d["conf"][:2] == [-1, -1]
    assert d["text"][2:] == ["cat", "dog"]
    assert all(0 <= c <= 100 for c in d["conf"][2:])


def test_mpdf_container():
    pages = [render_page("one"), render_page("two three")]
    blob = pack_mpdf(pages)
    assert sniff_kind(blob) == "mpdf"
    assert unpack_mpdf(blob) == pages


def test_corpus_docs_invertible():
    n_multi = 0
    for i in range(200):
        doc = make_doc(i)
        decoded = bitmap_decode(doc["html"])
        n_multi += len(decoded) > 1
        joined = " ".join(t for _png, _d, t in decoded)
        assert joined == doc["text"]
    assert n_multi > 5  # the multi-page path is exercised


def test_tesseract_backend_param_validation():
    """F3: oem/psm domain checks fire before the native-lib import gate."""
    import pytest as _pytest

    from studiocr_spark.sources.decode import tesseract_decode

    with _pytest.raises(ValueError, match="oem"):
        tesseract_decode(b"\x89PNG....", oem=4)
    with _pytest.raises(ValueError, match="psm"):
        tesseract_decode(b"\x89PNG....", psm=2)
    # valid params in this sandbox -> clear NotImplementedError
    with _pytest.raises(NotImplementedError, match="bitmap"):
        tesseract_decode(b"\x89PNG....", oem=3, psm=3)
