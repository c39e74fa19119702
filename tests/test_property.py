"""Property-based invariants (hypothesis) for the codec + oracle quirks."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from studiocr_spark.functions.glyphs import (
    decode_page_text,
    page_image_to_data,
    render_page,
)
from studiocr_spark.functions.pagestats import compute_page_stats
from studiocr_spark.functions.png import decode_png, encode_png

from . import oracle

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=300,
)


@settings(max_examples=60, deadline=None)
@given(printable)
def test_render_decode_roundtrip(text):
    assert decode_page_text(render_page(text)) == text


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)
def test_png_roundtrip_any_shape(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(printable)
def test_image_to_data_words_reconstruct_text(text):
    """Non-structural rows are exactly the whitespace-split words."""
    data = page_image_to_data(render_page(text))
    words = [t for t, c in zip(data["text"], data["conf"]) if c >= 0]
    assert words == text.split()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=8,
            ),
            st.integers(min_value=-1, max_value=100),
        ),
        max_size=30,
    )
)
def test_pagestats_matches_oracle_on_arbitrary_arrays(rows):
    """Product page-stats == independent oracle transcription, including
    whitespace-only / empty-string quirk rows."""
    data = {
        "left": [i for i in range(len(rows))],
        "top": [0] * len(rows),
        "width": [1] * len(rows),
        "height": [1] * len(rows),
        "conf": [c for _, c in rows],
        "text": [t for t, _ in rows],
    }
    got = compute_page_stats(data)
    exp = oracle.page_stats(data)
    assert got["word_counts"] == exp["word_counts"]
    assert got["unique_texts"] == exp["unique_texts"]
    assert got["char_counts"] == exp["char_counts"]
    assert got["unique_chars"] == exp["unique_chars"]
    assert got["ascii_histogram"] == exp["ascii_histogram"]
    assert got["conf_by_text"] == exp["conf_by_text"]
    # blocks filter agrees too
    kept = oracle.kept_indexes(data["text"])
    assert [b["block_no"] for b in oracle.commit_blocks(data)] == kept


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.text(alphabet="abcde ", min_size=1, max_size=10), max_size=15),
    st.lists(st.text(alphabet="abcde ", min_size=1, max_size=10), max_size=15),
)
def test_zero_one_loss_properties(expected, predicted):
    expected = [w for w in expected if w.strip()] or ["a"]
    predicted = [w for w in predicted if w.strip()]
    score = oracle.zero_one_loss(expected, predicted, tol=1)
    assert score >= 0
    # score over predictions that ARE the expected set is >= 1 per element
    full = oracle.zero_one_loss(expected, list(set(expected)), tol=0)
    assert full == 1.0
