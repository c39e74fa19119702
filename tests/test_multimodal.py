"""Multimodal binary-column plumbing: metadata, frames, features, stubs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from studiocr_spark.functions.glyphs import render_page
from studiocr_spark.functions.png import decode_png
from studiocr_spark.operators.multimodal import (
    extract_features,
    media_metadata,
    resize_images,
    sample_frames,
)
from studiocr_spark.sources.decode import pack_mpdf


@pytest.fixture(scope="module")
def media_df(spark):
    png1 = render_page("hello world")
    png2 = render_page("short")
    rows = [
        ("u_png", bytearray(png1)),
        ("u_mpdf", bytearray(pack_mpdf([png1, png2, png2]))),
        ("u_bad", bytearray(b"\x00\x01garbage")),
        ("u_null", None),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_media_metadata(media_df):
    got = {r.url: r for r in media_metadata(media_df).collect()}
    png1 = render_page("hello world")
    h, w = decode_png(png1).shape
    assert got["u_png"].kind == "png"
    assert (got["u_png"].width, got["u_png"].height) == (w, h)
    assert got["u_png"].n_frames == 1
    assert got["u_png"].content_md5 == hashlib.md5(png1).hexdigest()
    assert got["u_mpdf"].kind == "mpdf" and got["u_mpdf"].n_frames == 3
    assert got["u_bad"].kind == "unknown" and got["u_bad"].width is None
    assert got["u_null"].kind is None


def test_sample_frames(media_df):
    frames = sample_frames(media_df.filter("html is not null"), every=2)
    got = {(r.url, r.frame_no) for r in frames.collect()}
    # mpdf has frames 0,1,2 -> keep 0 and 2; singles keep frame 0
    assert got == {("u_png", 0), ("u_mpdf", 0), ("u_mpdf", 2), ("u_bad", 0)}


def test_extract_features_stub_gating(media_df):
    with pytest.raises(NotImplementedError):
        extract_features(media_df)  # no codec, no fake allowed
    feats = extract_features(media_df, dim=8, allow_fake=True)
    rows = {r.url: r.feature for r in feats.collect()}
    assert rows["u_null"] is None
    assert len(rows["u_png"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows["u_png"])
    # deterministic
    again = {
        r.url: r.feature
        for r in extract_features(media_df, dim=8, allow_fake=True).collect()
    }
    assert again == rows


def test_resize_stub(media_df):
    with pytest.raises(NotImplementedError):
        resize_images(media_df, 32, 32)
