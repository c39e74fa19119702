"""Deterministic 5x7 glyph font + page renderer + invertible decoder.

This is the sandbox's tesseract stand-in: the corpus generator renders page
text into a glyph grid image; the decoder reads the grid back and emits a
pytesseract ``image_to_data``-shaped dict (parallel arrays left/top/width/
height/conf/text — the IR the reference consumes at
/root/reference/StudiOCR/OcrEngine.py:88-89, OcrPageData.py:20-23).

Glyph bitmaps are hash-derived (md5 of the codepoint), not human-legible —
what matters for the byte-identical-text contract is *invertibility*, which
is verified at import (all 95 printable-ASCII glyphs distinct, none blank).

Grid geometry: each char occupies a CELL_W x CELL_H cell holding a
GLYPH_W x GLYPH_H glyph; text is hard-wrapped at LINE_CHARS chars per row;
page margin MARGIN px. An all-zero cell is tail padding (space itself has a
non-blank glyph, so padding is unambiguous).

The decoder also emits tesseract-like *structural* rows (conf=-1, text='')
— one per page and one per line — because preserving them through the
reference's whitespace filter quirk (``''.isspace() is False`` keeps them;
OcrEngine.py:130-131) is part of the contract under test.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np

from .png import decode_png, encode_png

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = 6, 8  # 1px spacing right/bottom
LINE_CHARS = 40
MARGIN = 2
ASCII_LO, ASCII_HI = 32, 126

_WORD_RE = re.compile(r"\S+")


def _glyph(code: int) -> np.ndarray:
    """35-bit md5-derived GLYPH_H x GLYPH_W bitmap for one codepoint."""
    digest = hashlib.md5(b"studiocr-glyph-%d" % code).digest()
    bits = np.unpackbits(np.frombuffer(digest[:5], dtype=np.uint8))[
        : GLYPH_W * GLYPH_H
    ]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(np.uint8) * 255
    if not g.any():  # blank would collide with padding; cannot happen w/ md5
        g[0, 0] = 255
    return g


GLYPHS: dict[int, np.ndarray] = {
    c: _glyph(c) for c in range(ASCII_LO, ASCII_HI + 1)
}
_REVERSE: dict[bytes, int] = {g.tobytes(): c for c, g in GLYPHS.items()}
assert len(_REVERSE) == ASCII_HI - ASCII_LO + 1, "glyph collision"

# vectorized decode support: 40-bit packed key per glyph bit-pattern
# (packbits -> 5 bytes/cell, 8x less memory traffic than a uint64 lane
# per bit — the decode is memory-bandwidth-bound at high core counts)
_PACK_W = (GLYPH_W * GLYPH_H + 7) // 8
_BYTE_W = (np.uint64(256) ** np.arange(_PACK_W - 1, -1, -1, dtype=np.uint64))


def _pack_key(bits_flat: np.ndarray) -> np.ndarray:
    """(N, 35) boolean-ish -> (N,) uint64 packed keys."""
    packed = np.packbits(bits_flat, axis=1)  # (N, 5) big-endian bits
    return packed.astype(np.uint64) @ _BYTE_W


_REVERSE_INT: dict[int, str] = {
    int(_pack_key((g.reshape(1, -1) != 0).astype(np.uint8))[0]): chr(c)
    for c, g in GLYPHS.items()
}
assert len(_REVERSE_INT) == len(GLYPHS), "glyph int-key collision"


def _cell_keys(img: np.ndarray) -> np.ndarray:
    """All cell bit-pattern keys of a page image, row-major (vectorized)."""
    n_rows = (img.shape[0] - 2 * MARGIN) // CELL_H
    area = img[
        MARGIN : MARGIN + n_rows * CELL_H,
        MARGIN : MARGIN + LINE_CHARS * CELL_W,
    ]
    cells = (
        area.reshape(n_rows, CELL_H, LINE_CHARS, CELL_W)
        .transpose(0, 2, 1, 3)[:, :, :GLYPH_H, :GLYPH_W]
        .reshape(n_rows * LINE_CHARS, GLYPH_W * GLYPH_H)
    )
    return _pack_key(cells != 0)


def word_conf(word: str) -> int:
    """Deterministic per-word pseudo-confidence in [0, 100].

    Spans all three of the reference's confidence color classes
    (/root/reference/StudiOCR/DocWindow.py:221-227: >=80 green,
    >=40 blue, else red).
    """
    return zlib.crc32(word.encode("utf-8")) % 101


def render_page(text: str) -> bytes:
    """Render ``text`` (printable ASCII) to a PNG page image."""
    n = max(len(text), 1)
    n_rows = (n + LINE_CHARS - 1) // LINE_CHARS
    h = 2 * MARGIN + n_rows * CELL_H
    w = 2 * MARGIN + LINE_CHARS * CELL_W
    img = np.zeros((h, w), dtype=np.uint8)
    for i, ch in enumerate(text):
        code = ord(ch)
        if not (ASCII_LO <= code <= ASCII_HI):
            raise ValueError(f"unrenderable char {ch!r}")
        r, c = divmod(i, LINE_CHARS)
        y = MARGIN + r * CELL_H
        x = MARGIN + c * CELL_W
        img[y : y + GLYPH_H, x : x + GLYPH_W] = GLYPHS[code]
    return encode_png(img)


def decode_page_text(png: bytes) -> str:
    """Exact inverse of :func:`render_page` (vectorized cell decode)."""
    keys = _cell_keys(decode_png(png))
    nz = keys != 0
    end = len(keys) if nz.all() else int(np.argmin(nz))
    rev = _REVERSE_INT
    return "".join([rev[int(k)] for k in keys[:end]])


def page_image_to_data(png: bytes, text: str | None = None) -> dict[str, list]:
    """OCR a rendered page into an ``image_to_data``-shaped dict.

    Output mirrors pytesseract's parallel arrays (the keys the reference
    requires at OcrPageData.py:20-23). Row order: one page-level structural
    row, then per text line a line-level structural row followed by the
    line's word rows (a word is assigned to the line its first char is on;
    a wrapped word's box spans the full wrapped region).

    ``text`` may be passed when already decoded (avoids a second decode).
    """
    if text is None:
        text = decode_page_text(png)
    img_h = 2 * MARGIN + max((len(text) + LINE_CHARS - 1) // LINE_CHARS, 1) * CELL_H
    img_w = 2 * MARGIN + LINE_CHARS * CELL_W
    out: dict[str, list] = {k: [] for k in ("left", "top", "width", "height", "conf", "text")}

    def emit(left: int, top: int, width: int, height: int, conf: int, t: str) -> None:
        out["left"].append(left)
        out["top"].append(top)
        out["width"].append(width)
        out["height"].append(height)
        out["conf"].append(conf)
        out["text"].append(t)

    emit(0, 0, img_w, img_h, -1, "")  # page-level structural row

    n_rows = (max(len(text), 1) + LINE_CHARS - 1) // LINE_CHARS
    words = list(_WORD_RE.finditer(text))
    wi = 0
    for r in range(n_rows):
        line_top = MARGIN + r * CELL_H
        emit(MARGIN, line_top, LINE_CHARS * CELL_W - 1, GLYPH_H, -1, "")
        while wi < len(words) and words[wi].start() // LINE_CHARS == r:
            m = words[wi]
            i, j = m.start(), m.end()
            r0, c0 = divmod(i, LINE_CHARS)
            r1, c1 = divmod(j - 1, LINE_CHARS)
            if r0 == r1:
                left = MARGIN + c0 * CELL_W
                width = (c1 - c0 + 1) * CELL_W - 1
            else:  # wrapped word: box spans the full wrapped lines
                left = MARGIN
                width = LINE_CHARS * CELL_W - 1
            top = MARGIN + r0 * CELL_H
            height = (r1 - r0 + 1) * CELL_H - 1
            emit(left, top, width, height, word_conf(m.group()), m.group())
            wi += 1
    return out
