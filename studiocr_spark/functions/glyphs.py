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
from functools import lru_cache

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

# sorted-key form of _REVERSE_INT for the vectorized decode: one
# searchsorted over the page's cell keys replaces a per-char dict
# lookup + string join (round-6; ~40% of decode_page_text's profile)
_SORTED_KEYS = np.array(sorted(_REVERSE_INT), dtype=np.uint64)
_SORTED_CODES = np.array(
    [ord(_REVERSE_INT[int(k)]) for k in _SORTED_KEYS], dtype=np.uint8
)


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


@lru_cache(maxsize=65536)
def word_conf(word: str) -> int:
    """Deterministic per-word pseudo-confidence in [0, 100].

    Spans all three of the reference's confidence color classes
    (/root/reference/StudiOCR/DocWindow.py:221-227: >=80 green,
    >=40 blue, else red). Cached: corpora draw words from a bounded
    vocabulary, so long-lived UDF workers (spark.python.worker.reuse)
    amortize the crc32 across repeats; the cache bound keeps worker
    memory flat on adversarial vocabularies.
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
    keys = keys[:end]
    idx = np.searchsorted(_SORTED_KEYS, keys)
    idx_c = np.minimum(idx, len(_SORTED_KEYS) - 1)
    bad = _SORTED_KEYS[idx_c] != keys
    if bad.any():  # corrupt cell: same KeyError contract as the dict form
        raise KeyError(int(keys[int(np.argmax(bad))]))
    return _SORTED_CODES[idx_c].tobytes().decode("ascii")


def page_image_to_data(png: bytes, text: str | None = None) -> dict[str, list]:
    """OCR a rendered page into an ``image_to_data``-shaped dict.

    Output mirrors pytesseract's parallel arrays (the keys the reference
    requires at OcrPageData.py:20-23). Row order: one page-level structural
    row, then per text line a line-level structural row followed by the
    line's word rows (a word is assigned to the line its first char is on;
    a wrapped word's box spans the full wrapped region).

    ``text`` may be passed when already decoded (avoids a second decode).

    Round-6: the word-box geometry is computed vectorized (numpy over
    the byte positions) for renderable text — chars in [32, 126], where
    ``\\S+`` is exactly "runs of non-space". The per-match loop remains
    as the fallback for out-of-range text (control chars / non-ASCII),
    where regex whitespace semantics differ from the byte test. Both
    paths produce identical rows (pinned by the roundtrip tests and a
    60k-doc equality sweep, OPTIMIZATION_r06.md).
    """
    if text is None:
        text = decode_page_text(png)
    n_rows = (max(len(text), 1) + LINE_CHARS - 1) // LINE_CHARS
    img_h = 2 * MARGIN + n_rows * CELL_H
    img_w = 2 * MARGIN + LINE_CHARS * CELL_W

    arr = (
        np.frombuffer(text.encode("ascii"), dtype=np.uint8)
        if text.isascii()
        else None
    )
    if arr is not None and (arr.size == 0 or int(arr.min()) >= 32):
        m = arr != 32  # space is the only whitespace in [32, 126]
        if m.any():
            starts = np.flatnonzero(
                m & ~np.concatenate(([False], m[:-1]))
            )
            ends = np.flatnonzero(m & ~np.concatenate((m[1:], [False]))) + 1
        else:
            starts = ends = np.empty(0, dtype=np.int64)
        r0 = starts // LINE_CHARS
        c0 = starts % LINE_CHARS
        r1 = (ends - 1) // LINE_CHARS
        c1 = (ends - 1) % LINE_CHARS
        same = r0 == r1
        w_left = np.where(same, MARGIN + c0 * CELL_W, MARGIN)
        w_width = np.where(
            same, (c1 - c0 + 1) * CELL_W - 1, LINE_CHARS * CELL_W - 1
        )
        w_top = MARGIN + r0 * CELL_H
        w_height = (r1 - r0 + 1) * CELL_H - 1
        words = [text[i:j] for i, j in zip(starts.tolist(), ends.tolist())]
        confs = [word_conf(w) for w in words]
        # scatter interleave (round-6): output row order is [page row,
        # then per text line: line row + its words]. Word i is preceded
        # by the page row, r0[i]+1 line rows and i earlier words; line
        # row r by the page row, r earlier line rows and every word on
        # rows < r (searchsorted over the ascending r0). One fancy-index
        # assignment per column replaces the per-row extend loop
        # (row-identical output, pinned by the roundtrip/property tests
        # and the full-corpus sweep).
        n_words = len(words)
        total = 1 + n_rows + n_words
        rows_idx = np.arange(n_rows)
        pos_w = 2 + r0 + np.arange(n_words)
        pos_l = 1 + rows_idx + np.searchsorted(r0, rows_idx)
        left_a = np.full(total, MARGIN, dtype=np.int64)
        left_a[0] = 0
        left_a[pos_w] = w_left
        top_a = np.zeros(total, dtype=np.int64)
        top_a[pos_l] = MARGIN + rows_idx * CELL_H
        top_a[pos_w] = w_top
        width_a = np.full(total, LINE_CHARS * CELL_W - 1, dtype=np.int64)
        width_a[0] = img_w
        width_a[pos_w] = w_width
        height_a = np.full(total, GLYPH_H, dtype=np.int64)
        height_a[0] = img_h
        height_a[pos_w] = w_height
        conf_a = np.full(total, -1, dtype=np.int64)
        conf_a[pos_w] = confs
        texts: list[str] = [""] * total
        for p, w in zip(pos_w.tolist(), words):
            texts[p] = w
        return {
            "left": left_a.tolist(),
            "top": top_a.tolist(),
            "width": width_a.tolist(),
            "height": height_a.tolist(),
            "conf": conf_a.tolist(),
            "text": texts,
        }

    out: dict[str, list] = {k: [] for k in ("left", "top", "width", "height", "conf", "text")}

    def emit(left: int, top: int, width: int, height: int, conf: int, t: str) -> None:
        out["left"].append(left)
        out["top"].append(top)
        out["width"].append(width)
        out["height"].append(height)
        out["conf"].append(conf)
        out["text"].append(t)

    emit(0, 0, img_w, img_h, -1, "")  # page-level structural row

    words_m = list(_WORD_RE.finditer(text))
    wi = 0
    for r in range(n_rows):
        line_top = MARGIN + r * CELL_H
        emit(MARGIN, line_top, LINE_CHARS * CELL_W - 1, GLYPH_H, -1, "")
        while wi < len(words_m) and words_m[wi].start() // LINE_CHARS == r:
            m = words_m[wi]
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
