"""Minimal pure-numpy/zlib PNG codec (8-bit grayscale, filter 0 only).

The sandbox has no PIL/cv2, and the deterministic test corpus must be
decodable without tesseract. This codec covers exactly the subset the
corpus generator emits: color type 0 (grayscale), bit depth 8, no
interlace, every scanline filter byte 0. ``decode_png`` validates and
rejects anything else.

Replaces the reference's cv2.imread/imencode pair
(/root/reference/StudiOCR/OcrEngine.py:46-47,82-83) for the fixture path;
the production decoder plugs in cv2/pytesseract behind the same interface
(sources/decode.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode an HxW uint8 grayscale array as a PNG byte string."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_png expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), level=6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`encode_png` back to HxW uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w + 1)
    if (raw[:, 0] != 0).any():
        raise ValueError("unsupported scanline filter")
    # view, not copy: consumers reshape/copy as needed and the decode is
    # memory-bandwidth-bound at high parallelism
    return raw[:, 1:]
