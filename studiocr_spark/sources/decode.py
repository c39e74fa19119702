"""Pluggable page-payload decoders (the rasterize + OCR backend).

The reference's ingest accepts single images (cv2.imread,
/root/reference/StudiOCR/OcrEngine.py:46-47) and multi-page PDFs
rasterized page-by-page (pdf2image/pdftocairo, PdfToImage.py:27-36), then
runs tesseract per page (OcrEngine.py:87-89). Here that contract is a
single function::

    decode_payload(html: bytes) -> list[(page_png: bytes, image_to_data: dict)]

with two backends:

- ``bitmap`` (default, sandbox): the deterministic glyph codec
  (functions/glyphs.py). Byte-exact, dependency-free — the CI target.
- ``tesseract`` (production): cv2/pdf2image/pytesseract chain incl. the
  reference's preprocessing options (oem/psm/best/flat-field). Import-gated;
  raises a clear error in environments without the native libs.

Payload container formats (sniffed by magic bytes — mirrors the extension
whitelist dispatch at EditDocWindow.py:467-479 / ImageGridSearch.py:57-71):

- PNG  (``\\x89PNG``): one page.
- MPDF (``MPDF`` + u32 page count + per page u32 length + PNG): the
  sandbox's stand-in for a multi-page PDF — exercises the 1-row -> N-pages
  flatMap shape of PdfToImage.py.
- ``%PDF``: real PDF, tesseract backend only.
- JPEG (``\\xff\\xd8``): tesseract backend only.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

MPDF_MAGIC = b"MPDF"
PNG_MAGIC = b"\x89PNG"
PDF_MAGIC = b"%PDF"
JPEG_MAGIC = b"\xff\xd8"

# per page: (stored_image_bytes, image_to_data_dict, page_text_or_None);
# page_text is None when the backend has no exact-text notion (tesseract)
# and the caller should derive it from the data dict.
# CONTRACT: every image_to_data dict holds plain Python int lists
# (left/top/width/height/conf) and a plain str list (text) — each backend
# normalizes at its own boundary; downstream (extract loop, page stats)
# relies on this and performs no per-value coercion.
Decoded = list[tuple[bytes, dict, str | None]]
Decoder = Callable[[bytes], Decoded]


def pack_mpdf(page_pngs: list[bytes]) -> bytes:
    """Concatenate page PNGs into the MPDF multi-page container."""
    out = [MPDF_MAGIC, struct.pack(">I", len(page_pngs))]
    for png in page_pngs:
        out.append(struct.pack(">I", len(png)))
        out.append(png)
    return b"".join(out)


def unpack_mpdf(data: bytes) -> list[bytes]:
    if data[:4] != MPDF_MAGIC:
        raise ValueError("not an MPDF payload")
    (n,) = struct.unpack(">I", data[4:8])
    pos = 8
    pages = []
    for _ in range(n):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        pages.append(data[pos + 4 : pos + 4 + length])
        pos += 4 + length
    return pages


def sniff_kind(data: bytes) -> str:
    if data[:4] == PNG_MAGIC:
        return "png"
    if data[:4] == MPDF_MAGIC:
        return "mpdf"
    if data[:4] == PDF_MAGIC:
        return "pdf"
    if data[:2] == JPEG_MAGIC:
        return "jpeg"
    return "unknown"


def bitmap_decode(html: bytes) -> Decoded:
    """Deterministic glyph-grid backend (no native deps)."""
    from ..functions.glyphs import decode_page_text, page_image_to_data

    kind = sniff_kind(html)
    if kind == "png":
        pngs = [bytes(html)]
    elif kind == "mpdf":
        pngs = unpack_mpdf(bytes(html))
    else:
        raise ValueError(f"bitmap backend cannot decode payload kind {kind!r}")
    out: Decoded = []
    for png in pngs:
        text = decode_page_text(png)  # single decode, shared by both uses
        out.append((png, page_image_to_data(png, text), text))
    return out


def tesseract_decode(
    html: bytes,
    oem: int = 3,
    psm: int = 3,
    best: bool = True,
    preprocessing: bool = False,
    tessdata_root: str | None = None,
) -> Decoded:
    """Production backend: rasterize + preprocess + tesseract.

    Parameter surface mirrors the reference (oem hardcoded 3 at
    EditDocWindow.py:609-611; psm in [3,13] OcrEngine.py:35-44; best/fast
    model dir OcrEngine.py:49-54; optional grayscale + flat-field
    preprocessing OcrEngine.py:74-85 with medianBlur(91) illumination
    normalization OcrEngine.py:63-72).

    ``best`` selects the best/fast traineddata dir exactly as
    OcrEngine.py:49-54 does via ``--tessdata-dir``; ``tessdata_root``
    (or $STUDIOCR_TESSDATA) points at the directory holding ``best/``
    and ``fast/``. When no root is configured the flag is a no-op on the
    system default models — same as a reference checkout without the
    bundled tessdata.
    """
    # validate the reference's parameter domains (OcrEngine.py:35-44)
    # BEFORE the import gate: a bad config is a config error everywhere,
    # not a missing-dependency error
    if not 0 <= oem <= 3:
        raise ValueError("oem must be in [0, 3]")
    if not 3 <= psm <= 13:
        raise ValueError("psm must be in [3, 13]")
    try:
        import cv2  # noqa: F401
        import pytesseract
        from pdf2image import convert_from_bytes
    except ImportError as exc:  # sandbox: native OCR libs absent by design
        raise NotImplementedError(
            "tesseract backend requires cv2/pytesseract/pdf2image "
            "(not installed in this environment); use backend='bitmap'"
        ) from exc

    import numpy as np

    kind = sniff_kind(html)
    if kind == "pdf":
        images = [
            cv2.cvtColor(np.asarray(p), cv2.COLOR_RGB2BGR)
            for p in convert_from_bytes(bytes(html), thread_count=4)
        ]
    elif kind in ("png", "jpeg"):
        images = [cv2.imdecode(np.frombuffer(html, np.uint8), cv2.IMREAD_COLOR)]
    elif kind == "mpdf":
        images = [
            cv2.imdecode(np.frombuffer(p, np.uint8), cv2.IMREAD_COLOR)
            for p in unpack_mpdf(bytes(html))
        ]
    else:
        raise ValueError(f"cannot decode payload kind {kind!r}")

    import os

    config = f"--oem {oem} --psm {psm}"
    root = tessdata_root or os.environ.get("STUDIOCR_TESSDATA")
    if root:
        sub = "best" if best else "fast"
        config += f' --tessdata-dir "{os.path.join(root, sub)}"'

    out: Decoded = []
    for img in images:
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if preprocessing:
            gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
            blur = cv2.medianBlur(gray, 91).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                rgb = np.clip(
                    gray * (blur.mean() / blur), 0, 255
                ).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 100])
        data = pytesseract.image_to_data(
            rgb, config=config, output_type=pytesseract.Output.DICT
        )
        out.append(
            (
                enc.tobytes(),
                # Decoder contract: plain Python int lists / str list —
                # pytesseract emits numpy/str-typed cells depending on
                # version, and the extract loop no longer re-coerces
                # (int(v) here is exactly the coercion the loop used to
                # apply, so float confs still truncate identically)
                {
                    "left": [int(v) for v in data["left"]],
                    "top": [int(v) for v in data["top"]],
                    "width": [int(v) for v in data["width"]],
                    "height": [int(v) for v in data["height"]],
                    "conf": [int(v) for v in data["conf"]],
                    "text": [str(t) for t in data["text"]],
                },
                None,  # no exact-text notion; caller joins tokens
            )
        )
    return out


DECODERS: dict[str, Decoder] = {
    "bitmap": bitmap_decode,
    "tesseract": tesseract_decode,
}


def get_decoder(backend: str) -> Decoder:
    try:
        return DECODERS[backend]
    except KeyError:
        raise ValueError(f"unknown decode backend {backend!r}") from None
