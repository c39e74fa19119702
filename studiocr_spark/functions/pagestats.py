"""In-UDF page statistics (the typed OcrPageData replacement).

Computed inside the extract UDF where the parallel arrays already sit in
Python — a Counter over ~10² tokens costs microseconds, versus re-scanning
the array column with nested higher-order functions JVM-side (measured
~16 ms/page: the char-count subexpression is re-evaluated per histogram
bin). The declarative recompute paths (operators/stats.py) remain for
deriving stats from stored tables.

Semantics: exact transcription of /root/reference/StudiOCR/OcrPageData.py
:28-62 and :84-91, with the quirks SURVEY §1.1 pins (empty strings kept,
char stats over RAW texts, sets determinized to sorted lists). Chars
outside ASCII 32-126 would KeyError in the reference's histogram; here
they simply have no bin (they still appear in char_counts).
"""

from __future__ import annotations

from collections import Counter

ASCII_LO, ASCII_HI = 32, 126


def compute_page_stats(data: dict) -> dict:
    """image_to_data parallel arrays -> typed page_stats dict."""
    texts_raw = data["text"]
    kept = [i for i, t in enumerate(texts_raw) if not t.isspace()]
    texts = [texts_raw[i] for i in kept]
    confs = [data["conf"][i] for i in kept]

    word_counts = Counter(texts)
    char_counts = Counter("".join(texts_raw))  # RAW texts (quirk 2)

    hist = [0] * (ASCII_HI - ASCII_LO + 1)
    for ch, n in char_counts.items():
        code = ord(ch)
        if ASCII_LO <= code <= ASCII_HI:
            hist[code - ASCII_LO] = n

    conf_by_text: dict[str, set[int]] = {}
    for t, c in zip(texts, confs):
        conf_by_text.setdefault(t, set()).add(int(c))

    # Counter values are already ints — plain dict() copies avoid two
    # per-item conversion loops (round-6; ~100 items/page x 60k pages)
    return {
        "word_counts": dict(word_counts),
        "unique_texts": sorted(word_counts),
        "char_counts": dict(char_counts),
        "unique_chars": sorted(char_counts),
        "ascii_histogram": hist,
        "conf_by_text": {t: sorted(s) for t, s in conf_by_text.items()},
    }
