"""Pure-Python oracle: direct transcription of the reference's semantics.

Each function transcribes one reference code path (cited) with zero Spark
involvement; pytest holds the Spark engine to these outputs. Quirks
deliberately preserved (SURVEY.md §1.1):

1. The block filter is ``not text.isspace()`` — keeps empty strings
   (structural conf=-1 rows), drops only non-empty all-whitespace.
2. Char statistics run over the RAW unfiltered texts.
3. Per-unique-text confidences are a set -> we determinize to sorted list.
4. In-doc search appends a block once PER matching query word.
"""

from __future__ import annotations

from collections import Counter, OrderedDict


def kept_indexes(texts: list[str]) -> list[int]:
    """Whitespace filter (OcrEngine.py:130-131, OcrPageData.py:31-33)."""
    return [i for i, t in enumerate(texts) if not t.isspace()]


def commit_blocks(image_to_data: dict) -> list[dict]:
    """Block rows for one page (OcrEngine.py:130-135); block_no = raw index."""
    out = []
    for i in kept_indexes(image_to_data["text"]):
        out.append(
            {
                "block_no": i,
                "left": image_to_data["left"][i],
                "top": image_to_data["top"][i],
                "width": image_to_data["width"][i],
                "height": image_to_data["height"][i],
                "conf": image_to_data["conf"][i],
                "text": image_to_data["text"][i],
            }
        )
    return out


def page_stats(image_to_data: dict) -> dict:
    """Typed OcrPageData (OcrPageData.py:28-62, char_histogram :84-91)."""
    idx = kept_indexes(image_to_data["text"])
    texts = [image_to_data["text"][i] for i in idx]
    confs = [image_to_data["conf"][i] for i in idx]
    word_counts = Counter(texts)
    chars = list("".join(image_to_data["text"]))  # RAW texts (quirk 2)
    char_counts = Counter(chars)
    hist = OrderedDict((v, 0) for v in range(32, 127))
    for ch, n in char_counts.items():
        hist[ord(ch)] = n  # KeyError outside 32..126, as in the reference
    conf_by_text: dict[str, set] = {}
    for t, c in zip(texts, confs):
        conf_by_text.setdefault(t, set()).add(c)
    return {
        "word_counts": dict(word_counts),
        "unique_texts": sorted(word_counts.keys()),
        "char_counts": dict(char_counts),
        "unique_chars": sorted(char_counts.keys()),
        "ascii_histogram": list(hist.values()),
        "conf_by_text": {t: sorted(s) for t, s in conf_by_text.items()},
    }


def global_search(
    docs: dict[str, list[list[dict]]], query: str
) -> list[str]:
    """Global OCR keyword search (ListDocuments.py:206-221).

    ``docs``: url -> pages -> list of block dicts (with 'text').
    Returns matching urls sorted case-insensitively (ListDocuments.py:111).
    Empty query matches every doc (:210-212). Substring semantics, doc
    appended once on first hit.
    """
    words = query.lower().split()
    out = []
    for url, pages in docs.items():
        if not words:
            out.append(url)
            continue
        found = False
        for page in pages:
            for block in page:
                text = block["text"].lower()
                for w in words:
                    if w in text:
                        out.append(url)
                        found = True
                        break
                if found:
                    break
            if found:
                break
    return sorted(out, key=str.lower)


def in_doc_search(
    pages: list[list[dict]], query: str, case_sensitive: bool = False
) -> OrderedDict:
    """In-document search (DocWindow.py:347-374).

    Returns OrderedDict page_index -> matched blocks, a block repeated once
    per matching query word (quirk 4). Empty query -> empty dict.
    """
    result: OrderedDict[int, list[dict]] = OrderedDict()
    if not query:
        return result
    words = query.split() if case_sensitive else query.lower().split()
    for page_index, blocks in enumerate(pages):
        matched = []
        for block in blocks:
            text = block["text"] if case_sensitive else block["text"].lower()
            for w in words:
                if w in text:
                    matched.append(block)
        if matched:
            result[page_index] = matched
    return result


def conf_color(conf: int) -> str:
    """Confidence classification (DocWindow.py:221-227)."""
    if conf >= 80:
        return "green"
    if conf >= 40:
        return "blue"
    return "red"


def matched_page_navigation(
    matched_pages: list[int], current: int
) -> dict:
    """First/next/prev matched-page jumps (DocWindow.py:278-345)."""
    first = matched_pages[0] if matched_pages else None
    nxt = next((p for p in matched_pages if p > current), None)
    prv = next((p for p in reversed(matched_pages) if p < current), None)
    return {"first": first, "next": nxt, "prev": prv}


def levenshtein(s1: str, s2: str) -> int:
    """Edit distance (CustomFunctions.py:19-38) — classic DP."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def zero_one_loss(
    expected: list[str], predicted: list[str], tol: int | float = 0.2
) -> float:
    """Accuracy score (CustomFunctions.py:40-82), transcribed exactly.

    Iterates over PREDICTED texts: a prediction counts if (len <= 3 and
    exactly in the expected set) or if its min Levenshtein distance to any
    expected text is within tolerance (absolute when ``tol`` is int,
    else ``int(tol * len(pred))``). Score = count / len(set(expected)) —
    may exceed 1.0, as in the reference.
    """
    exp_set = set(expected)
    correct = 0
    for pred in predicted:
        if len(pred) <= 3 and pred in exp_set:
            correct += 1
        else:
            t = tol if isinstance(tol, int) else int(tol * len(pred))
            if any(levenshtein(pred, e) <= t for e in exp_set):
                correct += 1
    return correct / len(exp_set)
