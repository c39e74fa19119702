"""simhash_near_dups: pigeonhole banding must find every pair within
``max_hamming`` — including pairs whose differing bits span BOTH halves
of the signature (the round-1 half-signature blocking missed those)."""

import hashlib
from itertools import combinations

from pyspark.sql import functions as F


def _simhash1(word: str, bits: int = 16) -> int:
    """Pure-Python simhash of a single-token doc: bit b set iff hex
    digit b of md5(word) is odd (one token -> vote is just its parity).
    Mirrors studiocr_spark.operators.dedup.simhash."""
    h = hashlib.md5(word.encode()).hexdigest()
    return sum(2 ** b for b in range(bits) if int(h[b], 16) % 2 == 1)


def test_distance3_pair_spanning_both_halves_found(spark):
    from studiocr_spark.operators.dedup import simhash_near_dups

    # scan deterministic single-token docs for a pair at hamming
    # distance exactly 3 with differing bits in BOTH 8-bit halves
    words = [f"w{i}" for i in range(160)]
    sigs = {w: _simhash1(w) for w in words}
    target = None
    for a, b in combinations(words, 2):
        x = sigs[a] ^ sigs[b]
        if bin(x).count("1") == 3 and (x & 0xFF) and (x >> 8):
            target = (a, b)
            break
    assert target is not None, "corpus scan found no distance-3 pair"

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dups(docs, bits=16, max_hamming=3).collect()
    }
    ids = {w: i for i, w in enumerate(words)}
    a, b = sorted((ids[target[0]], ids[target[1]]))
    assert got.get((a, b)) == 3

    # exhaustive: EVERY pair within distance 3 is found, none beyond
    expect = {}
    for (wa, wb) in combinations(words, 2):
        d = bin(sigs[wa] ^ sigs[wb]).count("1")
        if d <= 3:
            pa, pb = sorted((ids[wa], ids[wb]))
            expect[(pa, pb)] = d
    assert got == expect


def test_exact_dedup_hash_first_equals_direct(spark):
    from studiocr_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(i, f"text {i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    direct = exact_duplicates(docs).collect()
    hashed = exact_duplicates(docs, hash_first=True).collect()
    key = lambda r: (r.doc_id, r.canonical_id, r.is_duplicate)
    assert sorted(map(key, direct)) == sorted(map(key, hashed))


def test_keep_canonical_matches_exact_duplicates(spark):
    """The single-window canonical keep must select exactly the rows
    exact_duplicates labels non-duplicate, with all caller columns
    intact — in both digest modes."""
    from studiocr_spark.operators.dedup import (
        exact_duplicates,
        keep_canonical,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i % 7}", i * 10) for i in range(50)],
        "doc_id long, text string, extra long",
    )
    expect = sorted(
        r.doc_id
        for r in exact_duplicates(docs)
        .filter(~F.col("is_duplicate"))
        .collect()
    )
    kept = keep_canonical(docs).collect()
    assert sorted(r.doc_id for r in kept) == expect
    assert all(r.extra == r.doc_id * 10 for r in kept)
    assert set(kept[0].asDict()) == {"doc_id", "text", "extra"}

    pre = docs.withColumn("_h", F.md5("text"))
    kept2 = keep_canonical(pre, text_col="_h", digest=False)
    assert sorted(r.doc_id for r in kept2.collect()) == expect


def test_arrow_shingles_match_expression_on_edge_cases(spark):
    """The Arrow shingler and the word_shingles expression must agree
    row-for-row — including unicode whitespace, where Python's
    str.split() diverges from Java's ASCII-only \\s."""
    from pyspark.sql import functions as F

    from studiocr_spark.operators.dedup import shingle_table, word_shingles

    texts = [
        "",
        " ",
        "solo",
        "two words",
        "multi   space\tand\ttabs",
        "nbsp stays joined",  # U+00A0 is NOT Java \s
        "trailing space ",
        " leading",
        "a b c d e f g",
        "ünï cödé wörds",
        "line\nbreaks\rhere",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = shingle_table(docs)
    ref = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"))).alias("shingle"),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_band_table_matches_exploded_grouping(spark):
    """Round-5: minhash_band_table builds band keys by slicing the
    signature ARRAY (zero shuffles); it must emit exactly the
    (doc_id, band, band_key) rows the exploded-signatures + groupBy
    form produced — including dropping null/empty-text docs."""
    from pyspark.sql import functions as F

    from studiocr_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different words here",
        "solo",
        "",
        None,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = minhash_band_table(docs)
    sig = minhash_signatures(docs)
    ref = (
        sig.withColumn("band", (F.col("seed") / 2).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_jaccard_verify_methods_agree(spark):
    """The "arrays" fast path and the "counts" scale path must return
    identical (doc_a, doc_b, jaccard) rows."""
    from studiocr_spark.operators.dedup import minhash_lsh_dedup

    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(40):
        words = base.split()
        words[i % len(words)] = f"w{i % 5}"
        rows.append((i, " ".join(words)))
    rows += [(100, None), (101, ""), (102, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = minhash_lsh_dedup(docs, threshold=0.2, verify="arrays")
    c = minhash_lsh_dedup(docs, threshold=0.2, verify="counts")
    ra = sorted(map(tuple, a.collect()))
    rc = sorted(map(tuple, c.collect()))
    assert ra == rc and len(ra) > 0


def test_simhash_tokenizes_like_words_of(spark):
    """simhash's Python tokenizer must match words_of on the same edge
    cases (one md5 vote per JVM-visible token)."""
    import hashlib

    from pyspark.sql import functions as F

    from studiocr_spark.operators.dedup import simhash
    from studiocr_spark.operators.textstats import words_of

    texts = ["nbsp joined token", "a\tb\nc", "  padded  ", "ünï cödé"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash(docs, bits=16).collect()}
    toks = {
        r.doc_id: r.w
        for r in docs.select(
            "doc_id", words_of(F.col("text")).alias("w")
        ).collect()
    }
    for i, words in toks.items():
        votes = [0] * 16
        for w in words:
            h = hashlib.md5(w.encode()).hexdigest()
            for b in range(16):
                votes[b] += 1 if int(h[b], 16) % 2 == 1 else -1
        expect = sum(2 ** b for b in range(16) if votes[b] > 0)
        assert got[i] == expect, (i, words)


def test_line_dedup_semantics(spark):
    """Cross-document duplicate lines are stripped; unique lines keep
    their order; fully-duplicated docs still emit a row."""
    from studiocr_spark.operators.dedup import line_dedup

    boiler = "accept cookies to continue"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler}\nunique alpha content\nmore alpha"),
            (1, f"{boiler}\nunique beta content"),
            (2, boiler),                      # nothing survives
            (3, "repeated inside\nrepeated inside\nsolo line"),
            (4, None),  # null text == empty text (one '' line)
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs, min_doc_freq=2).collect()}
    assert got[0].clean_text == "unique alpha content\nmore alpha"
    assert (got[0].n_lines, got[0].n_kept) == (3, 2)
    assert got[1].clean_text == "unique beta content"
    assert got[2].clean_text == "" and got[2].n_kept == 0
    # within-ONE-doc repetition is NOT cross-document: df counts
    # distinct docs, so doc 3 keeps all its lines in order
    assert got[3].clean_text == "repeated inside\nrepeated inside\nsolo line"
    assert got[3].n_kept == 3
    assert (got[4].n_lines, got[4].n_kept, got[4].clean_text) == (1, 1, "")
