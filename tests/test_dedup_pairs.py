"""simhash_near_dups: pigeonhole banding must find every pair within
``max_hamming`` — including pairs whose differing bits span BOTH halves
of the signature (the round-1 half-signature blocking missed those)."""

import hashlib
from itertools import combinations


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
