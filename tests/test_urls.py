"""URL canonicalization: case, ports, tracking params, fragments."""

from __future__ import annotations

from pyspark.sql import functions as F

from studiocr_spark.operators.urls import canonicalize_url, url_dedup

CASES = [
    # (input, expected canonical)
    ("HTTP://WWW.Example.COM:80/Path?b=2&a=1#frag",
     "http://www.example.com/Path?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/?utm_source=x&utm_campaign=y", "http://example.com/"),
    ("http://example.com/p?fbclid=abc&q=1", "http://example.com/p?q=1"),
    ("http://example.com/p?gclid=1&z=9&a=0", "http://example.com/p?a=0&z=9"),
    # path case is PRESERVED (paths are case-sensitive; hosts are not)
    ("http://Example.com/CaseSensitive", "http://example.com/CaseSensitive"),
    # '?' INSIDE the fragment is not a query (round-5 ADVICE fix: the
    # query must come from the pre-fragment substring only)
    ("http://h.com/p#sec?x=1", "http://h.com/p"),
    ("http://h.com/p?a=1#sec?x=2", "http://h.com/p?a=1"),
    # non-URL rows pass through untouched
    ("not a url at all", "not a url at all"),
    ("", ""),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    ).select("i", canonicalize_url(F.col("url")).alias("c"))
    got = {r.i: r.c for r in df.collect()}
    for i, (inp, want) in enumerate(CASES):
        assert got[i] == want, (inp, got[i], want)


def test_url_dedup_groups_spelling_variants(spark):
    rows = [
        (0, "http://a.com/x?p=1"),
        (1, "HTTP://A.COM:80/x?p=1#top"),
        (2, "http://a.com/x?utm_source=s&p=1"),
        (3, "http://a.com/y"),  # different page
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in url_dedup(df).collect()}
    assert got[0].canonical_id == 0 and not got[0].is_duplicate
    assert got[1].canonical_id == 0 and got[1].is_duplicate
    assert got[2].canonical_id == 0 and got[2].is_duplicate
    assert got[3].canonical_id == 3 and not got[3].is_duplicate
    assert got[1].canonical_url == "http://a.com/x?p=1"


def test_canonicalize_is_idempotent_on_fuzz(spark):
    """canon(canon(u)) == canon(u) over seeded random URL-ish strings —
    the property that makes re-canonicalizing an already-clean corpus a
    no-op (incremental pipelines re-run it freely)."""
    import random

    rng = random.Random(5)
    frags = ["http://", "HTTPS://", "Site", ".COM", ".org", ":80", ":443",
             "/p", "/P/x", "?a=1", "&b=2", "&utm_source=z", "#f", "",
             "q=", "&&", "xyz", ":8080"]
    urls = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 8)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = df.select("i", canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "i", "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]
