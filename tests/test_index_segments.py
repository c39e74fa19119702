"""Segmented postings store: incremental index maintenance.

A full rebuild after every incremental extract converts a 0.1% delta
append into a 100% index job at corpus scale; segments make index cost
proportional to the delta. These tests pin the invariant that matters:
the union of per-run segments is EXACTLY the index a full rebuild would
produce — before and after compaction — and search results agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from studiocr_spark.operators.index import (
    build_postings,
    compact_postings,
    list_segments,
    read_postings,
    vacuum_segments,
    write_postings,
    write_postings_segment,
)


def _canon(df):
    return sorted(
        tuple(r) for r in df.select(
            "term", "url", "page_no", "block_no"
        ).collect()
    )


def test_incremental_segments_equal_full_rebuild(spark, extracted, tmp_path):
    """Two per-delta segments (split by url bucket, the extract job's
    checkpoint unit) must read back identical to one full build, and
    compaction must preserve every row while dropping old segments."""
    _, _, ocr_blocks = extracted
    blocks = ocr_blocks.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(2)).cast("int")
    )
    root = str(tmp_path / "postings_seg")
    full = str(tmp_path / "postings_full")

    # run 1 completes bucket 0, run 2 bucket 1 — mirror the job's
    # per-run delta indexing
    for b in (0, 1):
        delta = build_postings(
            blocks.filter(F.col("bucket") == b).drop("bucket")
        )
        write_postings_segment(delta, root, term_buckets=4)
    assert len(list_segments(root)) == 2

    write_postings(build_postings(ocr_blocks), full, term_buckets=4)
    expected = _canon(spark.read.parquet(full))
    assert _canon(read_postings(spark, root)) == expected

    # search parity over the segmented index
    from studiocr_spark.operators.search import bm25_search

    seg_hits = bm25_search(read_postings(spark, root), "cat dog")
    full_hits = bm25_search(spark.read.parquet(full), "cat dog")
    assert sorted((r.url, r.score) for r in seg_hits.collect()) == sorted(
        (r.url, r.score) for r in full_hits.collect()
    )

    # compact: one live segment, same rows, old dirs vacuumable
    compact_postings(spark, root, term_buckets=4)
    assert len(list_segments(root)) == 1
    assert _canon(read_postings(spark, root)) == expected
    assert vacuum_segments(root) == 2
    assert _canon(read_postings(spark, root)) == expected


def test_read_postings_falls_back_to_flat_dir(spark, extracted, tmp_path):
    """A pre-segmentation index (plain write_postings dir, no SEGMENTS
    manifest) must keep reading as a one-segment store."""
    _, _, ocr_blocks = extracted
    flat = str(tmp_path / "postings_flat")
    write_postings(build_postings(ocr_blocks), flat, term_buckets=4)
    assert list_segments(flat) == []
    assert read_postings(spark, flat).count() == ocr_blocks.count()


def test_unpublished_segment_is_invisible(spark, extracted, tmp_path):
    """Write-audit-publish: a segment dir written but not yet listed in
    SEGMENTS (crash before publish) must not appear to readers, and
    vacuum must remove it."""
    _, _, ocr_blocks = extracted
    root = str(tmp_path / "postings_wap")
    p = build_postings(ocr_blocks)
    write_postings_segment(p.limit(10), root, term_buckets=2)
    # simulate a crashed writer: data written, publish never happened
    write_postings(p.limit(5), f"{root}/seg_orphan", term_buckets=2)
    assert read_postings(spark, root).count() == 10
    assert vacuum_segments(root) == 1
    assert read_postings(spark, root).count() == 10
