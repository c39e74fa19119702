"""Per-page aggregates (the reference's OcrPageData) — two strategies.

A1-A6 (/root/reference/StudiOCR/OcrPageData.py:28-62, char_histogram
:84-91) as native Spark:

1. ``page_stats_from_raw`` — SHUFFLE-FREE: the raw image_to_data rows for a
   page arrive as one array column out of the extract UDF, so every
   aggregate is a higher-order-function expression over that array
   (filter/transform/aggregate). Per-page arrays are small (~10²), so the
   quadratic distinct-count expressions are cheap, and at 100 TB this
   avoids a full shuffle of every block row — the page row never leaves
   its partition.

2. ``page_stats_grouped`` — the classic explode -> groupBy shape (partial
   aggregation / map-side combine apply). Used for oracle SQL parity
   checks and wherever stats must be recomputed from a stored
   ``ocr_blocks`` table without the raw arrays.

Determinization vs the reference (SURVEY §1.1): Python sets become sorted
arrays, Counters become maps; map key order is not defined in Spark, so
tests compare maps as dicts, not rendered strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .extract import non_whitespace_filter

ASCII_LO, ASCII_HI = 32, 126


def _counts_map(elems: Column) -> Column:
    """map<elem,count> over an array column, via distinct x count-per-key."""
    uniq = F.array_sort(F.array_distinct(elems))
    counts = F.transform(
        uniq, lambda u: F.size(F.filter(elems, lambda x: x == u)).cast("long")
    )
    return F.map_from_arrays(uniq, counts)


def page_stats_expr(raw: Column) -> Column:
    """page_stats struct from a raw image_to_data array column."""
    kept = F.filter(raw, lambda r: non_whitespace_filter(r["text"]))
    kept_texts = F.transform(kept, lambda r: r["text"])
    uniq_texts = F.array_sort(F.array_distinct(kept_texts))
    # chars of ''.join(RAW texts) — quirk 2: unfiltered input
    all_text = F.array_join(F.transform(raw, lambda r: r["text"]), "")
    chars = F.split(all_text, "")
    char_map = _counts_map(chars)
    hist = F.transform(
        F.sequence(F.lit(ASCII_LO), F.lit(ASCII_HI)),
        lambda code: F.coalesce(
            F.element_at(char_map, F.char(code)), F.lit(0).cast("long")
        ),
    )
    conf_arrays = F.transform(
        uniq_texts,
        lambda u: F.array_sort(
            F.array_distinct(
                F.transform(
                    F.filter(kept, lambda r: r["text"] == u),
                    lambda r: r["conf"],
                )
            )
        ),
    )
    return F.struct(
        _counts_map(kept_texts).alias("word_counts"),
        uniq_texts.alias("unique_texts"),
        char_map.alias("char_counts"),
        F.map_keys(char_map).alias("unique_chars"),  # keys sorted by _counts_map
        hist.alias("ascii_histogram"),
        F.map_from_arrays(uniq_texts, conf_arrays).alias("conf_by_text"),
    )


def page_stats_from_raw(raw_df: DataFrame) -> DataFrame:
    """Page rows with the typed page_stats struct.

    The extract UDF already computes page_stats in-UDF (measured ~1000x
    cheaper than the HOF recompute — see functions/pagestats.py); this
    passes it through when present and only falls back to the declarative
    expression for raw tables stored without it.
    """
    if "page_stats" in raw_df.columns:
        return raw_df
    return raw_df.withColumn("page_stats", page_stats_expr(F.col("raw")))


# ---------------------------------------------------------------------------
# Grouped (explode -> groupBy) variants over an ocr_blocks table.
# ---------------------------------------------------------------------------

def word_counts_grouped(blocks: DataFrame) -> DataFrame:
    """A1: Counter over block texts per page (hash agg, partial+final)."""
    return (
        blocks.groupBy("url", "page_no", "text")
        .agg(F.count("*").alias("n"))
    )


def unique_texts_grouped(blocks: DataFrame) -> DataFrame:
    """A2: sorted distinct texts per page."""
    return blocks.groupBy("url", "page_no").agg(
        F.array_sort(F.collect_set("text")).alias("unique_texts")
    )


def conf_by_text_grouped(blocks: DataFrame) -> DataFrame:
    """A6: text -> sorted distinct confs per page."""
    return blocks.groupBy("url", "page_no", "text").agg(
        F.array_sort(F.collect_set("conf")).alias("confs")
    )


def page_count_per_doc(ocr_pages: DataFrame) -> DataFrame:
    """A7: len(doc.pages) (OcrEngine.py:110)."""
    return ocr_pages.groupBy("url").agg(F.count("*").alias("n_pages"))


def page_stats_grouped(blocks: DataFrame) -> DataFrame:
    """A1+A2+A6 in ONE shuffle: single groupBy(url, page_no) pass.

    char stats (A3-A5) need the raw unfiltered texts and so live on the
    raw-array path only.
    """
    per_text = (
        blocks.groupBy("url", "page_no", "text")
        .agg(
            F.count("*").alias("n"),
            F.array_sort(F.collect_set("conf")).alias("confs"),
        )
    )
    entries = F.array_sort(
        F.collect_list(F.struct("text", "n", "confs"))
    )
    return per_text.groupBy("url", "page_no").agg(
        F.map_from_entries(
            F.transform(entries, lambda e: F.struct(e["text"], e["n"]))
        ).alias("word_counts"),
        F.transform(entries, lambda e: e["text"]).alias("unique_texts"),
        F.map_from_entries(
            F.transform(entries, lambda e: F.struct(e["text"], e["confs"]))
        ).alias("conf_by_text"),
    )
