"""Streaming exact deduplication: first-seen-wins over an unbounded
document stream.

The batch engine dedups with a hash groupBy (``operators/dedup.py::
exact_duplicates``); the streaming shape is Spark's built-in stateful
``dropDuplicates`` keyed on the content hash — the state store keeps
one row per distinct hash and suppresses every later arrival, across
micro-batches and restarts (checkpointed). This is the
ingest-as-it-crawls dedup a training-data pipeline runs so downstream
stages never see a duplicate document.

State growth is the scale knob: keyed on md5(text) the store holds one
16-byte-keyed row per DISTINCT document ever seen. For bounded state on
an infinite crawl, pass ``within`` + an event-time column to use
``dropDuplicatesWithinWatermark`` — duplicates are only suppressed
within the watermark horizon and state older than it is evicted (the
standard correctness/state tradeoff; exact global dedup of an unbounded
stream is unbounded state by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Distinct-content stream: emit only the first document seen per
    content hash. ``within`` (e.g. "1 hour") + ``event_time_col``
    switches to watermark-bounded state."""
    hashed = docs_stream.withColumn(
        "content_hash", F.md5(F.col(text_col))
    )
    if within is not None:
        if event_time_col is None:
            raise ValueError("within requires event_time_col")
        return hashed.withWatermark(
            event_time_col, within
        ).dropDuplicatesWithinWatermark(["content_hash"])
    return hashed.dropDuplicates(["content_hash"])
