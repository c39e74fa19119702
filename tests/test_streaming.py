"""Structured Streaming: streaming extract parity + windowed rollups."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from studiocr_spark.streaming.stream_extract import (
    read_pages_stream,
    run_stream_to_memory,
    stream_extract_blocks,
    windowed_event_counts,
)

from .conftest import sf_dir


def test_stream_extract_matches_batch(spark, pages_df, extracted, tmp_path):
    """The SAME extract over a file stream produces the batch block set."""
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "blocks_out")
    ckpt = str(tmp_path / "ckpt")
    pages_df.write.mode("overwrite").parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    q = stream_extract_blocks(stream, out_dir, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out_dir)
    _, _, batch_blocks = extracted
    assert got.count() == batch_blocks.count()
    # spot-check exact equality of a slice
    key = ["url", "page_no", "block_no"]
    diff = (
        got.select(*key, "text")
        .exceptAll(batch_blocks.select(*key, "text"))
        .count()
    )
    assert diff == 0

    # restart with no new files: exactly-once, no duplicates
    q2 = stream_extract_blocks(
        read_pages_stream(spark, pages_dir), out_dir, ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out_dir).count() == batch_blocks.count()


def test_windowed_event_counts(spark, tmp_path):
    # the file stream source requires a directory, not a single file
    ev_dir = str(tmp_path / "events")
    spark.read.parquet(
        os.path.join(sf_dir("0.001"), "events.parquet")
    ).write.mode("overwrite").parquet(ev_dir)
    ev_stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(ev_dir)
    )
    agg = windowed_event_counts(ev_stream, window="1 hour")
    out = run_stream_to_memory(agg, "win_counts", spark)
    rows = out.collect()
    assert len(rows) > 0
    # cross-check against the batch computation of the same rollup
    batch = (
        spark.read.parquet(os.path.join(sf_dir("0.001"), "events.parquet"))
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    got_total = sum(r.n for r in rows)
    assert got_total == sum(r.n for r in batch.collect())


def test_observed_metrics(spark, pages_df):
    from studiocr_spark.operators.extract import extract_raw
    from studiocr_spark.streaming.metrics import observed

    raw = extract_raw(pages_df, backend="bitmap")
    df, obs = observed(raw, "x")
    n = df.count()
    got = obs.get
    assert got["rows"] == n
    assert got["errors"] == 0
    assert got["urls_approx"] > 100  # ~120 urls, approx sketch
