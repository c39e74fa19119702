"""Checkpoint/resume: crash mid-run, resume, no loss, no dupes."""

from __future__ import annotations

from pyspark.sql import functions as F

from studiocr_spark.streaming.incremental import (
    pending_buckets,
    run_checkpointed_extract,
)

N_BUCKETS = 8


def test_resume_after_crash(spark, pages_df, tmp_path):
    out = str(tmp_path / "ckpt")
    # run 1 "crashes" after 3 buckets
    m1 = run_checkpointed_extract(
        spark, pages_df, out, n_buckets=N_BUCKETS, fail_after_buckets=3
    )
    assert m1 is not None and m1.count() == 3
    pending = pending_buckets(spark, out, N_BUCKETS)
    assert len(pending) == N_BUCKETS - 3

    # run 2 completes the rest
    m2 = run_checkpointed_extract(spark, pages_df, out, n_buckets=N_BUCKETS)
    assert m2.count() == N_BUCKETS - 3
    assert pending_buckets(spark, out, N_BUCKETS) == []

    # run 3 is a no-op
    assert run_checkpointed_extract(spark, pages_df, out, n_buckets=N_BUCKETS) is None

    # outputs: every url exactly once per page, no dupes, full coverage
    pages_out = spark.read.parquet(f"{out}/ocr_pages")
    assert pages_out.groupBy("url", "page_no").count().filter("count > 1").count() == 0
    assert pages_out.select("url").distinct().count() == pages_df.count()

    blocks_out = spark.read.parquet(f"{out}/ocr_blocks")
    assert (
        blocks_out.groupBy("url", "page_no", "block_no").count()
        .filter("count > 1").count() == 0
    )

    # manifest lineage is sane
    manifest = spark.read.parquet(f"{out}/manifest")
    row = manifest.agg(
        F.sum("n_urls").alias("u"), F.sum("n_pages").alias("p")
    ).collect()[0]
    assert row.u == pages_df.count()
    assert row.p == pages_out.count()
    assert manifest.filter(F.col("docs_per_sec") < 0).count() == 0


def test_reprocessing_is_idempotent(spark, pages_df, tmp_path):
    """Crash AFTER data write but BEFORE manifest: rerun must not dupe."""
    out = str(tmp_path / "ckpt2")
    run_checkpointed_extract(
        spark, pages_df, out, n_buckets=4, fail_after_buckets=2
    )
    # simulate the lost-manifest crash: wipe the manifest, keep the data
    import shutil

    shutil.rmtree(f"{out}/manifest")
    run_checkpointed_extract(spark, pages_df, out, n_buckets=4)
    pages_out = spark.read.parquet(f"{out}/ocr_pages")
    assert pages_out.groupBy("url", "page_no").count().filter("count > 1").count() == 0
    assert pages_out.select("url").distinct().count() == pages_df.count()
