"""Bucketed-table writes and shuffle-free co-located joins.

The north_rule mandates explicit bucket-by-url partitioning; the Iceberg
DDL in sources/catalog.py declares it for production (`PARTITIONED BY
(bucket(N, url))`), and THIS module is the executable sandbox
counterpart: Spark's native parquet bucketing (`bucketBy` +
`saveAsTable`), which hash-clusters rows into a fixed number of files
per partition so that:

- a join between two tables bucketed on their join keys with the same
  bucket count needs NO shuffle exchange on either side (the scan is
  already hash-partitioned — the physical plan contains zero
  ShuffleExchange operators, pinned in tests/test_plans.py);
- an aggregation keyed by the bucket column skips its exchange the same
  way;
- at 100 TB this is the difference between re-shuffling the corpus per
  join and reading co-located splits: the shuffle happens ONCE, at
  write time, and every downstream consumer inherits it.

`sortBy` within buckets additionally gives sort-merge joins their order
for free and keeps parquet min/max stats tight for range predicates.

No reference counterpart (the reference stores rows in SQLite —
StudiOCR/db.py); this is the Spark-native answer to the same "queries
must not rescan everything" need its indexes serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    ``path`` pins the storage location (tests use a tmp dir; production
    an object-store prefix). Bucket count must match across tables that
    will be co-joined — Spark only elides the shuffle when both sides
    agree.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys.

    Plain DataFrame join — the point is what Catalyst does with it:
    both scans report their bucket hash-partitioning, so the join plans
    with zero ShuffleExchange operators (asserted by the plan-pin
    test). Any other join shape (different bucket counts, non-bucket
    keys) silently degrades to a normal shuffled join — run the pin
    test against YOUR tables when deploying.
    """
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key])
