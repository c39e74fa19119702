"""As-of join: inclusive backward semantics, LEFT nulls, one shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from studiocr_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "a"),   # before any right row -> nulls
            (1, 10, "b"),  # equal ts -> inclusive match at 10
            (1, 17, "c"),  # between 15 and 30 -> match 15
            (2, 50, "d"),  # other key
            (3, 9, "e"),   # key with no right rows at all
        ],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (1, 30, 300.0), (2, 49, 490.0)],
        "user_id long, ts long, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {
        r.tag: r.asof_v
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert got == {"a": None, "b": 100.0, "c": 150.0, "d": 490.0, "e": None}


def test_asof_carries_nulls_inside_struct(spark):
    """A right row whose carried VALUE is null must still win the as-of
    (the struct carry distinguishes 'no row' from 'row with null')."""
    left = spark.createDataFrame([(1, 20, "x")], "user_id long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, None)], "user_id long, ts long, v double"
    )
    row = asof_join(left, right, on="ts", by="user_id").first()
    assert row.asof_v is None  # the ts=15 null-valued row, not ts=10


def test_asof_single_shuffle(spark):
    from studiocr_spark.plans.explain import shuffle_exchanges

    left, right = _frames(spark)
    df = asof_join(left, right, on="ts", by="user_id")
    # union-tag shape: exactly one exchange (hash on the key); a
    # join+window formulation would need two
    assert len(shuffle_exchanges(df)) == 1
