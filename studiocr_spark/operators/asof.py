"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range join.

As-of join: for every left row, the most recent right row at or
before it, per key (event attribution, price lookup, config-at-time).

Spark has no ASOF JOIN operator; the naive formulation is a range theta
join (quadratic per key) or a join + window re-rank (two shuffles and a
blown-up intermediate). This implements the scalable union-tag shape:

    union(left tagged 1, right tagged 0)
      -> ONE shuffle on the key
      -> ONE per-key sort on (time, tag)
      -> last(carried right struct, ignorenulls) over the preceding rows
      -> keep left rows

Cost is a single hash partitioning plus a partition-local sort — the
same wire bytes as a groupBy over the union, no matter how wide the
time skew — and left rows with no prior right row keep a null carry
(LEFT-join semantics). Right rows tagged 0 sort BEFORE left rows at an
equal timestamp, giving the inclusive ``l.ts >= r.ts`` semantics of
DuckDB's ``ASOF LEFT JOIN`` (the oracle for the gate entry).

Determinism: at most one right row per (key, time) must survive into
the union — otherwise "the" last row at a timestamp is partition-order
dependent. ``dedup_right`` (round 4) makes the API foolproof: the
default ``"max_by"`` keeps, per (key, time), the right row maximizing
``tie_break`` (first right_cols column unless given) — callers that
already pre-aggregate pay one extra no-op-cheap partial agg;
``dedup_right=None`` opts out for inputs unique by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    dedup_right: str | None = "max_by",
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of-backward join (inclusive): every ``left`` row gains
    ``prefix + c`` for each ``c`` in ``right_cols``, taken from the
    latest ``right`` row with the same ``by`` and ``right[on] <=
    left[on]``; nulls when no such row exists.

    ``dedup_right="max_by"`` (default) first collapses right rows that
    tie on (``by``, ``on``) to the one maximizing (``tie_break``, then
    the remaining payload columns — a total order, so the carry is
    deterministic regardless of partition order; fully identical rows
    are interchangeable by definition). ``tie_break`` defaults to the
    first right_cols column. Payload columns must be orderable types
    for this mode (no maps); pass ``dedup_right=None`` to skip the
    pre-aggregate when the right side is unique by construction."""
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, by)
        ]
    # Join-semantics parity: a right row with NULL ts can never satisfy
    # l.ts >= r.ts, and a NULL key never equi-matches — but ascending
    # orderBy sorts nulls FIRST and window partitionBy groups nulls
    # TOGETHER, so unfiltered they would be carried into left rows.
    right = right.filter(F.col(on).isNotNull() & F.col(by).isNotNull())
    if dedup_right is not None:
        if dedup_right != "max_by":
            raise ValueError(
                f"dedup_right must be 'max_by' or None, got {dedup_right!r}"
            )
        if not right_cols:
            raise ValueError(
                "asof_join with dedup_right='max_by' needs at least one "
                "right payload column beyond (on, by) — pass right_cols "
                "or dedup_right=None (a payload-free right side has "
                "nothing to carry, and nothing to tie-break on)"
            )
        tb = tie_break if tie_break is not None else right_cols[0]
        # one whole-row struct per (key, ts): max_by on a TOTAL order —
        # partial-agg-friendly (map-side combine collapses ties before
        # the (key, ts) exchange). The ordering struct leads with the
        # tie-break, then every remaining payload column (round-5
        # ADVICE fix: ordering by tie_break alone left rows that ALSO
        # tie on it resolved partition-order-dependently; the full
        # struct is a total order over the carried payload, so the
        # winner is unique whenever the payloads differ at all). The
        # ordering values sit inside a struct because max_by IGNORES
        # rows whose ordering value is NULL, which would silently drop
        # a (key, ts) whose only row carries a null tie-break — a
        # struct with null fields is never null itself (null fields
        # sort lowest).
        order_cols = [tb] + [c for c in right_cols if c != tb]
        picked = (
            right.groupBy(by, on)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in right_cols]),
                    F.struct(*[F.col(c) for c in order_cols]),
                ).alias("_row")
            )
        )
        right = picked.select(
            by, on, *[F.col("_row").getField(c).alias(c) for c in right_cols]
        )
    carry = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        carry.alias("_carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, by)],
    )
    l_extra = [c for c in left.columns if c not in (on, by)]
    l = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            r.schema["_carry"].dataType
        ).alias("_carry"),
        *l_extra,
    )
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).withColumn(
        "_last", F.last("_carry", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_tag") == 1).select(
        by,
        on,
        *l_extra,
        *[
            F.col("_last").getField(c).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_seconds: int = 3600,
    by: str | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Point-in-interval join (half-open: start <= point < end) without
    a quadratic range theta join.

    Catalyst plans a bare inequality join as BroadcastNestedLoopJoin or
    a cartesian — O(|points| x |intervals|). The scale shape here is
    interval bucketing: each interval explodes into the fixed-width
    time buckets it covers, each point lives in exactly ONE bucket, and
    candidates meet on a bucket equi-join (+ optional ``by`` key), then
    the exact range predicate filters. Because a point has one bucket,
    every qualifying (point, interval) pair meets exactly once — no
    dedup pass. ``bucket_seconds`` trades shuffle fan-out (intervals
    emit span/bucket_seconds rows) against candidate selectivity; size
    it near the median interval length.

    Skew: with ``by=None`` the equi-join key is the time bucket alone,
    so a bursty stream puts a whole burst (plus every interval
    overlapping it) into ONE reducer. The keyless path therefore salts:
    each point hashes its full row into one of ``salt_buckets`` salts,
    each interval-bucket row replicates across ALL salts, and the join
    key becomes (bucket, salt) — a burst spreads over ``salt_buckets``
    reducers at the cost of ``salt_buckets``× interval fan-out (cheap:
    intervals are the small side of a point-in-interval join). Keyed
    joins (``by`` set) skip the salt; AQE skew-split covers residual
    per-key skew there.

    Output: all point columns plus every interval column (interval
    columns keep their names; disambiguate before calling if they
    clash).
    """
    salted = by is None and salt_buckets > 1
    keys = (
        ["_bucket"]
        + ([by] if by else [])
        + (["_salt"] if salted else [])
    )

    def epoch(c: str):
        # TIMESTAMP_NTZ has no direct long cast; unix_timestamp is
        # deterministic under the session's pinned-UTC timezone
        return F.unix_timestamp(F.col(c))

    p = points.withColumn(
        "_bucket", F.floor(epoch(point_ts) / bucket_seconds)
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(epoch(start_ts) / bucket_seconds),
                F.floor(epoch(end_ts) / bucket_seconds),
            )
        ),
    )
    if salted:
        # hash the WHOLE point row: a burst shares its timestamp, so
        # hashing ts alone would put the burst back on one reducer
        p = p.withColumn(
            "_salt",
            F.pmod(
                F.hash(*[F.col(c) for c in points.columns]),
                F.lit(salt_buckets),
            ),
        )
        i = i.withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0), F.lit(salt_buckets - 1))
            ),
        )
    return (
        p.join(i, keys)
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop(*[k for k in ("_bucket", "_salt") if k in keys])
    )
