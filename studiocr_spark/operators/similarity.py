"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products run as
  sequential ``F.aggregate`` folds over zipped arrays (JVM-side,
  deterministic order -> bit-stable in double precision, comparable with
  the DuckDB oracle), top-k via window row_number.
- LSH-bucketed ANN: random-hyperplane signatures with md5-derived
  deterministic planes; candidates share a signature bucket, then exact
  re-rank. The scale path: the quadratic crossJoin becomes a bucket
  equi-join.

Scale notes: brute force is O(Q x N) — fine when the query side is small
and broadcast. For corpus-vs-corpus at 10^9 vectors use the LSH variant
(bucket join) or an IVF partitioner (coarse k-means assignment), both of
which shuffle on uniform keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact top-k per query.

    The query side is broadcast (small by contract); ties broken by
    neighbor id for determinism. Self-matches excluded.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cosine"),
            "rank",
        )
    )


def hyperplane_signature(
    vec_col: Column, dim: int, n_planes: int = 8
) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id).

    Plane i component j = +1/-1 by the parity of hex digit (j mod 32) of
    md5("plane-i-chunk"), i.e. fully derived from (i, j) — no RNG state,
    identical across engines and runs. Signature bit i = sign of the
    projection.
    """
    bits = []
    for i in range(n_planes):
        # per-plane sign array: digit parity of a repeated md5 stream
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, j: v.cast("double")
                * F.when(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"plane-{i}-"),
                                    F.floor(j / 32).cast("string"),
                                )
                            ),
                            (j % 32) + 1,
                            1,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 2
                    == 1,
                    1.0,
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket equi-join on the hyperplane signature,
    exact cosine re-rank within buckets. Recall < 1 by design; raise
    ``n_planes`` bands (or probe neighboring buckets) to trade cost for
    recall."""
    from pyspark.sql import Window

    sig = hyperplane_signature(F.col(vec_col), dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sig.alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sig.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cosine"),
            "rank",
        )
    )


def embedding_near_dups(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs above threshold — embedding-cosine
    near-dup detection, LSH-blocked then exactly verified."""
    sig = hyperplane_signature(F.col(vec_col), dim, n_planes)
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), sig.alias("bucket")
    )
    pairs = (
        v.alias("a")
        .join(v.alias("b"), "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cos_raw"),
        )
        .distinct()
    )
    return pairs.filter(F.col("cos_raw") >= threshold).select(
        "vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine")
    )
