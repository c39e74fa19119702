"""ANN crossover benchmark: exact brute force vs multiprobe LSH as the
corpus grows.

At oracle scale (500-2k vectors) brute force wins — the LSH plan has
more stages than there is data. This harness evidences the SCALE story:
generate a deterministic corpus of N vectors, run both, report wall
time and recall@k. The crossover is where the bucket join's candidate
pruning beats scoring the whole corpus; at 10^9 vectors brute force is
not runnable at all.

Usage: python tools/bench_ann.py [N ...]   (default 20000 100000)
Prints one JSON line per N; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K = 10
N_QUERIES = int(os.environ.get("BENCH_ANN_QUERIES", "64"))


N_CLUSTERS = 2000
NOISE = 0.35


def make_corpus(spark, n: int, path: str) -> None:
    """Deterministic CLUSTERED embeddings: vector i = unit center
    (seeded by i % N_CLUSTERS) + gaussian noise (seeded by i).
    Real embedding corpora are clustered — same-cluster neighbors sit
    at cosine ~0.9, which is the regime ANN indexes are built for;
    isotropic gaussian data has all neighbors near 60-90 degrees, where
    NO hyperplane-LSH dial prunes without losing them. Seeded per id ->
    reproducible across runs and partitions."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                c = np.random.default_rng(int(i) % N_CLUSTERS).standard_normal(DIM)
                c /= np.linalg.norm(c)
                # noise seed OFFSET from the center seed: seeding with
                # bare i made every vector with i < N_CLUSTERS (incl.
                # all queries) reuse its center's rng, so its "noise"
                # was the center itself — noise-free queries biased the
                # measured recall optimistic
                noise = np.random.default_rng(
                    1_000_000_007 + int(i)
                ).standard_normal(DIM)
                rows.append((c + NOISE * noise / np.sqrt(DIM)).astype(np.float32))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [list(map(float, r)) for r in rows]}
            )

    spark.range(n).repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    from pyspark.sql import functions as F

    from studiocr_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        recall_at_k,
    )
    from studiocr_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 100_000]
    spark = get_spark(
        app_name="bench-ann", master="local[32]", shuffle_partitions=32
    )

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    for n in sizes:
        path = f"/tmp/ann_corpus_{n}"
        if not os.path.exists(path):
            make_corpus(spark, n, path)
        emb = spark.read.parquet(path)
        emb.count()
        q = emb.filter(F.col("vec_id") < N_QUERIES)

        # narrow buckets (12 planes -> 4096/table) + multiprobe: on a
        # clustered corpus same-cluster neighbors collide reliably while
        # candidates stay a few percent of the corpus
        dials = dict(dim=DIM, k=K, n_planes=12, n_tables=8, multiprobe=True)

        # warm both plans once on a sample so neither pays cold codegen
        force(brute_force_topk(q, emb.sample(0.05, seed=1), k=K, vectorized=True))
        force(lsh_topk(q, emb.sample(0.05, seed=1), **dials))

        t0 = time.time()
        exact = brute_force_topk(q, emb, k=K, vectorized=True)
        force(exact)
        brute_sec = time.time() - t0

        t0 = time.time()
        approx = lsh_topk(q, emb, **dials)
        force(approx)
        lsh_sec = time.time() - t0

        rec = recall_at_k(approx, exact).agg(
            F.avg("recall").alias("r")
        ).collect()[0].r
        print(
            json.dumps(
                {
                    "n": n,
                    "dim": DIM,
                    "k": K,
                    "queries": N_QUERIES,
                    "brute_sec": round(brute_sec, 2),
                    "lsh_sec": round(lsh_sec, 2),
                    "speedup": round(brute_sec / lsh_sec, 2),
                    "mean_recall": round(rec, 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
