"""Benchmark decontamination: planted-overlap semantics + scale plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from studiocr_spark.operators.decontam import (
    contamination_pairs,
    decontaminate,
)


def _frames(spark):
    train = spark.createDataFrame(
        [
            # shares the full benchmark sentence -> many 3-grams
            (100, "the quick brown fox jumps over the lazy dog today"),
            # shares exactly one 3-gram ("quick brown fox") -> below floor
            (101, "a quick brown fox appeared in my garden yesterday"),
            # no overlap at all
            (102, "completely unrelated text about spark partitions"),
            # repeats one benchmark phrase many times -> still ONE
            # distinct shared 3-gram (distinct-shingle semantics)
            (103, "lazy dog today lazy dog today lazy dog today"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "eval_id long, text string",
    )
    return train, ev


def test_contamination_pairs_distinct_ngram_semantics(spark):
    train, ev = _frames(spark)
    got = {
        r.doc_id: r.shared_ngrams
        for r in contamination_pairs(train, ev, n=3, min_shared=2).collect()
    }
    # doc 100: 8 shared 3-grams; 101: 1 (< floor); 103: "lazy dog today"
    # once despite 3 repetitions (distinct) -> < floor
    assert got == {100: 8}

    kept = decontaminate(train, ev, n=3, min_shared=2)
    assert sorted(r.doc_id for r in kept.collect()) == [101, 102, 103]
    assert kept.columns == train.columns


def test_eval_side_broadcasts_corpus_stays_narrow(spark):
    """The benchmark side must ride a BroadcastHashJoin on shingle; the
    only shuffle in the plan is the final per-(doc, eval) count agg —
    corpus shingles never exchange before the join."""
    from studiocr_spark.plans.explain import (
        formatted_plan,
        shuffle_exchanges,
    )

    train, ev = _frames(spark)
    df = contamination_pairs(train, ev, n=3, min_shared=2)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert len(shuffle_exchanges(df)) == 1, plan


def test_large_eval_side_falls_back_to_shuffle_join(spark):
    """Round-4 guard: past max_broadcast_eval_docs the eval side takes a
    plain shuffle join (no broadcast hint in the optimized plan) and the
    results are identical to the broadcast path."""
    from studiocr_spark.plans.explain import formatted_plan

    train, ev = _frames(spark)
    df = contamination_pairs(
        train, ev, n=3, min_shared=2, max_broadcast_eval_docs=0
    )
    # the hint must be ABSENT from the optimized logical plan (Catalyst
    # may still cost-pick a broadcast at this toy scale — that's fine)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, opt
    got = {r.doc_id: r.shared_ngrams for r in df.collect()}
    assert got == {100: 8}
    # forced-True override keeps the original single-shuffle shape
    forced = contamination_pairs(
        train, ev, n=3, min_shared=2, broadcast_eval=True
    )
    assert "BroadcastHashJoin" in formatted_plan(forced)


def test_contamination_pairs_custom_id_cols(spark):
    """Round-4 ADVICE fix: non-default id_col/eval_id_col must resolve
    (previously shingle_table hard-coded doc_id and groupBy(id_col)
    threw an unresolved-column error)."""
    train, ev = _frames(spark)
    got = {
        (r.url, r.bench_id): r.shared_ngrams
        for r in contamination_pairs(
            train.withColumnRenamed("doc_id", "url"),
            ev.withColumnRenamed("eval_id", "bench_id"),
            n=3,
            min_shared=2,
            id_col="url",
            eval_id_col="bench_id",
        ).collect()
    }
    assert got == {(100, 1): 8}
