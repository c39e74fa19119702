"""Benchmark decontamination: flag training docs overlapping an eval set.

Standard LLM-corpus hygiene (the n-gram-overlap decontamination used by
GPT-3/Llama-style training pipelines, public method): a training
document is contaminated when it shares at least ``min_shared`` distinct
word n-grams with any benchmark/eval document.

Scale shape — the part that matters at 100 TB: the EVAL side is small by
nature (benchmarks are thousands of docs, the corpus is billions), so
its shingle table is broadcast and the whole check is a NARROW
broadcast-hash join over the corpus shingle stream + a partial-agg
count: zero shuffles of corpus bytes (plan-pinned in
tests/test_decontam.py). The corpus side reuses the Arrow shingler from
the dedup family (one pass, no per-row Python). The broadcast is
GUARDED (round 4): when the eval table exceeds
``max_broadcast_eval_docs`` the join falls back to a plain shuffle join
instead of OOM-ing on a benchmark suite that is not actually small.

No reference counterpart (the reference is a desktop OCR app); the
operator belongs to the training-data-pipeline family alongside
dedup/textstats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table


def contamination_pairs(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    broadcast_eval: bool | None = None,
    max_broadcast_eval_docs: int = 50_000,
) -> DataFrame:
    """(doc_id, eval_id, shared_ngrams): training docs sharing at least
    ``min_shared`` distinct word ``n``-grams with an eval doc.

    Both sides shingle with the same tokenizer as the dedup family
    (distinct n-grams per doc), so ``shared_ngrams`` counts DISTINCT
    overlapping n-grams — a doc repeating one benchmark phrase ten
    times still counts it once.

    ``broadcast_eval`` guards the scale precondition: ``None`` (default)
    counts ``eval_docs`` (a cheap count on the benchmark table — no
    shingling) and broadcasts only when it has at most
    ``max_broadcast_eval_docs`` rows (50k eval docs x a few hundred
    n-grams each ~= low-hundreds-MB broadcast, the practical ceiling);
    past that it falls back to a plain shuffle join instead of
    OOM-ing the driver/executors. ``True``/``False`` force either path.
    """
    d = shingle_table(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col,
        n,
    ).select(F.col("doc_id").alias(id_col), "shingle")
    e = shingle_table(
        eval_docs.select(
            F.col(eval_id_col).alias("doc_id"), F.col(text_col)
        ),
        text_col,
        n,
    ).select(F.col("doc_id").alias(eval_id_col), "shingle")
    if broadcast_eval is None:
        broadcast_eval = eval_docs.count() <= max_broadcast_eval_docs
    return (
        d.join(F.broadcast(e) if broadcast_eval else e, "shingle")
        .groupBy(id_col, eval_id_col)
        .agg(F.count("*").cast("long").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """``docs`` minus every contaminated document (left-anti against the
    flagged ids). Keeps all caller columns."""
    flagged = contamination_pairs(
        docs, eval_docs, text_col, n, min_shared, id_col=id_col,
        broadcast_eval=broadcast_eval,
    ).select(id_col).distinct()
    return docs.join(flagged, id_col, "left_anti")
