"""Progress/observability: the reference's per-page progress pipe (A8).

OcrWorker.py:89-93 streams ``processed/total*100`` per page over a Pipe
to the GUI. The Spark equivalents, zero extra passes:

- ``observed(df, name)``: attach a CollectMetrics node; after the action,
  ``Observation.get`` yields row/byte counters computed DURING the job.
- ``ProgressListener``: a SparkListener printing per-stage task completion
  ratios — the live "%" feed for a driver console.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str = "progress"
) -> tuple[DataFrame, Observation]:
    """Attach standard extraction counters; read obs.get after an action.

    Metrics: rows, urls (approx — DISTINCT is disallowed in observed
    metrics), error rows (quarantine count when the column exists).
    """
    obs = Observation(name)
    metrics = [
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct("url").alias("urls_approx"),
    ]
    if "error" in df.columns:
        metrics.append(
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("errors")
        )
    return df.observe(obs, *metrics), obs


class ProgressPoller:
    """Poll-based progress feed via the status tracker (portable across
    Spark builds — no py4j listener interface needed)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def snapshot(self) -> dict:
        """Active stages with completed/total tasks and a percent."""
        tracker = self.spark.sparkContext.statusTracker()
        out = {}
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info:
                total = info.numTasks or 1
                out[sid] = {
                    "completed": info.numCompletedTasks,
                    "total": info.numTasks,
                    "pct": round(100.0 * info.numCompletedTasks / total, 1),
                }
        return out
