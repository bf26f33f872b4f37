"""Streaming CUSUM changepoint monitor — batch/stream unification by
COMPOSITION of two already-verified pieces:

  readStream → foreachBatch: each micro-batch's (series, day) counts
  fold into a delta-maintained aggregate view (operators/incremental:
  refresh cost ∝ the BATCH and the key buckets it touches, never the
  history — and the view write is the crash-atomic manifest commit of
  operators/merge) → reading the monitor resolves the view and runs
  the SAME CUSUM assembly the batch query uses
  (operators/changepoint.py).

So the continuously-ingesting answer is definitionally equal to
re-running q_cusum_changepoint over all events seen so far — pinned by
tests/test_assembly.py::test_streaming_cusum_equals_batch. This is the
regime-shift alarm a 100 TB ingest pipeline runs per source: state on
disk is one row per (series, day-bucket), the per-trigger work is one
micro-batch aggregate + a few bucket rewrites, and exactly-once comes
from the checkpointed foreachBatch + idempotent additive folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.changepoint import cusum_changepoints
from ..operators.incremental import apply_delta, init_agg_view, read_view


def init_monitor(
    spark: SparkSession, view_path: str, series_col: str = "event_type"
) -> None:
    """Create the empty (series, day) count view (schema sidecar makes
    a never-fed monitor readable)."""
    empty = spark.createDataFrame(
        [], f"{series_col} string, day string, value double"
    )
    init_agg_view(empty, [series_col, "day"], "value", view_path, n_buckets=16)


def monitor_stream(
    stream: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    series_col: str = "event_type",
    ts_col: str = "ts",
):
    """Fold the stream's per-day counts into the view; availableNow
    drains whatever is pending and stops (the test/batch-parity
    trigger — a production monitor uses a processing-time trigger)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        delta = batch.select(
            series_col,
            F.date_format(F.date_trunc("day", ts_col), "yyyy-MM-dd").alias("day"),
            F.lit(1.0).alias("value"),
            F.lit(1).alias("sign"),
        )
        apply_delta(
            batch.sparkSession, view_path, delta, [series_col, "day"],
            "value", n_buckets=16,
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_changepoints(
    spark: SparkSession, view_path: str, series_col: str = "event_type"
) -> DataFrame:
    """Current changepoints from the maintained view — same assembly
    as the batch query, over cnt (the maintained per-bucket count)."""
    daily = read_view(spark, view_path).select(
        series_col, "day", F.col("cnt").alias("c")
    )
    return cusum_changepoints(daily, series_col, "day", "c")
