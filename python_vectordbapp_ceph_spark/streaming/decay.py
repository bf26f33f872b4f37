"""Streaming half-life decay monitor — the trending/recency signal a
100 TB ingest pipeline keeps continuously, by the same composition as
the CUSUM monitor (streaming/changepoint.py):

  readStream → foreachBatch: each micro-batch folds its per-(series,
  half-life-bucket) count + micro-value sums into a delta-maintained
  aggregate view (operators/incremental — refresh cost ∝ the batch and
  the buckets it touches; writes are crash-atomic manifest commits) →
  reading the monitor runs operators/decay.py's SAME bucket-anchored
  assembly the batch twin uses.

So the continuously-ingesting answer is definitionally equal to
re-running the bucket-anchored decay over all events seen so far
(pinned by tests/test_round8_late.py::test_streaming_decay_equals_batch,
including weight saturation past the cap). State is one additive row
per (series, half-life bucket) — types × a slowly-growing handful of
periods — and time advancing never rewrites it: the anchor is resolved
at READ time, which is exactly why the assembly anchors on buckets
instead of the batch query's max-timestamp instant (the documented
grain difference between q_decay_halflife and this monitor).
Exactly-once comes from the checkpointed foreachBatch + idempotent
additive folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decay import HL_US, decayed_bucket_totals
from ..operators.incremental import apply_delta, init_agg_view, read_view


def init_monitor(
    spark: SparkSession, view_path: str, series_col: str = "event_type"
) -> None:
    """Create the empty (series, bucket) view (schema sidecar keeps a
    never-fed monitor readable)."""
    empty = spark.createDataFrame(
        [], f"{series_col} string, b long, value double"
    )
    init_agg_view(empty, [series_col, "b"], "value", view_path, n_buckets=16)


def monitor_stream(
    stream: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Fold the stream into the view; availableNow drains pending
    input and stops (the test/batch-parity trigger — production uses
    a processing-time trigger). ``ts_col`` must be an instant
    TIMESTAMP (the ingest path normalizes, like queries/_common.T)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        delta = batch.select(
            series_col,
            F.expr(f"unix_micros({ts_col}) div {HL_US}L").alias("b"),
            # integral micro units ride the view's decimal sum exactly
            F.floor(F.col(value_col) * F.lit(1000000.0))
            .cast("double")
            .alias("value"),
            F.lit(1).alias("sign"),
        )
        apply_delta(
            batch.sparkSession, view_path, delta, [series_col, "b"],
            "value", n_buckets=16,
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_decayed(
    spark: SparkSession, view_path: str, series_col: str = "event_type"
) -> DataFrame:
    """Current per-series decayed totals from the maintained view —
    the same assembly as the batch twin, over state-sized input."""
    v = read_view(spark, view_path)
    return decayed_bucket_totals(
        v, series_col, "b", "cnt", total_col="total"
    )
