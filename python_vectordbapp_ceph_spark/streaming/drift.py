"""Streaming drift monitor: per-micro-batch categorical TVD against a
frozen reference distribution, appended to a monitor table.

The in-flight twin of the batch drift queries (q_dist_shift's TVD,
q_ks_drift's KS): a training-data ingest stream should REJECT or flag
a drop of data whose source/language/length mix departs from the
accepted reference before it lands in the corpus, not in a nightly
audit. foreachBatch is the right primitive because the comparison
needs the WHOLE micro-batch histogram (an arbitrary-state aggregate
per batch, then a join against a static table — exactly what
foreachBatch exists for).

Determinism discipline matches the batch tier: reference shares and
batch shares compare through exact integer cross-multiplication
(cnt_b * n_ref vs cnt_ref * n_b), TVD reported in integer ppm —
2 * TVD_ppm = Σ |cnt_b·n_ref − cnt_ref·n_b| · 1e6 / (n_b·n_ref).

Scale: the per-batch aggregate is map-side combinable; the reference
histogram is category-cardinality-sized and broadcast; the monitor
append is one row per (batch, nothing else). Nothing about the
monitor touches the corpus write path, so it composes with any sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_tvd_ppm(batch: DataFrame, ref_hist: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame (n_rows, tvd_ppm) for a (micro-)batch vs a
    reference histogram (col, cnt). Exact integer arithmetic: the sum
    over the UNION of categories of |share_b − share_ref| clears
    denominators via cross-multiplication. Categories absent from one
    side contribute their full share on the other (outer join +
    zero-fill), so novel categories register as drift instead of
    being dropped."""
    b = batch.groupBy(col).agg(F.count(F.lit(1)).alias("cnt_b"))
    r = ref_hist.select(col, F.col("cnt").alias("cnt_r"))
    j = (
        b.join(r, col, "full_outer")
        .select(
            F.coalesce(F.col("cnt_b"), F.lit(0)).alias("cb"),
            F.coalesce(F.col("cnt_r"), F.lit(0)).alias("cr"),
        )
    )
    # Σ|cb·nr − cr·nb| needs the totals first — one scalar agg over the
    # category-sized join, broadcast back for a second tiny pass
    tot = j.agg(F.sum("cb").alias("nb"), F.sum("cr").alias("nr"))
    tot_row = j.crossJoin(F.broadcast(tot)).agg(
        F.max("nb").alias("nb"),
        F.max("nr").alias("nr"),
        F.sum(
            F.abs(
                F.col("cb").cast("decimal(38,0)") * F.col("nr")
                - F.col("cr").cast("decimal(38,0)") * F.col("nb")
            )
        ).alias("d"),
    )
    return tot_row.select(
        F.col("nb").alias("n_rows"),
        F.when(
            (F.col("nb") > 0) & (F.col("nr") > 0),
            (
                F.col("d") * 1000000
                / (2 * F.col("nb").cast("decimal(38,0)") * F.col("nr"))
            ).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("tvd_ppm"),
    )


def drift_monitor_stream(
    stream: DataFrame,
    ref_hist: DataFrame,
    col: str,
    monitor_path: str,
    checkpoint_dir: str,
):
    """Attach the monitor to a stream: every micro-batch appends one
    (batch_id, n_rows, tvd_ppm) row to ``monitor_path``. Returns the
    StreamingQuery. The caller alerts on tvd_ppm thresholds (e.g.
    reject the batch's object keys when tvd_ppm > 200_000)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        row = batch_tvd_ppm(batch, ref_hist, col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        row.select("batch_id", "n_rows", "tvd_ppm").write.mode(
            "append"
        ).parquet(monitor_path)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
