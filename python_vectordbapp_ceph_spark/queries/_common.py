"""Shared helpers for driver-facing queries.

Centralizes the two determinism conventions:
  - ``T()`` loads a table via io.load_table (which handles the nanos
    parquet) and pins the session timezone to UTC so timestamp
    rendering matches DuckDB's naive-timestamp semantics even under
    the driver's own SparkSession.
  - ``dec2()`` casts the 2-decimal money doubles to DECIMAL(18,2) so
    aggregation is exact and order-insensitive in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


def widen(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Small-input parallelism floor ahead of a per-row fan-out stage.

    A small-SF fixture table arrives as ONE parquet split (one row
    group), so everything narrow that follows — pair expansion against
    broadcast probes, shingle/token explosion, per-row distance math —
    runs on a single core while the other 31 idle; that is where most
    of the batch-KNN/LSH wall at sf0.1 went (measured 6-9x on
    q_knn_outliers' distance stage). Round-robin repartition of the
    SMALL side costs one exchange of those few thousand rows and buys
    full-cluster parallelism for the expensive stage.

    Scale-safe by the guard: at 100 TB the scan already has more
    splits than ``defaultParallelism``, so this returns the input
    unchanged and adds NO shuffle. Only apply it to inputs that are
    small by construction (fixture scans, capped samples, post-limit
    probe sets) — never to the unbounded side of a plan.

    Value-set neutral: round-robin assignment changes which worker
    computes a row, never the row itself; every caller aggregates
    exactly (counts, hashes, decimals) or ranks by explicit
    deterministic keys, so oracle hashes are unaffected.
    """
    sc = df.sparkSession.sparkContext
    target = parts or sc.defaultParallelism
    # probe the FILE INDEX, not df.rdd: the RDD conversion plans the
    # whole query to RDD form just to read a partition count and sits
    # as an analysis barrier AQE cannot see through (same probe as
    # operators/dedup._spread)
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= target:
        return df
    if not files:
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:
            pass
    return df.repartition(target)


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def ts_str(col: Column | str) -> Column:
    """Second-granularity timestamp → string (window starts etc.)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
