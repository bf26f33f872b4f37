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


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def ts_str(col: Column | str) -> Column:
    """Second-granularity timestamp → string (window starts etc.)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
