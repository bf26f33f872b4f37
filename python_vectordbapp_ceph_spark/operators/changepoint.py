"""CUSUM changepoint assembly over a (series, bucket, count) table.

The detector: per series, the bucket where the cumulative share
deviates most from the uniform-time share — argmax over
|cum_i·n − i·total|, reported in integer ppm of total·n. Exact
integer/decimal arithmetic throughout (decimal(38,0) BEFORE the
products — cum reaches `total`, and n·total·10⁶ overflows int64 well
inside the 100 TB regime).

Shared by the batch query (queries/assembly.py::q_cusum_changepoint)
and the streaming monitor (streaming/changepoint.py), so the two
surfaces cannot drift: the stream maintains the daily-count table
incrementally and THIS assembly turns it into changepoints either way.

Windows are PARTITIONED by the series key over bucket-count-bounded
rows (≤ one row per bucket per series after the upstream aggregate) —
never a corpus-sized window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cusum_changepoints(
    daily: DataFrame,
    series_col: str = "event_type",
    bucket_col: str = "day",
    count_col: str = "c",
) -> DataFrame:
    """(series, change_bucket, dev_ppm): the max-deviation bucket per
    series, ties broken on the earliest bucket."""
    d38 = "decimal(38,0)"
    wt = Window.partitionBy(series_col)
    wo = wt.orderBy(bucket_col)
    s = daily.select(
        series_col,
        bucket_col,
        F.sum(count_col)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.row_number().over(wo).alias("i"),
        F.sum(count_col).over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("nd"),
    )
    dev = s.select(
        series_col,
        bucket_col,
        F.abs(
            F.col("cum").cast(d38) * F.col("nd")
            - F.col("i").cast(d38) * F.col("total")
        ).alias("_d"),
        (F.col("total").cast(d38) * F.col("nd")).alias("_denom"),
    )
    r = dev.select(
        series_col,
        bucket_col,
        # integral `div`, not decimal `/` + cast: decimal division
        # rounds HALF_UP at scale 6 before the truncating cast, so a
        # true quotient with fractional part ≥ .9999995 would come out
        # one higher than DuckDB's exact `//` floor
        F.expr("CAST((_d * 1000000) div _denom AS BIGINT)").alias("dev_ppm"),
        F.row_number()
        .over(
            Window.partitionBy(series_col).orderBy(F.col("_d").desc(), bucket_col)
        )
        .alias("_rnk"),
    )
    return (
        r.filter(F.col("_rnk") == 1)
        .select(
            series_col,
            F.col(bucket_col).alias(f"change_{bucket_col}"),
            "dev_ppm",
        )
        .orderBy(series_col)
    )
