"""Two-phase (distributed) global running sums.

Spark executes an UNPARTITIONED `Window.orderBy(...)` on a single
task — range partitioning applies to global SORTS, not windows — so
any global cumulative sum written naively caps the operator at one
task's memory. Histograms over rounded scores are "bounded by value
cardinality", but a heavy-tailed continuous column (raw doc lengths at
100 TB) can still push that histogram to 10⁸ rows; vocabulary tables
grow with the corpus outright. The distributed answer is the classic
two-phase rank (used by q_shuffle_order since r6, generalized here):

  1. range-repartition on the order key — one sampled wide exchange;
     each partition owns a contiguous key range (persisted, so both
     passes see the SAME partitioning);
  2. per-partition partial masses → cumulative prefix offsets via a
     window over ≤num-partitions rows (the ONLY single-partition
     window, bounded by cluster width, never by data);
  3. broadcast the offsets back and add a WITHIN-partition running
     sum.

Every phase is bounded by a single partition's slice of the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import tracked_persist


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str | Column,
    cum_col: str | None = "cum",
    before_col: str | None = None,
) -> DataFrame:
    """``df`` plus distributed global running sum(s) of ``val_col`` in
    ``order_cols`` order: ``cum_col`` includes the current row,
    ``before_col`` is the strictly-preceding sum (either may be None
    to skip). ``order_cols`` accepts names or Columns (e.g.
    ``F.col("freq").desc()``) and must be a TOTAL order for the
    result to be deterministic.

    The caller's ``df`` is persisted (tracked_persist) to pin the
    sampled range boundaries; release via cache.release_caches() as
    usual."""
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    spark = df.sparkSession
    npart = max(spark.sparkContext.defaultParallelism, 2)
    parts = tracked_persist(
        df.repartitionByRange(npart, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    partials = parts.groupBy("_pid").agg(F.sum(val).alias("_mass"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_pid",
        F.coalesce(F.sum("_mass").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    out = parts.join(F.broadcast(offsets), "_pid")
    if cum_col is not None:
        out = out.withColumn(
            cum_col,
            F.col("_off")
            + F.sum(val).over(
                w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    if before_col is not None:
        out = out.withColumn(
            before_col,
            F.col("_off")
            + F.coalesce(
                F.sum(val).over(w_in.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    return out.drop("_pid", "_off")


def grouped_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    val_col: str | Column,
    cum_col: str | None = "cum",
    before_col: str | None = None,
) -> DataFrame:
    """Per-group distributed running sum for the FEW-GROUPS-EACH-LARGE
    regime — the case where ``Window.partitionBy(group)`` is no better
    than an unpartitioned window because one group holds O(n) rows
    (length buckets, source shards, label classes). Many-small-groups
    data should use a plain partitioned window instead; this variant's
    offset table is #groups × #partitions rows and is broadcast, so it
    assumes bounded group cardinality.

    Same three phases as :func:`global_cumsum`, with the group key
    prefixed to the range-partitioning key so each partition owns a
    contiguous (group, key) slice; prefix offsets accumulate per group
    over the ≤num-partitions slices that group spans. ``group_cols``
    must be column NAMES (they key the broadcast equi-join back)."""
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    spark = df.sparkSession
    npart = max(spark.sparkContext.defaultParallelism, 2)
    gcols = [F.col(g) for g in group_cols]
    parts = tracked_persist(
        df.repartitionByRange(npart, *gcols, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    partials = parts.groupBy(*group_cols, "_pid").agg(F.sum(val).alias("_mass"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        *group_cols,
        "_pid",
        F.coalesce(F.sum("_mass").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    # NULL-SAFE equi-join back: a list-of-names join uses null-unsafe
    # equality, so every row whose group key is NULL would match
    # nothing and be silently DROPPED from the output (the window
    # phases above treat NULL as an ordinary group value — the join
    # must too)
    off = offsets.select(
        *[F.col(g).alias(f"_og{i}") for i, g in enumerate(group_cols)],
        F.col("_pid").alias("_opid"),
        "_off",
    )
    cond = parts["_pid"] == off["_opid"]
    for i, g in enumerate(group_cols):
        cond = cond & parts[g].eqNullSafe(off[f"_og{i}"])
    out = parts.join(F.broadcast(off), cond).drop(
        "_opid", *[f"_og{i}" for i in range(len(group_cols))]
    )
    if cum_col is not None:
        out = out.withColumn(
            cum_col,
            F.col("_off")
            + F.sum(val).over(
                w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    if before_col is not None:
        out = out.withColumn(
            before_col,
            F.col("_off")
            + F.coalesce(
                F.sum(val).over(w_in.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    return out.drop("_pid", "_off")


def global_ntile(
    df: DataFrame, order_cols: list, n_tiles: int, out_col: str
) -> DataFrame:
    """``df`` plus EXACT ``ntile(n_tiles)`` over the global
    ``order_cols`` total order — without the unpartitioned
    data-cardinality window the naive `ntile().over(Window.orderBy())`
    plans: the global rank comes from the two-phase cumsum of 1, and
    the tile index is the closed form of ntile's bucket sizing (the
    first n MOD t buckets take CEIL(n/t) rows, the rest FLOOR(n/t) —
    identical to Spark's and DuckDB's ntile). The row count reaches
    the plan as a broadcast 1-row scalar, never the driver."""
    ranked = global_cumsum(df, order_cols, F.lit(1), cum_col="_rnk")
    # n == max(_rnk) off the PERSISTED ranked frame — counting df
    # directly would recompute its entire upstream lineage just for
    # the scalar (q_rfm chains three global_ntile calls; the third
    # would re-run two stacked cumsums for a count)
    tot = ranked.agg(
        F.coalesce(F.max("_rnk"), F.lit(0)).cast("long").alias("_n")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("_q", F.expr(f"_n div {n_tiles}"))
        .withColumn("_r", F.expr(f"_n % {n_tiles}"))
        .withColumn("_big", F.expr("_r * (_q + 1)"))
        .withColumn(
            out_col,
            # CASE short-circuits per row, so the _q=0 (n < n_tiles)
            # case never evaluates the ELSE branch's div _q
            F.expr(
                "CAST(CASE WHEN _rnk <= _big THEN (_rnk - 1) div (_q + 1) + 1"
                " ELSE _r + (_rnk - _big - 1) div _q + 1 END AS INT)"
            ),
        )
        .drop("_rnk", "_n", "_q", "_r", "_big")
    )
