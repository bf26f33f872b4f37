"""KMV (k-minimum-values / bottom-k) theta sketch — the set-operation
member of the sketch family (HLL unions distinct counts, CMS answers
point frequencies, Misra-Gries finds heavy hitters; KMV is the one
that estimates INTERSECTIONS, which HLL cannot without inclusion-
exclusion — and here it powers exactly that, with every term a
deterministic function of the data).

Beeyer et al. 2007 / Apache DataSketches "theta" construction: hash
every key with xxhash64, keep the k smallest hash values per set.
With u_k the k-th smallest hash mapped to [0,1), the distinct count
estimate is (k−1)/u_k (the unbiased KMV estimator); a union sketch is
the k smallest of the merged candidate set, and the intersection
estimate follows by inclusion-exclusion. Everything is exact integer/
decimal arithmetic on the 64-bit hash values — xxhash64 is
deterministic, the bottom-k set is order-independent, so the whole
estimate is reproducible bit-for-bit under any partitioning (pytest-
pinned), even though it is an ESTIMATE of the true cardinality
(rows-only; accuracy bound also pytest-pinned).

Scale shape: one hash aggregate per set key dedups (set, hash) pairs
map-side, a per-set bottom-k (rank window partitioned BY SET, k rows
out — WindowGroupLimit pushes the cut map-side), and everything after
operates on ≤ k rows per set: kilobytes at any corpus size, and
sketches persist/merge across batches like the HLL and CMS tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# map signed xxhash64 to its unsigned order: u = h + 2^63 ∈ [0, 2^64)
_OFFSET = "9223372036854775808"  # 2^63
_FULL = "18446744073709551616"  # 2^64


def kmv_sketch(df: DataFrame, set_col: str, key_col: str, k: int) -> DataFrame:
    """Bottom-k sketch per set: (set_col, u) with u the k smallest
    unsigned-order xxhash64 values of the set's DISTINCT keys."""
    hashed = df.select(
        F.col(set_col).alias("_set"),
        F.expr(
            f"CAST(xxhash64({key_col}) AS DECIMAL(38,0)) + {_OFFSET}"
        ).alias("u"),
    ).distinct()
    w = Window.partitionBy("_set").orderBy("u")
    return (
        hashed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(F.col("_set").alias(set_col), "u", "_rk")
    )


def kmv_estimate(sketch: DataFrame, set_col: str, k: int) -> DataFrame:
    """Distinct-count estimate per set: (k−1)·2^64 div u_k, or the
    EXACT sketch size when the set had fewer than k distinct keys
    (the sketch then holds every key and is not an estimate)."""
    agg = sketch.groupBy(set_col).agg(
        F.max(F.when(F.col("_rk") == k, F.col("u"))).alias("_uk"),
        F.count(F.lit(1)).alias("_n"),
    )
    return agg.select(
        set_col,
        F.when(
            F.col("_uk").isNotNull(),
            F.expr(f"CAST(({k - 1} * CAST({_FULL} AS DECIMAL(38,0))) div _uk AS BIGINT)"),
        )
        .otherwise(F.col("_n"))
        .alias("est_distinct"),
    )


def kmv_union(a: DataFrame, b: DataFrame, set_col: str, k: int) -> DataFrame:
    """Union sketch: bottom-k of the merged candidate sets (labelled
    '_union_'). Candidates are ≤ 2k rows — driver-free, shuffle on a
    constant."""
    cand = (
        a.select("u").unionByName(b.select("u")).distinct()
        .select(F.lit("_union_").alias(set_col), "u")
    )
    w = Window.partitionBy(set_col).orderBy("u")
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
