"""Count-Min Sketch over a key column — the third sketch in the
family (HLL counts distincts, freqItems finds heavy hitters, CMS
answers "how often does THIS key occur" in sublinear space).

Spark has no CMS builtin at the DataFrame level; this one is pure
DataFrame ops: ``depth`` independent xxhash64 functions bucket every
key into ``width`` counters, one hash-aggregate per build. The sketch
table is depth×width rows — kilobytes — so probes are a broadcast
join, and two sketches built with the same (depth, width, seeds)
merge by summing counters (a union + re-aggregate), which is what
makes CMS the scale tool: per-partition/per-day sketches roll up
without rescanning, exactly like the HLL union path (q_hll_union).

Estimate = min over the depth rows of the probed counters. Guarantees
(Cormode & Muthukrishnan 2005): never underestimates; overestimates by
at most εN with probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉ —
both properties pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, d, width: int):
    # the d-th hash function is xxhash64 over the (key, d) pair —
    # appending the row index yields depth independent functions;
    # pmod (not %) keeps buckets non-negative. ``d`` may be a literal
    # int (build side) or an int column (probe side) — both hash
    # identically as an int32 tuple element.
    dcol = F.lit(d) if isinstance(d, int) else d
    return F.pmod(F.xxhash64(col, dcol.cast("int")), F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 5, width: int = 256
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) — depth×width counters.
    One shuffle (the hash aggregate); map-side combine collapses each
    partition to ≤ depth×width partial rows regardless of input size."""
    rows = [
        df.select(
            F.lit(d).alias("d"),
            _bucket(F.col(key_col), d, width).alias("bucket"),
        )
        for d in range(depth)
    ]
    unioned = rows[0]
    for r in rows[1:]:
        unioned = unioned.unionByName(r)
    return unioned.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shaped sketches: counters add."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str,
    depth: int = 5, width: int = 256,
) -> DataFrame:
    """Estimated count per probe key: min over the depth counters.
    The sketch broadcasts (depth×width rows); missing buckets count 0."""
    exploded = probes.select(
        key_col,
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).withColumn("bucket", _bucket(F.col(key_col), F.col("d"), width))
    joined = exploded.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est_count"))
