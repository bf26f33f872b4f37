"""Equi-width histogram sketch — the mergeable QUANTILE summary
rounding out the sketch family (HLL distincts, CMS frequencies, Bloom
membership, histogram distributions). approx_percentile answers one
query in one pass but its sketch is not exposed for re-rollup; a
binned histogram is: per-partition/per-day histograms merge by bin
addition and then answer any quantile by cumulative interpolation —
the same materialize-once-roll-up-forever contract as q_hll_union.

All exact integer bin counts (one hash aggregate, ≤ n_bins rows);
the only approximation is within-bin linear interpolation, so the
quantile error is bounded by one bin width — pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hist_build(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 64
) -> DataFrame:
    """(bin, cnt) for col clamped to [lo, hi] — one map-side-combined
    aggregate, bounded by n_bins rows."""
    w = (hi - lo) / n_bins
    x = F.col(col).cast("double")
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((x - F.lit(lo)) / F.lit(w)).cast("int")),
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    hist: DataFrame, q: float, lo: float, hi: float, n_bins: int = 64
) -> float:
    """Quantile estimate by cumulative interpolation. The histogram is
    ≤ n_bins rows — driver-side by construction, like a codebook."""
    rows = sorted((r.bin, r.cnt) for r in hist.collect())
    total = sum(c for _, c in rows)
    if total == 0:
        raise ValueError("empty histogram")
    w = (hi - lo) / n_bins
    target = q * total
    cum = 0
    for b, c in rows:
        if cum + c >= target:
            frac = (target - cum) / c if c else 0.0
            return lo + (b + frac) * w
        cum += c
    return hi
