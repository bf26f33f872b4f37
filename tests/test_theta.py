"""KMV/theta sketch invariants (operators/theta.py): deterministic
under partitioning, exact when the set is smaller than k, and the
estimator lands within the KMV error envelope on sets ≫ k."""

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.theta import (
    kmv_estimate,
    kmv_sketch,
    kmv_union,
)


@pytest.fixture(scope="module")
def two_sets(spark):
    # set A = ids 0..4999, set B = ids 3000..9999 → |A|=5000, |B|=7000,
    # |A∪B|=10000, |A∩B|=2000; deterministic construction
    a = spark.range(0, 5000).select(F.lit("a").alias("s"), F.col("id"))
    b = spark.range(3000, 10000).select(F.lit("b").alias("s"), F.col("id"))
    return a.unionByName(b).localCheckpoint(eager=True)


def _ests(df, k):
    sk = kmv_sketch(df, "s", "id", k)
    a = sk.filter(F.col("s") == "a")
    b = sk.filter(F.col("s") == "b")
    union = kmv_union(a, b, "s", k)
    rows = kmv_estimate(sk.unionByName(union), "s", k).collect()
    return {r["s"]: r["est_distinct"] for r in rows}


@pytest.mark.parametrize("nparts", [1, 7])
def test_partitioning_invariant(spark, two_sets, nparts):
    assert _ests(two_sets.repartition(nparts), 64) == _ests(two_sets, 64)


def test_estimates_within_kmv_envelope(spark, two_sets):
    k = 256
    e = _ests(two_sets, k)
    # KMV relative standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 RSE
    for s, truth in (("a", 5000), ("b", 7000), ("_union_", 10000)):
        assert abs(e[s] - truth) / truth < 0.25, (s, e[s])
    inter = e["a"] + e["b"] - e["_union_"]
    assert abs(inter - 2000) < 2000  # inclusion-exclusion compounds RSE


def test_exact_below_k(spark):
    # 40 distinct keys with k=64: the sketch holds every key → exact,
    # regardless of row duplication
    df = (
        spark.range(0, 40)
        .select(F.lit("s").alias("s"), (F.col("id") % 40).alias("id"))
        .unionByName(
            spark.range(0, 400).select(
                F.lit("s").alias("s"), (F.col("id") % 40).alias("id")
            )
        )
    )
    sk = kmv_sketch(df, "s", "id", 64)
    assert sk.count() == 40
    e = kmv_estimate(sk, "s", 64).collect()[0]["est_distinct"]
    assert e == 40


def test_union_sketch_is_bottom_k_of_merge(spark, two_sets):
    k = 32
    sk = kmv_sketch(two_sets, "s", "id", k)
    a = sk.filter(F.col("s") == "a")
    b = sk.filter(F.col("s") == "b")
    union = kmv_union(a, b, "s", k)
    got = sorted(r["u"] for r in union.collect())
    merged = sorted(
        {r["u"] for r in a.collect()} | {r["u"] for r in b.collect()}
    )[:k]
    assert got == merged
