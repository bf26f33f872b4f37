"""Exact two-pass heavy hitters (operators/heavyhitters.py): the
Misra-Gries candidate phase must never lose a true heavy hitter
(pigeonhole containment), and the final answer must equal the plain
GROUP BY … HAVING result under every partitioning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.heavyhitters import (
    _mg_partition,
    heavy_hitters,
)

from conftest import rows_set


def _exact(df, col, k):
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
        .select(
            col,
            "cnt",
            F.expr(f"cnt * 1000000 DIV {total}").alias("share_ppm"),
        )
    )


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key_i appears ~ 2000/(i+1) times → a handful of heavy
    # keys over a long tail, deterministic construction
    df = spark.range(0, 60).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.lit(2000) / (F.col("id") + 1)).cast("int")),
                lambda i: F.concat(F.lit("k"), F.col("id").cast("string")),
            )
        ).alias("key")
    )
    return df.localCheckpoint(eager=True)


@pytest.mark.parametrize("nparts", [1, 3, 13])
@pytest.mark.parametrize("k", [10, 50])
def test_matches_exact_under_any_partitioning(spark, skewed, nparts, k):
    df = skewed.repartition(nparts)
    got = heavy_hitters(df, "key", k=k)
    assert rows_set(got) == rows_set(_exact(df, "key", k))
    assert got.count() > 0  # the fixture plants heavy keys above 1/k


def test_mg_batched_reduction_containment():
    # feed the partition kernel many small batches; a key holding a
    # strict majority must survive the k=2 summary (MG guarantee)
    batches = [
        pd.DataFrame({"_hh_key": ["hot"] * 6 + [f"t{i}{j}" for j in range(4)]})
        for i in range(25)
    ]
    out = next(_mg_partition(iter(batches), k=2))
    cands = set(out["_hh_key"].dropna())
    assert "hot" in cands
    assert len(cands) <= 2
    # the NULL row carries the exact partition count
    assert out.loc[out["_hh_key"].isna(), "_hh_n"].sum() == 250


def test_null_keys_ignored(spark):
    df = spark.range(0, 100).select(
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.concat(F.lit("v"), (F.col("id") % 3).cast("string")))
        .alias("key")
    )
    got = heavy_hitters(df, "key", k=5)
    # N counts only non-null keys (75), each of v0/v1/v2 has 25 = 1/3 > 1/5
    rows = {r["key"]: (r["cnt"], r["share_ppm"]) for r in got.collect()}
    assert set(rows) == {"v0", "v1", "v2"}
    assert all(c == 25 and p == 333333 for c, p in rows.values())
