"""Round-14 OPTIMIZATION pins — the operator internals this round
rewrote for fewer passes must stay exactly equal to what they replaced.

- twophase: offsets now come from one bounded driver collect re-entering
  the plan as a broadcast literal table (schema copied from the analyzed
  window formulation) — exactness, types, null groups, decimal values.
- build_ivf: driver-side numpy Lloyd's fit — deterministic under a seed,
  assignment argmin exactly nearest.
- graph._symmetrize_driver: the numpy twin of union+filter+distinct.
- merge._staged_write: survivors from the staged dir LISTING must equal
  the plan-side probe they replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.cache import release_caches


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def test_global_cumsum_decimal_exact_and_typed(spark):
    from python_vectordbapp_ceph_spark.operators.twophase import global_cumsum

    df = spark.createDataFrame(
        [(i, (i % 7) / 100) for i in range(500)], "id long, v double"
    ).withColumn("v", F.col("v").cast("decimal(18,2)"))
    out = global_cumsum(df, ["id"], "v", cum_col="cum", before_col="pre")
    # type parity with the replaced window formulation
    assert dict(out.dtypes)["cum"] == "decimal(38,2)"
    run = 0
    for r in out.orderBy("id").collect():
        assert r["pre"] == run
        run += r["v"]
        assert r["cum"] == run


def test_grouped_cumsum_null_group_rows_survive(spark):
    from python_vectordbapp_ceph_spark.operators.twophase import grouped_cumsum

    g = spark.createDataFrame(
        [(None if i % 3 == 0 else i % 2, i, 1) for i in range(90)],
        "grp int, id long, w int",
    )
    out = grouped_cumsum(g, ["grp"], ["id"], "w", cum_col="c")
    assert out.count() == 90  # NULL-group rows must not be dropped
    mx = {
        r["grp"]: r["m"]
        for r in out.groupBy("grp").agg(F.max("c").alias("m")).collect()
    }
    assert mx == {None: 30, 0: 30, 1: 30}


def test_global_ntile_matches_spark_ntile(spark):
    from pyspark.sql.window import Window
    from python_vectordbapp_ceph_spark.operators.twophase import global_ntile

    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(101)], "id long, v long"
    )
    got = {
        r["id"]: r["t"]
        for r in global_ntile(df, ["v", "id"], 4, "t").collect()
    }
    ref = {
        r["id"]: r["nt"]
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("nt")
        ).collect()
    }
    assert got == ref


def test_build_ivf_fit_is_seed_deterministic(spark):
    import numpy as np
    from python_vectordbapp_ceph_spark.operators.ivf import build_ivf

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.rand(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = build_ivf(df, nlist=4, seed=11)
    b = build_ivf(df, nlist=4, seed=11)
    assert a.centroids == b.centroids
    # assignment is the true argmin against the fitted centroids
    C = np.asarray(a.centroids)
    got = {r["vec_id"]: r["cluster_id"] for r in a.assigned.collect()}
    for vid, vec in rows:
        d = ((np.asarray(vec) - C) ** 2).sum(1)
        assert got[vid] == int(np.argmin(d))


def test_symmetrize_driver_equals_distributed_distinct(spark):
    import pandas as pd
    from python_vectordbapp_ceph_spark.operators.graph import (
        _symmetrize_driver,
    )

    # duplicates, self-loops, both orientations of one pair
    pairs = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4), (4, 5)]
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    ids, si, di = _symmetrize_driver(pdf)
    got = {(ids[a], ids[b]) for a, b in zip(si, di)}
    df = spark.createDataFrame(pairs, "src long, dst long")
    ref = {
        (r["src"], r["dst"])
        for r in df.union(
            df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter("src != dst")
        .distinct()
        .collect()
    }
    assert got == ref


def test_staged_write_listing_survivors_match_plan_probe(spark, tmp_path):
    from python_vectordbapp_ceph_spark.operators import merge as M

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(300)], "k long, v double"
    )
    path = str(tmp_path / "base")
    M.write_bucketed_base(df, path, "k", n_buckets=8)
    _, live = M.current_manifest(spark, path)
    # the listing-derived manifest keys must equal the plan-side probe
    probe = sorted(
        r["_kb"]
        for r in M._with_bucket(df, "k", 8).select("_kb").distinct().collect()
    )
    assert sorted(live.keys()) == probe
    # and a full read returns every row
    assert M.read_base(spark, path).count() == 300
