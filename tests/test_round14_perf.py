"""Regression pins for the round-14 performance changes.

  1. `queries/_common.widen` — the single-split parallelism floor —
     must repartition a below-parallelism input and be a clean NO-OP
     (same plan object) once the input already has at least one
     split per core: the guard is what makes the floor scale-safe.
  2. q_fuzzy_join's thresholded levenshtein: for every KEPT pair the
     banded DP must return the exact distance the unthresholded
     expression computes, and the pair set must be identical.
  3. embedding_near_dups' precomputed-norm cosine must be
     BIT-identical to the inline cosine_similarity expression on the
     same pairs (the norm is the same per-row fold; only the number
     of evaluations changed).
  4. The adaptive block salt must never change the pair set: any salt
     factor yields the same (id_a, id_b, cosine) rows, and
     _auto_salt_factor degenerates to 1 when blocks outnumber cores.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.functions import vector as V
from python_vectordbapp_ceph_spark.operators.dedup import (
    _auto_salt_factor,
    embedding_near_dups,
)
from python_vectordbapp_ceph_spark.queries._common import widen


def _vec_rows(n=60, dim=8, labels=3, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (i, f"lab{i % labels}",
             [round(rng.uniform(-2, 2), 6) for _ in range(dim)])
        )
    # a zero vector exercises the NULL-on-zero-norm branch
    rows.append((n, "lab0", [0.0] * dim))
    return rows


def test_widen_repartitions_below_floor(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    df1 = df.coalesce(1)
    out = widen(df1, parts=8)
    assert out.rdd.getNumPartitions() == 8
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_widen_noop_when_already_parallel(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    df8 = df.repartition(8)
    out = widen(df8, parts=4)
    # the guard must return the INPUT untouched — no extra exchange
    assert out is df8


def test_thresholded_levenshtein_matches_exact_on_kept_pairs(spark):
    words = ["spring green", "spring greene", "sprint green",
             "autumn red", "autumn read", "x"]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, name string")
    a = df.selectExpr("id AS ia", "name AS na")
    b = df.selectExpr("id AS ib", "name AS nb")
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    exact = pairs.select(
        "ia", "ib", F.levenshtein("na", "nb").alias("d")
    ).filter(F.col("d") <= 2)
    banded = pairs.select(
        "ia", "ib", F.levenshtein("na", "nb", 2).alias("d")
    ).filter(F.col("d") >= 0)
    ex = {(r.ia, r.ib): r.d for r in exact.collect()}
    bd = {(r.ia, r.ib): r.d for r in banded.collect()}
    assert ex == bd and len(ex) > 0


def test_near_dup_cosine_bit_identical_to_inline_expression(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dups(df, threshold=-2.0).collect()
    }
    base = df.select("vec_id", F.col("label").alias("_blk"), "embedding")
    a, b = base.alias("a"), base.alias("b")
    sim = F.round(
        V.cosine_similarity(F.col("a.embedding"), F.col("b.embedding")), 6
    )
    want = {
        (r.id_a, r.id_b): r.cosine
        for r in a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("cosine"),
        )
        .collect()
        if r.cosine is not None and r.cosine >= -2.0
    }
    # zero-norm rows: inline expression yields NULL cosine; the
    # operator filters them via `cosine >= threshold` being NULL
    assert got == want and len(got) > 50


@pytest.mark.parametrize("forced_salt", [1, 3, 8])
def test_salt_factor_never_changes_pair_set(spark, forced_salt, monkeypatch):
    import python_vectordbapp_ceph_spark.operators.dedup as D

    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    monkeypatch.setattr(
        D, "_auto_salt_factor", lambda _df, _n, cap=16: forced_salt
    )
    got = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in D.embedding_near_dups(df, threshold=0.0).collect()
    )
    monkeypatch.undo()
    want = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in D.embedding_near_dups(df, threshold=0.0).collect()
    )
    assert got == want and len(got) > 0


def test_auto_salt_degenerates_when_blocks_exceed_cores(spark):
    df = spark.createDataFrame([(1,)], "id long")
    target = spark.sparkContext.defaultParallelism
    assert _auto_salt_factor(df, 2 * target) == 1
    assert _auto_salt_factor(df, 2 * target + 100) == 1
    assert _auto_salt_factor(df, 0) == 1
    # below-parallelism block counts fan out but stay capped
    assert 1 <= _auto_salt_factor(df, 1) <= 16
    assert _auto_salt_factor(df, max(1, target // 2)) >= 2
