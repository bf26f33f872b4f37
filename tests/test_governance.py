"""Round-8 governance tier: semantic properties the oracle hash can't
express (metric bounds, conservation laws, the literal nDCG table's
provenance) plus the plan pins that make these shapes survive a 100×
scale-up (grouped two-phase rank, ORC predicate pushdown)."""

import math
import re

from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.twophase import grouped_cumsum
from python_vectordbapp_ceph_spark.plans.inspect import explain_str
from python_vectordbapp_ceph_spark.queries.governance import (
    _NDCG_K,
    _NDCG_W,
    q_k_anonymity,
    q_kendall_tau,
    q_ndcg,
    q_orc_roundtrip,
    q_pad_waste,
    q_schema_evolution,
)

from conftest import SF_DIR


# --- grouped two-phase rank primitive --------------------------------------


def test_grouped_cumsum_matches_naive_window(spark):
    """The distributed per-group running sum must equal the naive
    Window.partitionBy(group) cumsum row-for-row, including groups
    that span several range partitions."""
    from pyspark.sql.window import Window

    rows = [(i % 3, i * 7 % 101, i + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "g int, k int, v long")
    got = {
        (r.g, r.k): (r.cum, r.before)
        for r in grouped_cumsum(
            df, ["g"], [F.col("k")], "v", "cum", "before"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("k")
    exp = {
        (r.g, r.k): (r.cum, r.before)
        for r in df.select(
            "g",
            "k",
            F.sum("v").over(w).alias("cum"),
            F.coalesce(
                F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("before"),
        ).collect()
    }
    assert got == exp


def test_pad_waste_plan_has_no_single_task_window(spark):
    """The per-bucket deal must come from the grouped two-phase rank:
    every window over the doc-cardinality path is partitioned by
    (_pid, bucket), and the only non-_pid windows are the broadcast
    prefix-offset pass (over #groups × #partitions rows). Pinned with
    the r15 single-task gate disabled (conftest.twophase_distributed)."""
    from tests.conftest import twophase_distributed

    with twophase_distributed(spark):
        plan = explain_str(q_pad_waste(spark, SF_DIR))
    bad = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln
        and "windowspecdefinition(_pid#" not in ln
        # prefix-offset window: per-bucket over ≤num-partitions rows
        and "_mass#" not in ln
    ]
    assert bad == [], bad


# --- privacy audit ---------------------------------------------------------


def test_k_anonymity_conservation_and_flags(spark):
    rows = q_k_anonymity(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    assert sum(r.group_n for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r.l_distinct <= r.group_n
        assert r.below_k == (1 if r.group_n < 10 else 0)


# --- nDCG ------------------------------------------------------------------


def test_ndcg_literal_table_is_floor_1e6_over_log2():
    """The literal discount table IS the metric definition — pin it to
    its closed form so a typo can't silently redefine nDCG, and pin
    the cum column as the prefix sum (the IDCG lookup)."""
    cum = 0
    for i, w, c in _NDCG_W:
        assert w == math.floor(1_000_000 / math.log2(i + 1))
        cum += w
        assert c == cum
    assert [i for i, _, _ in _NDCG_W] == list(range(1, _NDCG_K + 1))


def test_ndcg_bounds_and_degenerates(spark):
    rows = q_ndcg(spark, SF_DIR).collect()
    assert len(rows) > 0
    idcg_by_k = {i: c for i, _, c in _NDCG_W}
    for r in rows:
        assert 0 <= r.ndcg_ppm <= 1_000_000
        assert r.dcg_ppm <= r.idcg_ppm
        if r.n_rel > 0:
            assert r.idcg_ppm == idcg_by_k[min(r.n_rel, _NDCG_K)]
        else:
            assert (r.dcg_ppm, r.idcg_ppm, r.ndcg_ppm) == (0, 0, 0)


def test_ndcg_perfect_retrieval_is_unity(spark):
    """A label that dominates its neighborhood: if the top-min(n_rel,k)
    ranks are all relevant, ndcg_ppm must be exactly 1e6 (the ratio is
    integral, no rounding loss). Verified by recomputing the hit set
    from distances for one probe and cross-checking the query's row."""
    rows = {r.q_id: r for r in q_ndcg(spark, SF_DIR).collect()}
    # recompute rank-ordered relevance for probe 0 from first principles
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_id = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in emb}
    qv, ql = by_id[0]
    cand = [
        (round(float(np.sqrt(((v - qv) ** 2).sum())), 6), vid, lab)
        for vid, (v, lab) in by_id.items()
        if vid != 0
    ]
    cand.sort()
    hits = [1 if lab == ql else 0 for _, _, lab in cand[:_NDCG_K]]
    dcg = sum(w for (i, w, _), h in zip(_NDCG_W, hits) if h)
    n_rel = sum(1 for _, _, lab in cand if lab == ql)
    idcg = dict((i, c) for i, _, c in _NDCG_W)[min(n_rel, _NDCG_K)] if n_rel else 0
    r = rows[0]
    assert (r.dcg_ppm, r.idcg_ppm) == (dcg, idcg)
    if dcg == idcg and idcg > 0:
        assert r.ndcg_ppm == 1_000_000


# --- padding waste ---------------------------------------------------------


def test_pad_waste_conservation(spark):
    rows = q_pad_waste(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.pad_chars >= 0
        assert 0 <= r.pad_ppm < 1_000_000
        # batches of 32: ceil rule
        assert r.n_batches == -(-r.n_docs // 32)


# --- ORC round-trip --------------------------------------------------------


def test_orc_scan_pushes_lang_filter(spark):
    """The lang predicate must reach the ORC scan as a pushed filter
    (served from stripe stats at scale, not post-scan)."""
    plan = explain_str(q_orc_roundtrip(spark, SF_DIR))
    scan = [ln for ln in plan.splitlines() if "Scan orc" in ln or "orc" in ln.lower()]
    m = re.search(r"PushedFilters: \[[^\]]*lang[^\]]*\]", plan)
    assert m, scan


# --- Kendall ---------------------------------------------------------------


def test_kendall_pair_accounting(spark):
    r = q_kendall_tau(spark, SF_DIR).collect()[0]
    assert r.n_pairs == 100 * 99 // 2
    assert r.concordant + r.discordant <= r.n_pairs
    assert r.s_stat == r.concordant - r.discordant
    assert -1_000_000 <= r.tau_a_ppm <= 1_000_000
    # sign and magnitude of the integral-div tau
    expect = (1 if r.s_stat >= 0 else -1) * (abs(r.s_stat) * 1_000_000 // r.n_pairs)
    assert r.tau_a_ppm == expect


# --- schema evolution ------------------------------------------------------


def test_schema_evolution_backfills_nulls(spark):
    rows = q_schema_evolution(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    n_odd = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert sum(r.n_with_lang for r in rows) == n_odd
    for r in rows:
        assert r.n_with_lang <= r.n_docs


# --- precision/recall@k ----------------------------------------------------


def test_precision_recall_consistency(spark):
    from python_vectordbapp_ceph_spark.queries.governance import (
        q_precision_recall_at_k,
    )

    rows = q_precision_recall_at_k(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hits_k <= _NDCG_K
        assert r.hits_k <= r.n_rel
        assert r.precision_ppm == r.hits_k * 1_000_000 // _NDCG_K
        if r.n_rel:
            assert r.recall_ppm == r.hits_k * 1_000_000 // r.n_rel
        else:
            assert r.recall_ppm == 0
        # recall can only trail precision when n_rel > k
        if r.n_rel <= _NDCG_K:
            assert r.recall_ppm >= r.precision_ppm


# --- rank-biased overlap ---------------------------------------------------


def test_rbo_weight_table_is_geometric():
    """Pin the literal table to (1-p)p^(d-1) at p=0.9 via exact decimal
    arithmetic (the Fraction form of 9^(d-1)/10^d)."""
    from fractions import Fraction

    from python_vectordbapp_ceph_spark.queries.governance import (
        _RBO_MAX,
        _RBO_W,
    )

    for d, w in _RBO_W:
        exact = Fraction(10 ** 6) * Fraction(9 ** (d - 1), 10 ** d)
        assert w == exact.numerator // exact.denominator
    assert _RBO_MAX == sum(w for _, w in _RBO_W)


def test_rbo_bounds_and_self_agreement(spark):
    from python_vectordbapp_ceph_spark.queries.governance import (
        _RBO_MAX,
        q_rank_overlap,
    )

    rows = q_rank_overlap(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.rbo_raw <= _RBO_MAX
        assert 0 <= r.rbo_ppm <= 1_000_000
        # per-depth floors mean rbo_ppm is the floor of raw/max exactly
        assert r.rbo_ppm == r.rbo_raw * 1_000_000 // _RBO_MAX
