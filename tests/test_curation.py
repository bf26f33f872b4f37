"""Semantic tests for the curation tier (queries/curation.py) on
planted scenarios — the oracle gate proves engine parity; these prove
the operators detect what they claim to detect."""

from conftest import SF_DIR
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.cache import release_caches
from python_vectordbapp_ceph_spark.queries.curation import (
    q_dedup_best_quality,
    q_hard_negatives,
    q_ngram_novelty,
    q_split_contamination,
)


def test_hard_negatives_never_share_anchor_label(spark):
    from python_vectordbapp_ceph_spark.io import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 3)
        .collect()
    }
    rows = q_hard_negatives(spark, SF_DIR).collect()
    assert {r.q_id for r in rows} == set(labels)
    for r in rows:
        assert r.label != labels[r.q_id], "hard negative shares anchor label"
    # exactly 5 per anchor, distances non-decreasing within an anchor
    for qid in labels:
        ds = [r.distance for r in rows if r.q_id == qid]
        assert len(ds) == 5
        assert ds == sorted(ds)


def test_split_contamination_counts_planted_leak(spark):
    """Two near-identical docs forced into different splits must be
    reported: doc_id 0 → bucket 0 ('train'), doc_id 11 → bucket 95
    ('test') under the Knuth hash (precomputed)."""
    from python_vectordbapp_ceph_spark.operators.split import split_bucket

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(0, text), (11, text + " extra tail")], "doc_id long, text string"
    )
    buckets = {
        r.doc_id: r.b
        for r in df.select("doc_id", split_bucket("doc_id").alias("b")).collect()
    }
    sides = {
        k: ("train" if v < 80 else "valid" if v < 90 else "test")
        for k, v in buckets.items()
    }
    assert len(set(sides.values())) == 2, f"fixture landed same-split: {buckets}"

    from python_vectordbapp_ceph_spark.queries import _common

    orig = _common.load_table
    try:
        _common.load_table = (
            lambda spark_, sf_, name: df if name == "documents" else orig(spark_, sf_, name)
        )
        rows = q_split_contamination(spark, "ignored").collect()
    finally:
        _common.load_table = orig
        release_caches()
    assert len(rows) == 1
    r = rows[0]
    assert {r.split_a, r.split_b} == set(sides.values())
    # the shared shingles are the 8-grams of the common 10-token prefix
    assert r.n_shared_shingles == 3
    assert r.doc_pairs == 3


def test_ngram_novelty_planted_copy_has_zero_novel(spark):
    """A verbatim copy makes every shingle of both docs df>=2 → zero
    novel; a unique doc keeps all its shingles novel."""
    common = " ".join(f"tok{i}" for i in range(12))
    unique = " ".join(f"rare{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, common), (2, common), (3, unique)], "doc_id long, text string"
    )
    from python_vectordbapp_ceph_spark.queries import _common

    orig = _common.load_table
    try:
        _common.load_table = (
            lambda spark_, sf_, name: df if name == "documents" else orig(spark_, sf_, name)
        )
        got = {
            r.doc_id: (r.n_shingles, r.n_novel)
            for r in q_ngram_novelty(spark, "ignored").collect()
        }
    finally:
        _common.load_table = orig
        release_caches()
    assert got[1] == (5, 0) and got[2] == (5, 0)
    assert got[3] == (5, 5)


def test_dedup_best_quality_keeps_longest(spark):
    """Survivors must be the longest doc of each component; every
    survivor set is one-per-component plus all unpaired docs."""
    rows = q_dedup_best_quality(spark, SF_DIR).collect()
    release_caches()
    from python_vectordbapp_ceph_spark.io import load_table
    from python_vectordbapp_ceph_spark.operators.dedup import dedup_components
    from python_vectordbapp_ceph_spark.queries.curation import _cc_pairs

    docs = {r.doc_id: r.n_chars for r in load_table(spark, SF_DIR, "documents").collect()}
    comps = {r.id: r.comp for r in dedup_components(_cc_pairs(spark, SF_DIR)).collect()}
    release_caches()

    kept = {r.doc_id for r in rows}
    assert len(rows) == len(kept), "duplicate survivors"
    by_comp: dict = {}
    for i, c in comps.items():
        by_comp.setdefault(c, []).append(i)
    for c, members in by_comp.items():
        winners = kept & set(members)
        assert len(winners) == 1, f"component {c}: {winners}"
        w = winners.pop()
        best = max(docs[m] for m in members)
        assert docs[w] == best, f"component {c} kept {w} (len {docs[w]}) over {best}"
    unpaired = set(docs) - set(comps)
    assert unpaired <= kept


def test_dup_rate_and_syndication_on_planted_corpus(spark):
    """The sf0.01 corpus has no exact dups (all fingerprints unique),
    so the per-source rate and cross-source pair queries prove their
    detection on planted data: same text under different sources must
    count as dup rows AND as a shared-doc source pair."""
    from python_vectordbapp_ceph_spark.functions.text import fingerprint

    rows = [
        (1, "alpha beta gamma", "src_a"),
        (2, "Alpha  beta GAMMA!", "src_b"),   # same after normalization
        (3, "alpha beta gamma", "src_a"),     # intra-source dup too
        (4, "unique document one", "src_a"),
        (5, "another unique doc", "src_b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    f = d.select("doc_id", "source", fingerprint(F.col("text")).alias("fp"))
    df_ = f.groupBy("fp").count().withColumnRenamed("count", "n_docs")
    per_src = {
        r.source: (r.n, r.n_dup)
        for r in f.join(df_, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .collect()
    }
    assert per_src["src_a"] == (3, 2)   # docs 1,3 are dups of the group
    assert per_src["src_b"] == (2, 1)   # doc 2 matches across source

    dist = f.select("source", "fp").distinct()
    a = dist.select(F.col("source").alias("sa"), "fp")
    b = dist.select(F.col("source").alias("sb"), F.col("fp").alias("fpb"))
    pairs = {
        (r.sa, r.sb, r.shared)
        for r in a.join(b, (a["fp"] == b["fpb"]) & (a["sa"] < b["sb"]))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .collect()
    }
    assert pairs == {("src_a", "src_b", 1)}


def test_gini_spend_bounds_and_equality_case(spark):
    from python_vectordbapp_ceph_spark.queries.curation import q_gini_spend

    rows = q_gini_spend(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
    # perfectly equal planted spend → Gini exactly 0
    s = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, 100.0)],
        "cust long, x double",
    )
    from pyspark.sql.window import Window as W

    r = s.select(
        F.col("x").cast("decimal(18,2)").alias("x"),
        F.row_number().over(W.orderBy("x", "cust")).alias("rnk"),
    )
    g = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("rnk") * F.col("x")).alias("srx"),
    ).collect()[0]
    gini = (2.0 * float(g.srx) - (g.n + 1) * float(g.sx)) / (g.n * float(g.sx))
    assert gini == 0.0
