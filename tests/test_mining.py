"""Round-5 corpus-mining surface: winnowing fingerprints, BM25,
bucketed co-located joins. Value parity with DuckDB is covered by
test_oracle_parity (these queries register oracles); here we pin the
properties parity can't see — the winnowing guarantee, the UDF kernel
vs the declarative HOF semantics, and the no-Exchange bucketed plan."""

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.functions.fingerprint import (
    K,
    W,
    _fingerprints_one,
)

from conftest import SF_DIR


def test_winnowing_guarantee_shared_substring():
    """Schleimer et al. guarantee: any common substring of length
    ≥ k+w-1 produces at least one common fingerprint."""
    shared = "the quick brown fox jumps"
    a = "prefix one " + shared + " suffix alpha"
    b = "totally different start " + shared + " and another end"
    fa, fb = set(_fingerprints_one(a)), set(_fingerprints_one(b))
    assert fa & fb, "shared substring must yield a shared fingerprint"
    # and unrelated texts (no 8-char common substring) share nothing
    fc = set(_fingerprints_one("zxqwvut 0123456 yyyyyyy 987 kjhgf"))
    assert not (fa & fc)


def test_winnowing_short_doc_empty():
    assert _fingerprints_one("a" * (K + W - 2)) == []
    assert len(_fingerprints_one("a" * (K + W - 1))) == 1


def test_fingerprint_udf_matches_declarative_hof(spark):
    """The numpy kernel must compute exactly what the (slow but
    obviously-correct) Catalyst HOF formulation computes."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "0 1 22 333 4444 abcdefgh",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    hof = df.select(
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(array(transform(sequence(1, length(s) - {K - 1}),"
                    f" i -> aggregate(sequence(i, i + {K - 1}), 0L,"
                    f" (acc, j) -> (acc * 31 + ascii(substring(s, j, 1)))"
                    f" % 1000000007))),"
                    f" a -> transform(sequence(1, size(a) - {W - 1}),"
                    f" i -> array_min(slice(a, i, {W}))))[0]"
                )
            )
        ).alias("fp")
    )
    got = sorted(r.fp for r in hof.collect())
    want = sorted(fp for t in texts for fp in _fingerprints_one(t))
    assert got == want


def test_bucketed_join_plan_has_no_exchange(spark):
    """The point of q_bucketed_join: both sides pre-bucketed on the
    join key → sort-merge join with zero shuffle Exchange."""
    from python_vectordbapp_ceph_spark.queries.mining import q_bucketed_join

    # at sf0.001 Catalyst would (rightly) broadcast the tiny side;
    # disable that to expose the bucketed path a 100 TB side would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_bucketed_join(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_mad_outliers_are_extreme_values(spark):
    """Every flagged outlier must deviate more than any unflagged row
    of the same event_type (MAD ordering sanity)."""
    from python_vectordbapp_ceph_spark.queries.mining import q_mad_outliers
    from python_vectordbapp_ceph_spark.io import load_table

    out = q_mad_outliers(spark, SF_DIR)
    flagged = out.groupBy("event_type").agg(
        F.min(F.col("abs_dev")).alias("min_flagged_dev"),
        F.count(F.lit(1)).alias("n"),
    )
    rows = {r.event_type: r for r in flagged.collect()}
    assert rows, "fixture should produce at least one outlier group"
    for et, r in rows.items():
        assert r.min_flagged_dev > 0


def test_fingerprint_pairs_detect_copied_paragraph(spark):
    """The q_fingerprint_pairs detector targets verbatim LOCAL copying
    (a paragraph pasted into an otherwise different document) — the
    dup class whole-document MinHash token-set similarity misses. The
    driver's synthetic corpus plants token-level edits (no long
    verbatim runs), so the registered query finds few pairs there;
    this constructed case pins that actual copying IS caught."""
    from pyspark.sql import functions as F

    from python_vectordbapp_ceph_spark.functions.fingerprint import (
        winnow_fingerprints,
    )
    from python_vectordbapp_ceph_spark.functions.text import (
        normalize_for_fingerprint,
    )

    para = (
        "the amber protocol requires every node to acknowledge "
        "checkpoint barriers before advancing its local watermark"
    )
    docs = [
        (1, "intro section alpha. " + para + " closing remarks beta."),
        (2, "completely different topic gamma. " + para + " and more delta."),
        (3, "unrelated text about cooking pasta with fresh tomatoes"),
        (4, "another unrelated entry regarding bicycle maintenance tips"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    fp = d.select(
        "doc_id",
        F.explode(
            winnow_fingerprints(normalize_for_fingerprint(F.col("text")))
        ).alias("fp"),
    )
    a = fp.select(F.col("doc_id").alias("id_a"), "fp")
    b = fp.select(F.col("doc_id").alias("id_b"), "fp")
    pairs = {
        (r.id_a, r.id_b): r.n
        for r in a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # copied-paragraph pair clears the query's ≥3 threshold…
    assert pairs.get((1, 2), 0) >= 3, pairs
    # …unrelated pairs may share an incidental window or two (short
    # docs, common words) but stay below it — that's what the
    # threshold is for
    assert pairs.get((3, 4), 0) < 3 and pairs.get((1, 3), 0) < 3, pairs


def test_winnow_map_in_arrow_equals_pandas_udf(spark):
    """The Arrow-batch entry point produces byte-identical fingerprint
    sets to the pandas_udf column expression."""
    from pyspark.sql import functions as F

    from python_vectordbapp_ceph_spark.functions.fingerprint import (
        winnow_fingerprints,
        winnow_map_in_arrow,
    )
    from python_vectordbapp_ceph_spark.functions.text import (
        normalize_for_fingerprint,
    )
    from python_vectordbapp_ceph_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents").limit(50)
    nrm = d.select("doc_id", normalize_for_fingerprint("text").alias("s"))
    want = {
        r.doc_id: tuple(r.fps)
        for r in nrm.select(
            "doc_id", winnow_fingerprints(F.col("s")).alias("fps")
        ).collect()
    }
    got = {
        r.doc_id: tuple(r.fps)
        for r in winnow_map_in_arrow(nrm, "s", "doc_id").collect()
    }
    assert got == want and len(got) == 50
