"""Local accuracy evidence for the two sketch-based queries the driver
records as rows-only (approximate by design, no exact hash oracle):

  q_approx_distinct   — HyperLogLog++ with rsd=0.01: pin relative
                        error vs the exact per-group count-distinct.
  q_approx_quantiles  — approx_percentile(accuracy=1000): pin that
                        each returned value's RANK is within 1/1000 of
                        the requested quantile (the algorithm's
                        documented guarantee — value-distance is not
                        bounded, rank-distance is).
"""

from conftest import SF_DIR
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.io import load_table
from python_vectordbapp_ceph_spark.queries.relational import (
    q_approx_distinct,
    q_approx_quantiles,
)


def test_hll_relative_error_within_5pct(spark):
    approx = {
        r.event_type: r.approx_users
        for r in q_approx_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        rel = abs(approx[k] - ex) / max(ex, 1)
        assert rel <= 0.05, f"{k}: approx {approx[k]} vs exact {ex} (rel {rel:.3f})"


def test_approx_percentile_rank_tolerance(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    got = {
        r.l_returnflag: (r.p50, r.p90)
        for r in q_approx_quantiles(spark, SF_DIR).collect()
    }
    for flag, (p50, p90) in got.items():
        vals = sorted(
            r.l_extendedprice
            for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, v in ((0.5, p50), (0.9, p90)):
            # rank of the returned value among the sorted exact values
            lo = sum(1 for x in vals if x < v)
            hi = sum(1 for x in vals if x <= v)
            target = q * (n - 1)
            # accuracy=1000 ⇒ rank error ≤ n/1000 (+1 slack for ties)
            tol = n / 1000 + 1
            assert lo - tol <= target <= hi + tol, (
                f"{flag} q={q}: value {v} has rank [{lo},{hi}] vs target "
                f"{target:.1f} ± {tol:.1f} over n={n}"
            )


def test_hll_sketch_union_matches_exact_within_5pct(spark):
    """q_hll_union: per-group sketch estimates AND the merged-union
    ALL row each within 5% of exact distinct counts — the sketch
    reaggregation contract (union of sketches ≈ distinct of union)."""
    from python_vectordbapp_ceph_spark.queries import QUERIES

    got = {
        r.o_orderpriority: r.approx_cust
        for r in QUERIES["q_hll_union"](spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r.o_orderpriority: r.exact
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for k, ex in exact.items():
        rel = abs(got[k] - ex) / max(ex, 1)
        assert rel <= 0.05, f"{k}: approx {got[k]} vs exact {ex} (rel {rel:.3f})"


def test_freq_items_support_guarantee(spark):
    """DataFrameStatFunctions.freqItems contract: any value whose true
    frequency exceeds the support threshold MUST be in the result
    (false positives allowed, false negatives not)."""
    rows = [("hot",)] * 60 + [(f"cold{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    got = df.stat.freqItems(["k"], support=0.5).collect()[0][0]
    assert "hot" in got


def test_cms_never_underestimates_and_merges_exactly(spark):
    """CMS guarantees: (1) est >= exact for every key; (2) with a
    small vocabulary vs width, estimates are exact; (3) the merged
    sketch of two halves equals the sketch of the union."""
    from python_vectordbapp_ceph_spark.operators.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = [(f"k{i % 7}",) for i in range(200)] + [("hot",)] * 100
    df = spark.createDataFrame(rows, "k string")
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    probes = df.select("k").distinct()

    sk = cms_build(df, "k", depth=4, width=64)
    est = {
        r.k: r.est_count
        for r in cms_estimate(sk, probes, "k", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    for k, ex in exact.items():
        assert est[k] >= ex, (k, est[k], ex)
    # 8 distinct keys vs 64 buckets x 4 rows: min over rows is exact here
    assert est == exact

    # merge property: halves sum to the whole
    a, b = spark.createDataFrame(rows[:150], "k string"), spark.createDataFrame(
        rows[150:], "k string"
    )
    merged = cms_merge(
        cms_build(a, "k", depth=4, width=64), cms_build(b, "k", depth=4, width=64)
    )
    est_m = {
        r.k: r.est_count
        for r in cms_estimate(merged, probes, "k", depth=4, width=64).collect()
    }
    assert est_m == est


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Bloom guarantees: every inserted key reports present (no false
    negatives — the decontamination safety property); false-positive
    rate over 400 non-members stays near the (k, m, n) formula."""
    import math

    from python_vectordbapp_ceph_spark.operators.bloom import (
        bloom_build,
        bloom_contains,
        bloom_union,
    )

    k, m, n = 5, 2048, 100
    members = spark.createDataFrame([(f"in{i}",) for i in range(n)], "k string")
    others = spark.createDataFrame([(f"out{i}",) for i in range(400)], "k string")
    bloom = bloom_build(members, "k", k=k, m=m)

    got = {
        r.k: r.maybe_present
        for r in bloom_contains(bloom, members, "k", k=k, m=m).collect()
    }
    assert all(got.values()) and len(got) == n  # zero false negatives

    fp = [
        r.maybe_present
        for r in bloom_contains(bloom, others, "k", k=k, m=m).collect()
    ]
    rate = sum(fp) / len(fp)
    bound = (1 - math.exp(-k * n / m)) ** k
    assert rate <= 3 * bound + 0.02, (rate, bound)

    # union keeps the no-false-negative property for both halves
    h1 = spark.createDataFrame([(f"in{i}",) for i in range(50)], "k string")
    h2 = spark.createDataFrame([(f"in{i}",) for i in range(50, n)], "k string")
    u = bloom_union(bloom_build(h1, "k", k=k, m=m), bloom_build(h2, "k", k=k, m=m))
    got_u = {
        r.k: r.maybe_present
        for r in bloom_contains(u, members, "k", k=k, m=m).collect()
    }
    assert all(got_u.values())


def test_histogram_sketch_quantiles_within_one_bin(spark):
    """Mergeable histogram: merged halves equal the whole, and every
    quantile estimate lands within one bin width of the exact value."""
    from python_vectordbapp_ceph_spark.operators.hist import (
        hist_build,
        hist_merge,
        hist_quantile,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    lo, hi, n_bins = 0.0, 120000.0, 64
    width = (hi - lo) / n_bins

    whole = hist_build(li, "x", lo, hi, n_bins)
    h1 = hist_build(li.filter("x < 30000"), "x", lo, hi, n_bins)
    h2 = hist_build(li.filter("x >= 30000"), "x", lo, hi, n_bins)
    merged = hist_merge(h1, h2)
    assert {(r.bin, r.cnt) for r in merged.collect()} == {
        (r.bin, r.cnt) for r in whole.collect()
    }

    vals = sorted(r.x for r in li.collect())
    for q in (0.1, 0.5, 0.9, 0.99):
        est = hist_quantile(whole, q, lo, hi, n_bins)
        exact = vals[min(len(vals) - 1, int(q * len(vals)))]
        assert abs(est - exact) <= width + 1e-9, (q, est, exact)


def test_hll_intersect_estimate_within_10pct(spark):
    """Inclusion-exclusion overlap from HLL sketches vs the exact
    intersection on the same data."""
    from pyspark.sql import functions as F

    from python_vectordbapp_ceph_spark.io import load_table
    from python_vectordbapp_ceph_spark.queries.relational import (
        q_hll_intersect,
    )

    got = q_hll_intersect(spark, SF_DIR).collect()[0]
    o = load_table(spark, SF_DIR, "orders")
    a = o.filter("o_orderpriority = '1-URGENT'").select("o_custkey").distinct()
    b = o.filter("o_orderpriority = '2-HIGH'").select("o_custkey").distinct()
    exact = a.join(b, "o_custkey", "left_semi").count()
    assert exact > 0
    assert abs(got.approx_overlap - exact) <= max(0.10 * exact, 5)
