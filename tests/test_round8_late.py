"""Round-8 late additions: semantic invariants the oracle hash can't
express — credit conservation for multi-touch attribution, the
power-of-two weight law for half-life decay, the rational-assortativity
recompute, and the mutuality/margin contract of reciprocal best-match.
"""

import math

from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.queries.analytics import (
    _HL_CAP,
    _HL_US,
    q_decay_halflife,
    q_linear_attribution,
)
from python_vectordbapp_ceph_spark.queries.evaluation import (
    q_reciprocal_best_match,
)
from python_vectordbapp_ceph_spark.queries.textops import (
    _GRAPH_SAMPLE_N,
    _graph_sample,
    q_degree_assortativity,
)
from python_vectordbapp_ceph_spark.operators.dedup import jaccard_pairs

from conftest import SF_DIR


# --- q_decay_halflife --------------------------------------------------------


def test_decay_shares_sum_to_one_within_floor_loss(spark):
    """Exact-floor ppm shares lose at most (n_groups - 1) ppm total."""
    rows = q_decay_halflife(spark, SF_DIR).collect()
    total = sum(r.share_ppm for r in rows)
    assert 1_000_000 - (len(rows) - 1) <= total <= 1_000_000


def test_decay_weight_bounds(spark):
    """decayed_n is a sum of powers of two in [1, 2^CAP]: it must lie
    between n_events (all ancient) and n_events << CAP (all fresh),
    and the freshest group strictly dominates the uniform floor."""
    rows = q_decay_halflife(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_events <= int(r.decayed_n) <= r.n_events * (1 << _HL_CAP)


def test_decay_matches_python_recompute(spark):
    """Row-level recompute of the discretized decay in pure Python —
    pins the epoch-microsecond bucketing (div, cap) end-to-end."""
    from python_vectordbapp_ceph_spark.queries._common import T

    ev = (
        T(spark, SF_DIR, "events")
        .select("event_type", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    ref = max(r.us for r in ev)
    exp_n = {}
    for r in ev:
        k = min((ref - r.us) // _HL_US, _HL_CAP)
        exp_n[r.event_type] = exp_n.get(r.event_type, 0) + (1 << (_HL_CAP - k))
    got = {r.event_type: int(r.decayed_n) for r in q_decay_halflife(spark, SF_DIR).collect()}
    assert got == exp_n


# --- q_linear_attribution ----------------------------------------------------


def test_attribution_conserves_credit(spark):
    """Sum of channel credit == 1e6 x converting users with >=1 prior
    touch (each user's credits sum to exactly 1e6 by remainder
    assignment)."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    n_users = (
        e.join(fp, "user_id")
        .filter((F.col("ts") < F.col("fp_ts")) & (F.col("event_type") != "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    rows = q_linear_attribution(spark, SF_DIR).collect()
    assert sum(r.credit_ppm for r in rows) == 1_000_000 * n_users
    assert sum(r.n_first for r in rows) == n_users


# --- q_degree_assortativity --------------------------------------------------


def test_assortativity_matches_python_recompute(spark):
    """Exact rational recompute from the same edge list; also pins
    |r| <= 1 (ppm bounds) and the both-orientations marginal trick."""
    d = _graph_sample(spark, SF_DIR)
    edges = [
        (r.id_a, r.id_b)
        for r in jaccard_pairs(d, block_col="source", shingle_n=1, threshold=0.5)
        .select("id_a", "id_b")
        .collect()
    ]
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    dirs = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    n = len(dirs)
    sx = sum(deg[u] for u, _ in dirs)
    sxy = sum(deg[u] * deg[v] for u, v in dirs)
    sxx = sum(deg[u] * deg[u] for u, _ in dirs)
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    exp = 0 if den == 0 else (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
    row = q_degree_assortativity(spark, SF_DIR).collect()[0]
    assert row.n_edges == len(edges)
    assert row.assort_ppm == exp
    assert -1_000_000 <= row.assort_ppm <= 1_000_000


# --- q_reciprocal_best_match -------------------------------------------------


def test_reciprocal_pairs_are_mutual_and_margin_floor(spark):
    """Each endpoint appears at most once (top-1 both ways is a
    partial matching); margin >= 1e6 because the runner-up distance
    can't beat the best; brute-force recompute confirms mutuality."""
    rows = q_reciprocal_best_match(spark, SF_DIR).collect()
    a_ids = [r.a_id for r in rows]
    b_ids = [r.b_id for r in rows]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))
    assert all(r.margin_ppm >= 1_000_000 for r in rows)

    e = {
        r.vec_id: r.v
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    }
    A = sorted(k for k in e if k % 25 == 0 and k < 5000)
    B = sorted(k for k in e if k % 25 == 5 and k < 5000)

    def dist(x, y):
        return round(math.sqrt(sum((a - b) * (a - b) for a, b in zip(x, y))), 6)

    best_b = {a: min(B, key=lambda b: (dist(e[a], e[b]), b)) for a in A}
    best_a = {b: min(A, key=lambda a: (dist(e[a], e[b]), a)) for b in B}
    exp = {(a, b) for a, b in best_b.items() if best_a[b] == a}
    assert {(r.a_id, r.b_id) for r in rows} == exp


# --- q_bootstrap_ci ----------------------------------------------------------


def test_bootstrap_pmf_table_provenance():
    """The literal threshold table IS floor-ppm of the cumulative
    Poisson(1) pmf (the test may use math.exp; the engines never do)."""
    from python_vectordbapp_ceph_spark.queries.evaluation import _POIS_PPM

    c = 0.0
    for k, t in enumerate(_POIS_PPM):
        c += math.exp(-1) / math.factorial(k)
        assert t == math.floor(c * 1_000_000)


def test_bootstrap_ci_brackets_point_estimate(spark):
    """Deterministic dataset -> deterministic CI; the discrete 2.5/97.5
    band must be ordered and bracket the sample mean here."""
    from python_vectordbapp_ceph_spark.queries.evaluation import q_bootstrap_ci

    for r in q_bootstrap_ci(spark, SF_DIR).collect():
        assert r.ci_lo_micro <= r.mean_micro <= r.ci_hi_micro
        assert r.ci_lo_micro < r.ci_hi_micro


# --- q_user_overlap ----------------------------------------------------------


def test_user_overlap_bounds_and_theta_cell(spark):
    """Overlap can't exceed either side; Jaccard <= 1e6; all 10 type
    pairs present; the click x purchase cell is the exact value the
    theta sketch estimates."""
    from python_vectordbapp_ceph_spark.queries.extended import q_user_overlap

    rows = q_user_overlap(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.overlap_n <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_ppm <= 1_000_000
    cp = [r for r in rows if {r.type_a, r.type_b} == {"click", "purchase"}]
    assert len(cp) == 1


# --- q_effective_sample_size -------------------------------------------------


def test_ess_cauchy_schwarz_bound_and_all_row(spark):
    """ESS <= n by Cauchy-Schwarz -> ess_ppm <= 1e6; the ALL row's
    n_docs equals the sum of the per-source rows."""
    from python_vectordbapp_ceph_spark.queries.textops import (
        q_effective_sample_size,
    )

    rows = q_effective_sample_size(spark, SF_DIR).collect()
    per = [r for r in rows if r.source != "ALL"]
    al = [r for r in rows if r.source == "ALL"]
    assert len(al) == 1
    assert al[0].n_docs == sum(r.n_docs for r in per)
    for r in rows:
        assert 0 < r.ess_ppm <= 1_000_000


# --- plan pins for the late batch ---------------------------------------------


def test_bootstrap_plan_expansion_stays_map_side(spark):
    """The 40x Poisson expansion must collapse BEFORE the exchange:
    the Generate (explode) sits under the (event_type, b) partial
    hash aggregate, so the shuffle carries types x B rows, not
    corpus x B. A plan where Generate appears above an Exchange on
    the fact path would re-shuffle the expansion."""
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str
    from python_vectordbapp_ceph_spark.queries.evaluation import q_bootstrap_ci

    plan = explain_str(q_bootstrap_ci(spark, SF_DIR), "simple")
    lines = plan.splitlines()
    gen = [i for i, l in enumerate(lines) if "Generate explode" in l]
    assert gen, "explode missing from plan"
    # the explode feeds a partial HashAggregate before any Exchange
    # (deeper plan lines = earlier execution; scan upward from Generate)
    above = lines[: gen[0]]
    agg_after_gen = [
        l for l in reversed(above) if "HashAggregate" in l or "Exchange" in l
    ]
    assert agg_after_gen and "HashAggregate" in agg_after_gen[0], (
        "no partial aggregate between explode and the first exchange"
    )


def test_decay_plan_is_one_fact_aggregate(spark):
    """No window anywhere; the only fact-scale exchange is the
    event_type hash aggregate's."""
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str
    from python_vectordbapp_ceph_spark.queries.analytics import q_decay_halflife

    plan = explain_str(q_decay_halflife(spark, SF_DIR), "simple")
    assert "Window" not in plan
    assert "BroadcastExchange" in plan  # the scalar max rides broadcast


def test_attribution_windows_partition_on_user(spark):
    """Both windows must partition by user_id (bounded per-user event
    counts), never unpartitioned."""
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str
    from python_vectordbapp_ceph_spark.queries.analytics import (
        q_linear_attribution,
    )

    plan = explain_str(q_linear_attribution(spark, SF_DIR), "simple")
    bad = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(" in ln and "user_id#" not in ln
    ]
    assert bad == [], bad


# --- streaming decay monitor ---------------------------------------------------


def test_streaming_decay_equals_batch(spark, tmp_path):
    """Batch/stream unification for the half-life decay: events fed
    through the monitor in TWO micro-batches (incremental view folds
    + manifest commits) yield exactly the bucket-anchored decay the
    shared assembly computes over the union of all events — including
    weight saturation: the span exceeds the 40-half-life cap, so the
    oldest rows ride the saturated weight 1."""
    import json

    from python_vectordbapp_ceph_spark.operators.decay import (
        HL_US,
        decayed_bucket_totals,
    )
    from python_vectordbapp_ceph_spark.streaming.decay import (
        init_monitor,
        monitor_stream,
        read_decayed,
    )

    rows = []
    eid = 0
    # 2023-01 .. 2024-01 weekly: > 52 half-lives of span -> saturation
    for week in range(0, 55):
        day = 1 + 7 * week
        y, rem = 2023 + day // 365, day % 365
        m, d = 1 + rem // 31, 1 + rem % 28
        for etype, n in (("a", 2), ("b", 1 + week % 3)):
            for i in range(n):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": f"{y}-{m:02d}-{d:02d} 0{i}:30:00",
                        "event_type": etype,
                        "value": 1.5 + (eid % 7) * 0.25,
                    }
                )
                eid += 1
    src = tmp_path / "src"
    src.mkdir()
    half = len(rows) // 2
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows[:half]))

    view = str(tmp_path / "view")
    init_monitor(spark, view)
    schema = "event_id long, ts timestamp, event_type string, value double"

    q = monitor_stream(
        spark.readStream.schema(schema).json(str(src)), view,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows[half:]))
    q = monitor_stream(
        spark.readStream.schema(schema).json(str(src)), view,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r.event_type, r.n_events, int(r.decayed_n), int(r.decayed_value_micro))
        for r in read_decayed(spark, view).collect()
    }

    batch = spark.read.schema(schema).json(str(src))
    agg = batch.groupBy(
        "event_type", F.expr(f"unix_micros(ts) div {HL_US}L").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.floor(F.col("value") * 1000000.0)).alias("total"),
    )
    want = {
        (r.event_type, r.n_events, int(r.decayed_n), int(r.decayed_value_micro))
        for r in decayed_bucket_totals(
            agg, "event_type", "b", "cnt", total_col="total"
        ).collect()
    }
    assert got == want
    # saturation really exercised: oldest bucket is > cap behind ref
    bs = [r.b for r in agg.select("b").distinct().collect()]
    assert max(bs) - min(bs) > 40


# --- q_corpus_checksum ---------------------------------------------------------


def test_corpus_checksum_is_layout_invariant_and_edit_sensitive(spark, tmp_path):
    """The stamp must not move under repartitioning, and must move
    under a single-document edit."""
    from python_vectordbapp_ceph_spark.queries.textops import q_corpus_checksum

    base = {(r.source, str(r.checksum)) for r in q_corpus_checksum(spark, SF_DIR).collect()}

    # re-layout the corpus: 7 shuffled partitions, same content
    import shutil
    alt = tmp_path / "alt"
    for t in ("documents",):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").repartition(7).write.parquet(
            str(alt / f"{t}.parquet")
        )
    got = {(r.source, str(r.checksum)) for r in q_corpus_checksum(spark, str(alt)).collect()}
    assert got == base

    # flip one character in one doc -> ALL row (and one source) move
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edited = d.withColumn(
        "text",
        F.when(F.col("doc_id") == d.select(F.min("doc_id")).collect()[0][0],
               F.concat(F.col("text"), F.lit("!"))).otherwise(F.col("text")),
    )
    ed = tmp_path / "ed"
    edited.write.parquet(str(ed / "documents.parquet"))
    moved = {(r.source, str(r.checksum)) for r in q_corpus_checksum(spark, str(ed)).collect()}
    assert moved != base


# --- q_lorenz_deciles ----------------------------------------------------------


def test_lorenz_curve_is_convex_and_closes_at_one(spark):
    """Lorenz invariants: ascending-spend deciles have non-decreasing
    shares (convex curve), cumulative share closes at exactly 1e6,
    every decile below the diagonal or on it."""
    from python_vectordbapp_ceph_spark.queries.analytics import q_lorenz_deciles

    rows = sorted(q_lorenz_deciles(spark, SF_DIR).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.share_ppm for r in rows]
    assert shares == sorted(shares)
    assert rows[-1].cum_share_ppm == 1_000_000
    for r in rows:
        # Lorenz curve never exceeds the diagonal (floor loss aside)
        assert r.cum_share_ppm <= r.decile * 100_000 + 1
