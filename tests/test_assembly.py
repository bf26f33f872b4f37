"""Round-7 assembly tier: semantic properties the oracle hash can't
express (budget invariants, cap invariants, distribution sanity) plus
the plan pins that make these shapes survive a 100× scale-up."""

from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.plans.inspect import explain_str
from python_vectordbapp_ceph_spark.queries.assembly import (
    _BALANCE_CAP,
    _SHARD_BUDGET,
    q_balanced_sample,
    q_benford_digits,
    q_cusum_changepoint,
    q_dataset_card,
    q_prefix_groups,
    q_token_shards,
    q_weighted_quantiles,
)

from conftest import SF_DIR


def test_token_shards_budget_invariants(spark):
    """Every shard except the last must carry >= the token budget
    (documents are never split, so shards only ever OVERSHOOT), and
    shard ids must be a contiguous 0..max range."""
    rows = q_token_shards(spark, SF_DIR).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, 0)
        by_shard[r.shard_id] += r.n_tokens
    ids = sorted(by_shard)
    assert ids == list(range(len(ids)))
    for sid in ids[:-1]:
        assert by_shard[sid] >= _SHARD_BUDGET, (sid, by_shard[sid])
    # total conservation: no token lost or double-counted
    total = sum(r.n_tokens for r in rows)
    assert total == sum(by_shard.values())


def test_token_shards_assignment_is_partitioning_invariant(spark):
    """The shard assignment must not depend on the physical layout:
    recomputing over a repartitioned input gives identical rows."""
    from python_vectordbapp_ceph_spark.io import load_table

    base = q_token_shards(spark, SF_DIR)
    got = {(r.doc_id, r.shard_id) for r in base.collect()}
    # same computation, shuffled input
    d = load_table(spark, SF_DIR, "documents").repartition(13)
    d.createOrReplaceTempView("_shard_probe")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    from python_vectordbapp_ceph_spark.operators.twophase import global_cumsum

    t = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7"))).alias("_k"),
    )
    c = global_cumsum(t, ["_k", "doc_id"], "n_tokens", cum_col="cum")
    again = {
        (r.doc_id, r.shard_id)
        for r in c.select(
            "doc_id",
            F.expr(f"(cum - n_tokens) div {_SHARD_BUDGET}").alias("shard_id"),
        ).collect()
    }
    assert got == again


def test_weighted_quantiles_are_monotone_and_bracketed(spark):
    rows = {r.pct: r.value for r in q_weighted_quantiles(spark, SF_DIR).collect()}
    assert sorted(rows) == [25, 50, 75, 90]
    vals = [rows[p] for p in (25, 50, 75, 90)]
    assert vals == sorted(vals)
    from python_vectordbapp_ceph_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents")
    lo, hi = d.agg(F.min("n_chars"), F.max("n_chars")).first()
    assert lo <= vals[0] and vals[-1] <= hi


def test_benford_shares_sum_to_a_million(spark):
    rows = q_benford_digits(spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    total_ppm = sum(r.share_ppm for r in rows)
    # floor-div truncation loses < 9 ppm total
    assert 1_000_000 - 9 <= total_ppm <= 1_000_000
    assert sum(r.benford_ppm for r in rows) == 1_000_000
    for r in rows:
        assert r.dev_ppm == r.share_ppm - r.benford_ppm


def test_balanced_sample_caps_every_label(spark):
    rows = q_balanced_sample(spark, SF_DIR).collect()
    per = {}
    for r in rows:
        per.setdefault(r.label, []).append(r.rnk)
    for label, rnks in per.items():
        assert len(rnks) <= _BALANCE_CAP
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_balanced_sample_plan_uses_window_group_limit(spark):
    """rank<=k must compile to WindowGroupLimit: map-side pre-pruning
    to local top-k per label BEFORE the shuffle — the property that
    keeps the exchange at O(labels*k) rows per task at 100 TB."""
    plan = explain_str(q_balanced_sample(spark, SF_DIR), "simple")
    assert "WindowGroupLimit" in plan, plan


def test_token_shards_cumsum_window_is_partitioned(spark):
    """The global token cumsum must be two-phased — no corpus-ordered
    Window without the _pid partition spec. Pinned with the r15
    single-task gate disabled (conftest.twophase_distributed): the
    gate legitimately takes a plain window at test-fixture size."""
    import re

    from tests.conftest import twophase_distributed

    with twophase_distributed(spark):
        plan = explain_str(q_token_shards(spark, SF_DIR), "simple")
    bad = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln
        and re.search(r"_k#\d+ ASC", ln)
        and "windowspecdefinition(_pid#" not in ln
    ]
    assert bad == [], bad


def test_prefix_groups_on_crafted_rows(spark):
    """Two docs sharing an 8-token opener group together; a doc
    shorter than the prefix is excluded; distinct openers don't."""
    opener = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, opener + " tail one"),
        (2, opener + " completely different continuation here"),
        (3, "some other opener entirely with eight tokens padding x"),
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("_pref")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    p = df.filter(F.size(toks) >= 8).select(
        "doc_id", F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias("h")
    )
    groups = (
        p.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("ex"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert len(groups) == 1 and groups[0].n == 2 and groups[0].ex == 1


def test_dataset_card_metrics_are_consistent(spark):
    card = {r.metric: r.value for r in q_dataset_card(spark, SF_DIR).collect()}
    from python_vectordbapp_ceph_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents")
    n = d.count()
    assert card["n_docs"] == n
    assert card["min_chars"] <= card["mean_chars_ppm"] / 1_000_000 <= card["max_chars"]
    assert 0 <= card["exact_dup_ppm"] < 1_000_000
    assert card["total_tokens"] > 0
    assert card["n_sources"] == d.select("source").distinct().count()


def test_dataset_card_single_scan(spark):
    """The card must stay one scan of documents — no per-metric
    re-scan creep. All aggregates (incl. both count-distincts) reduce
    through Spark's expand in a single pass."""
    plan = explain_str(q_dataset_card(spark, SF_DIR), "simple")
    assert plan.count("FileScan parquet") == 1, plan


def test_cusum_flags_a_planted_changepoint(spark):
    """A series uniform for 20 days then 5x for 10 days must place the
    changepoint at (or adjacent to) the rate switch."""
    rows = []
    eid = 0
    for day in range(1, 31):
        rate = 2 if day <= 20 else 10
        for _ in range(rate):
            rows.append((eid, f"2024-03-{day:02d} 12:00:00", "probe"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string")
    e = df.select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("day")
    s = daily.select(
        "event_type", "day",
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("i"),
        F.sum("c").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("nd"),
    )
    top = (
        s.select(
            "day",
            F.abs(
                F.col("cum").cast("decimal(38,0)") * F.col("nd")
                - F.col("i").cast("decimal(38,0)") * F.col("total")
            ).alias("d"),
        )
        .orderBy(F.col("d").desc(), "day")
        .first()
    )
    # uniform-share deviation peaks exactly at the last low-rate day
    assert top.day == "2024-03-20"


def test_streaming_cusum_equals_batch(spark, tmp_path):
    """Batch/stream unification: events fed through the streaming
    monitor in TWO micro-batches (incremental view folds + manifest
    commits) must yield exactly the changepoints the batch assembly
    computes over the union of all events."""
    import json

    from python_vectordbapp_ceph_spark.operators.changepoint import (
        cusum_changepoints,
    )
    from python_vectordbapp_ceph_spark.streaming.changepoint import (
        init_monitor,
        monitor_stream,
        read_changepoints,
    )

    rows = []
    eid = 0
    for day in range(1, 25):
        for etype, rate in (("a", 3 if day <= 12 else 9), ("b", 4)):
            for _ in range(rate):
                rows.append(
                    {"event_id": eid, "ts": f"2024-05-{day:02d} 08:00:00",
                     "event_type": etype}
                )
                eid += 1
    src = tmp_path / "src"
    src.mkdir()
    half = len(rows) // 2
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows[:half]))

    view = str(tmp_path / "view")
    init_monitor(spark, view)
    schema = "event_id long, ts timestamp, event_type string"

    stream = spark.readStream.schema(schema).json(str(src))
    q = monitor_stream(stream, view, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    # second micro-batch arrives later
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows[half:]))
    q = monitor_stream(
        spark.readStream.schema(schema).json(str(src)), view,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r.event_type, r.change_day, r.dev_ppm)
        for r in read_changepoints(spark, view).collect()
    }

    from pyspark.sql import functions as F

    batch = spark.read.schema(schema).json(str(src))
    daily = batch.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    want = {
        (r.event_type, r.change_day, r.dev_ppm)
        for r in cusum_changepoints(daily).collect()
    }
    assert got == want and len(got) == 2
    # and the planted shift is where we planted it
    a = {r for r in got if r[0] == "a"}
    assert next(iter(a))[1] == "2024-05-12"


def test_shard_manifest_matches_assignment(spark):
    from python_vectordbapp_ceph_spark.queries.assembly import q_shard_manifest

    a = q_token_shards(spark, SF_DIR).collect()
    m = {r.shard_id: r for r in q_shard_manifest(spark, SF_DIR).collect()}
    per = {}
    for r in a:
        d, t = per.setdefault(r.shard_id, [0, 0])
        per[r.shard_id] = [d + 1, t + r.n_tokens]
    assert set(per) == set(m)
    for sid, (nd, nt) in per.items():
        assert (m[sid].n_docs, m[sid].n_tokens) == (nd, nt)


def test_mixture_shards_interleave_within_one_doc(spark):
    """Every FULL mixture shard must carry each source within ONE doc
    of its proportional target (stride interleaving's balance bound) —
    the property that lets a loader stream shards in order and see the
    prescribed mixture continuously, plus basic packing sanity."""
    from collections import Counter

    from python_vectordbapp_ceph_spark.queries.assembly import (
        _MIX_SHARD_DOCS,
        q_mixture_shards,
    )

    rows = q_mixture_shards(spark, "/root/testdata/sf0.01").collect()
    n_sel = Counter(r.source for r in rows)
    n = len(rows)
    shard_sizes = Counter(r.shard_id for r in rows)
    # contiguous shard ids, all full except possibly the last
    assert sorted(shard_sizes) == list(range(len(shard_sizes)))
    last = max(shard_sizes)
    assert all(
        shard_sizes[s] == _MIX_SHARD_DOCS for s in shard_sizes if s != last
    )
    full = [s for s, sz in shard_sizes.items() if sz == _MIX_SHARD_DOCS]
    assert len(full) >= 3, "sf0.01 should produce several full shards"
    per = {}
    for r in rows:
        per.setdefault(r.shard_id, Counter())[r.source] += 1
    for sid in full:
        for src, ns in n_sel.items():
            target = _MIX_SHARD_DOCS * ns / n
            assert abs(per[sid].get(src, 0) - target) <= 1.0, (
                sid, src, per[sid].get(src, 0), target
            )


def test_mixture_shards_windows_are_partitioned(spark):
    """Both mixture-shard ranks must be two-phased: no Window node may
    order by a doc-cardinality key without the _pid partition spec.
    Allowed unpartitioned windows: the ≤num-partitions _pid offsets
    and the ≤num-sources per-source prefix-offset window (orders by
    source over the per-source counts)."""
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str
    from python_vectordbapp_ceph_spark.queries.assembly import q_mixture_shards
    from tests.conftest import twophase_distributed

    with twophase_distributed(spark):
        plan = explain_str(q_mixture_shards(spark, SF_DIR), "simple")
    bad = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln
        and "windowspecdefinition(_pid#" not in ln
        and "_pid#" not in ln
        # the ns prefix-offset window: sums n_sel over source order
        and "n_sel#" not in ln
    ]
    assert bad == [], bad
