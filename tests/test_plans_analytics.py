"""Plan hygiene for the round-4 analytics queries: the predicates must
reach the parquet scans and the dimension sides must broadcast — the
properties that make these shapes survive a 100× scale-up."""

from python_vectordbapp_ceph_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
)
from python_vectordbapp_ceph_spark.queries.analytics import (
    q_exists_subquery,
    q_tpch_q6,
    q_tpch_q10,
    q_tpch_q14,
    q_tpch_q18,
)

from conftest import SF_DIR


def test_q6_predicates_push_to_scan(spark):
    pushed = pushed_filters(q_tpch_q6(spark, SF_DIR))
    joined = " ".join(pushed)
    assert "l_shipdate" in joined and "l_discount" in joined and "l_quantity" in joined


def test_q10_filters_push_and_nation_broadcasts(spark):
    q = q_tpch_q10(spark, SF_DIR)
    joined = " ".join(pushed_filters(q))
    assert "o_orderdate" in joined and "l_returnflag" in joined
    assert has_broadcast_join(q)


def test_q14_part_broadcasts(spark):
    assert has_broadcast_join(q_tpch_q14(spark, SF_DIR))


def test_q18_semi_join_broadcasts(spark):
    plan = explain_str(q_tpch_q18(spark, SF_DIR), "simple")
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_exists_subquery_decorrelates_to_joins(spark):
    """EXISTS/NOT EXISTS must compile to semi/anti joins, not a per-row
    subquery plan."""
    plan = explain_str(q_exists_subquery(spark, SF_DIR), "simple")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q15_revenue_materializes_once(spark):
    """The revenue aggregate feeds both the max and the join-back; it
    must come from the persisted intermediate, not re-run the lineitem
    scan+shuffle per consumer."""
    from python_vectordbapp_ceph_spark.cache import release_caches
    from python_vectordbapp_ceph_spark.queries.analytics import q_tpch_q15

    try:
        plan = explain_str(q_tpch_q15(spark, SF_DIR), "simple")
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        release_caches()

def test_q7_date_filter_pushes_and_dims_broadcast(spark):
    from python_vectordbapp_ceph_spark.queries.analytics import q_tpch_q7

    q = q_tpch_q7(spark, SF_DIR)
    assert "l_shipdate" in " ".join(pushed_filters(q))
    assert has_broadcast_join(q)


def test_q8_part_type_prunes_before_orders_shuffle(spark):
    from python_vectordbapp_ceph_spark.queries.analytics import q_tpch_q8

    q = q_tpch_q8(spark, SF_DIR)
    joined = " ".join(pushed_filters(q))
    assert "p_type" in joined and "o_orderdate" in joined
    assert has_broadcast_join(q)


def test_q21_late_lines_materialize_once(spark):
    """The late orders<->lineitem join feeds both the l1 side and the
    per-order late-supplier aggregate; the persisted intermediate must
    serve both consumers instead of re-running the shuffle."""
    from python_vectordbapp_ceph_spark.cache import release_caches
    from python_vectordbapp_ceph_spark.queries.analytics import q_tpch_q21

    try:
        plan = explain_str(q_tpch_q21(spark, SF_DIR), "simple")
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        release_caches()


def test_tfidf_tf_materializes_once(spark):
    """The (doc,term) tf aggregate feeds three consumers (df, N, join);
    the persisted intermediate must serve all of them instead of
    re-running the explode+shuffle per consumer."""
    from python_vectordbapp_ceph_spark.cache import release_caches
    from python_vectordbapp_ceph_spark.queries.textops import q_tfidf_topk

    try:
        plan = explain_str(q_tfidf_topk(spark, SF_DIR), "simple")
        # tf's three consumers (df agg, N agg, score join) must all read
        # the cache; the explode lines inside each InMemoryTableScan are
        # the cached relation's description, not re-execution
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        release_caches()
