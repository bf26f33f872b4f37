"""Property-based spot checks (hypothesis): algebraic invariants that
must hold for arbitrary inputs, not just the fixture tables."""

import math

from hypothesis import given, settings, strategies as st

from python_vectordbapp_ceph_spark.functions import vector as V
from python_vectordbapp_ceph_spark.operators.mutation import upsert_last_writer

finite = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(finite, min_size=4, max_size=4), min_size=1, max_size=8))
def test_l2_normalize_unit_norm(spark, vecs):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "id long, embedding array<float>")
    out = df.select(V.l2_norm(V.l2_normalize("embedding")).alias("n"),
                    V.l2_norm("embedding").alias("orig")).collect()
    for r in out:
        if r.orig == 0.0:
            assert r.n == 0.0  # zero vectors pass through (sklearn rule)
        else:
            assert math.isclose(r.n, 1.0, rel_tol=1e-9)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(finite, min_size=4, max_size=4), min_size=2, max_size=6))
def test_cosine_symmetry_and_self_similarity(spark, vecs):
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    a = df.selectExpr("id AS ia", "v AS va")
    b = df.selectExpr("id AS ib", "v AS vb")
    from pyspark.sql import functions as F

    pairs = a.crossJoin(b).select(
        "ia", "ib",
        V.cosine_similarity(F.col("va"), F.col("vb")).alias("s"),
    ).collect()
    sim = {(r.ia, r.ib): r.s for r in pairs}
    for (i, j), s in sim.items():
        if s is not None and sim[(j, i)] is not None and not math.isnan(s):
            assert math.isclose(s, sim[(j, i)], rel_tol=1e-9)  # symmetric
    for i, v in enumerate(vecs):
        s = sim[(i, i)]
        if any(x != 0 for x in v) and s is not None and not math.isnan(s):
            assert math.isclose(s, 1.0, rel_tol=1e-9)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 99)),
                min_size=1, max_size=20))
def test_upsert_last_writer_max_ts_wins(spark, rows):
    df = spark.createDataFrame(
        [(f"k{k}", ts, val) for k, ts, val in rows],
        "key string, ts long, val long",
    )
    out = upsert_last_writer(df, ["key"], "ts", tiebreak_cols=["val"])
    got = {r.key: (r.ts, r.val) for r in out.collect()}
    want = {}
    for k, ts, val in rows:
        key = f"k{k}"
        if key not in want or (ts, val) > want[key]:
            want[key] = (ts, val)
    assert got == want
