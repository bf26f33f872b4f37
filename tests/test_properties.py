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


@given(
    st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_key_bounds_and_determinism(spark, pts):
    """Morton keys stay within 2*bits bits, are deterministic, and
    preserve equality of cells."""
    from pyspark.sql import functions as F

    from python_vectordbapp_ceph_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    z = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], 10).alias("z")
    )
    rows = z.collect()
    for r in rows:
        assert 0 <= r.z < (1 << 20)
    by_cell = {}
    for r in rows:
        by_cell.setdefault((r.x, r.y), set()).add(r.z)
    assert all(len(v) == 1 for v in by_cell.values())
    # distinct cells -> distinct keys (Morton is a bijection)
    zs = [next(iter(v)) for v in by_cell.values()]
    assert len(set(zs)) == len(by_cell)


@given(st.text(max_size=80))
@settings(max_examples=30, deadline=None)
def test_scrub_pii_idempotent(spark, text):
    """scrub(scrub(x)) == scrub(x): redaction tokens never re-match."""
    from pyspark.sql import functions as F

    from python_vectordbapp_ceph_spark.functions.text import scrub_pii

    df = spark.createDataFrame([(text,)], "raw string")
    row = df.select(
        scrub_pii("raw").alias("once"),
        scrub_pii(scrub_pii("raw")).alias("twice"),
    ).collect()[0]
    assert row.once == row.twice


# --- winnowing fingerprint guarantee (pure Python kernel, no Spark) --------

_alpha = st.text(alphabet="abcdefgh ", min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_alpha, _alpha, st.text(alphabet="abcdefgh ", min_size=8, max_size=30))
def test_winnowing_shared_substring_guarantee(prefix, suffix, shared):
    """Schleimer et al. Thm: any common substring of length >= k+w-1
    (here 8) yields at least one common fingerprint — for ARBITRARY
    surrounding context, not just the fixture corpus."""
    from python_vectordbapp_ceph_spark.functions.fingerprint import (
        _fingerprints_one,
    )

    a = prefix + shared + suffix
    b = "zzz " + shared + " qqq"
    fa, fb = set(_fingerprints_one(a)), set(_fingerprints_one(b))
    assert fa & fb


@settings(max_examples=100, deadline=None)
@given(_alpha)
def test_winnowing_deterministic_and_bounded(s):
    """Same input → same fingerprints; count bounded by #windows."""
    from python_vectordbapp_ceph_spark.functions.fingerprint import (
        K,
        W,
        _fingerprints_one,
    )

    f1, f2 = _fingerprints_one(s), _fingerprints_one(s)
    assert f1 == f2
    n_windows = max(0, len(s) - K - W + 2)
    assert len(f1) <= n_windows
    if len(s) < K + W - 1:
        assert f1 == []


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=20))
def test_dedup_components_matches_union_find(spark, edges):
    """Min-label components on arbitrary random graphs must equal a
    plain Python union-find's min-reachable labels."""
    from python_vectordbapp_ceph_spark.cache import release_caches
    from python_vectordbapp_ceph_spark.operators.dedup import dedup_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes |= {a, b}
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    want = {n: find(n) for n in nodes}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    try:
        got = {
            r.id: r.comp
            for r in dedup_components(df, driver_finish_edges=4).collect()
        }
    finally:
        release_caches()
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=2, max_size=15))
def test_pagerank_conserves_mass(spark, edges):
    """Σ ranks over edge-covered nodes stays 1 (no dangling nodes in a
    symmetrized graph) for arbitrary random graphs."""
    from python_vectordbapp_ceph_spark.cache import release_caches
    from python_vectordbapp_ceph_spark.operators.graph import pagerank

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    try:
        ranks = [r.rank for r in pagerank(df, iterations=4).collect()]
    finally:
        release_caches()
    assert math.isclose(sum(ranks), 1.0, abs_tol=1e-9)
    assert all(r > 0 for r in ranks)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 999)),
                min_size=1, max_size=30))
def test_salted_join_equals_plain_join(spark, rows):
    """Salting must be row-identical to the plain join for arbitrary
    (skewed) key distributions — including keys only on one side."""
    from python_vectordbapp_ceph_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(k, v) for k, v in rows], "k long, v long"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (5, "z")], "k long, tag string")
    plain = {(r.k, r.v, r.tag) for r in left.join(right, "k").collect()}
    salted = {
        (r.k, r.v, r.tag)
        for r in salted_join(left, right, on="k", salt=4,
                             salt_cols=["k", "v"]).collect()
    }
    assert salted == plain
