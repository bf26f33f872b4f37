"""operators/twophase.py — the distributed global-cumsum primitive
must be value-identical to the naive single-partition window on any
input, ordering direction, and physical layout."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_vectordbapp_ceph_spark.operators.twophase import global_cumsum


def _naive(df, order_cols, val, cum_col=None, before_col=None):
    w = Window.orderBy(*order_cols)
    out = df
    if cum_col:
        out = out.withColumn(
            cum_col,
            F.sum(val).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    if before_col:
        out = out.withColumn(
            before_col,
            F.coalesce(
                F.sum(val).over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    return out


def _mk(spark, n=997, parts=13):
    # deterministic pseudo-random values with repeated keys (ties must
    # be broken by the id column for a total order)
    return spark.range(n).repartition(parts).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(37)).alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)) + 1).alias("v"),
    )


def test_matches_naive_ascending(spark):
    df = _mk(spark)
    got = {
        (r.id, r.cum, r.before)
        for r in global_cumsum(
            df, ["k", "id"], "v", cum_col="cum", before_col="before"
        ).collect()
    }
    want = {
        (r.id, r.cum, r.before)
        for r in _naive(df, ["k", "id"], F.col("v"), "cum", "before").collect()
    }
    assert got == want


def test_matches_naive_descending(spark):
    df = _mk(spark)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        (r.id, r.cum)
        for r in global_cumsum(df, order, "v", cum_col="cum").collect()
    }
    want = {
        (r.id, r.cum)
        for r in _naive(df, order, F.col("v"), "cum").collect()
    }
    assert got == want


def test_layout_invariant(spark):
    """Same rows regardless of the input's physical partitioning."""
    a = global_cumsum(_mk(spark, parts=3), ["k", "id"], "v", cum_col="cum")
    b = global_cumsum(_mk(spark, parts=31), ["k", "id"], "v", cum_col="cum")
    assert {(r.id, r.cum) for r in a.collect()} == {
        (r.id, r.cum) for r in b.collect()
    }


def test_no_unpartitioned_data_window(spark):
    """The only unpartitioned window in the plan is the prefix-offset
    one over per-partition partials (ordered by _pid)."""
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str

    plan = explain_str(
        global_cumsum(_mk(spark), ["k", "id"], "v", cum_col="cum"), "simple"
    )
    for ln in plan.splitlines():
        if "Window [" in ln and "windowspecdefinition(_pid#" not in ln:
            assert "_pid#" in ln, ln  # the offsets window orders BY _pid


def test_global_ntile_matches_naive(spark):
    """Closed-form two-phase ntile == Spark's ntile window for every
    n mod t residue (uneven buckets) and for n < n_tiles."""
    from python_vectordbapp_ceph_spark.operators.twophase import global_ntile

    for n in (997, 996, 2, 40):
        df = _mk(spark, n=n)
        got = {
            (r.id, r.t)
            for r in global_ntile(df, ["v", "id"], 4, "t").collect()
        }
        want = {
            (r.id, r.t)
            for r in df.select(
                "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("t")
            ).collect()
        }
        assert got == want, f"n={n}"


def test_global_ntile_no_unpartitioned_data_window(spark):
    from python_vectordbapp_ceph_spark.operators.twophase import global_ntile
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str

    plan = explain_str(global_ntile(_mk(spark), ["v", "id"], 4, "t"), "simple")
    for ln in plan.splitlines():
        if "Window [" in ln and "windowspecdefinition(_pid#" not in ln:
            assert "_pid#" in ln, ln  # the offsets window orders BY _pid
