"""Deeper analytics surface: classic TPC-H query shapes over the
driver tables plus the SQL-subquery and conditional-aggregate forms
(the query capability the reference delegates wholesale to its
backend — milvus-app/describe.py:26-31 exposes filter/query over
collections; a user replacing that backend needs the full relational
question set, not just point filters).

Every query here follows the registry's determinism rules
(queries/__init__.py): decimal-exact money aggregation, identical
scalar double math in both engines, unique-key tiebreaks on any
top-k, and scalar (driver-hashable) output columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ._common import T, dec2

def _disc_price():
    """Revenue term shared by the TPC-H shapes: price * (1 - discount)
    in exact decimal — order-insensitive at any parallelism. Built
    lazily (Column construction needs an active SparkContext)."""
    return dec2("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - dec2("l_discount")
    )


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "q_tpch_q6",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate.
    All four predicates push to the parquet scan; the aggregate is a
    single partial+final pair with no grouping key — the cheapest
    possible 100 TB query, bounded by scan bandwidth alone."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec2("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): selective fact filters →
    join chain → aggregate → top-20 (TakeOrderedAndProject, tie-broken
    on the unique custkey). nation broadcasts; the orders date filter
    prunes before the lineitem join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    n = T(spark, sf_dir, "nation")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority split; linestatus stands in
    for the shipmode column the test tables omit): join + pivot-style
    conditional counts, integer-exact in both engines."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN {_DISC_PRICE_SQL} ELSE 0 END) AS DOUBLE)
                / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue ratio. Both
    sums are exact decimals; the single 100*promo/total division runs
    as the same double ops in both engines. part broadcasts (dim)."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double")
            )
            .cast("double")
            .alias("promo_pct")
        )
    )


@register(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS total,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY total DESC, o_orderkey LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): HAVING-filtered aggregate
    feeding a semi-join back into the detail — the classic two-pass
    fact-self-reference. The `big` key set is tiny after HAVING →
    broadcast semi-join; quantities aggregate in exact decimal."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(
            F.broadcast(big).withColumnRenamed("l_orderkey", "_big_key"),
            F.col("o_orderkey") == F.col("_big_key"),
            "left_semi",
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("total"),
            "qty",
        )
        .orderBy(F.col("total").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface —
    Catalyst decorrelates both into a left-semi + left-anti join pair
    (one shuffle each on the correlation key; no per-row subquery
    execution, which is what makes the form survive 100 TB)."""
    T(spark, sf_dir, "customer").createOrReplaceTempView("_an_customer")
    T(spark, sf_dir, "orders").createOrReplaceTempView("_an_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _an_customer c
        WHERE EXISTS (SELECT 1 FROM _an_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM _an_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        """
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice > 2 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (orders above 2× the mean price). The mean is
    an exact decimal sum over a double count — both engines compute
    the identical threshold, so the filtered set matches exactly.
    Catalyst evaluates the subquery once and broadcasts the scalar."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("_an_orders_sc")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
        FROM _an_orders_sc
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM _an_orders_sc)
        """
    )


@register(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_total,
           arg_max(o_orderpriority, o_orderkey) AS latest_priority,
           arg_min(o_orderpriority, o_orderkey) AS first_priority
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if / filtered decimal sum /
    max_by-min_by. The max_by/min_by ordering value is the UNIQUE
    orderkey, so the arg extremes are total-ordered and deterministic
    (an arg over a tied column would be engine-dependent)."""
    o = T(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(urgent).alias("n_urgent"),
        F.sum(
            F.when(urgent, dec2("o_totalprice")).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("urgent_total"),
        F.max_by("o_orderpriority", "o_orderkey").alias("latest_priority"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
    )


@register(
    "q_bitwise_funcs",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS mixed,
           event_id << 2 AS shl,
           event_id >> 3 AS shr,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (mask/shift/popcount) — integer-exact in
    any engine; used by bucketing and fingerprint code paths."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ user_id").alias("mixed"),
        F.shiftleft("event_id", 2).alias("shl"),
        F.shiftright("event_id", 3).alias("shr"),
        F.bit_count("event_id").alias("popcount"),
    )


@register("q_zorder_pruning")  # layout rewrite + footer-stats audit → rows-only
def q_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout demo (write path): rewrite events clustered on
    (event_id, user_id), then report file-level stats pruning for a
    selective user_id range under both a 1-D sorted layout and the
    Morton layout. Returns one row per layout — the z-order row must
    show fewer matching files. Rows-only: the output includes write-
    side file counts, not a SQL-expressible value."""
    import tempfile

    from ..operators.zorder import file_stats_pruning, zorder_write

    e = T(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = tempfile.mkdtemp(prefix="zorder_q_")
    linear, zpath = f"{base}/linear", f"{base}/zorder"
    (
        e.repartitionByRange(8, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(e, ["event_id", "user_id"], zpath, bits=10, num_files=8)
    uid_max = e.agg(F.max("user_id")).collect()[0][0] or 0
    pred = {"user_id": (0, max(0, uid_max // 8))}
    rows = [
        ("linear_event_id", *file_stats_pruning(linear, pred)),
        ("zorder_event_user", *file_stats_pruning(zpath, pred)),
    ]
    return spark.createDataFrame(
        rows, "layout string, files_total long, files_matching long"
    )


@register(
    "q_window_navigation",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           coalesce(CAST(lag(o_totalprice) OVER w AS DOUBLE), -1.0) AS prev_total,
           coalesce(CAST(lead(o_totalprice) OVER w AS DOUBLE), -1.0) AS next_total,
           CAST(first_value(o_totalprice) OVER w2 AS DOUBLE) AS first_total,
           CAST(last_value(o_totalprice) OVER w2 AS DOUBLE) AS last_total,
           coalesce(CAST(nth_value(o_totalprice, 2) OVER w2 AS DOUBLE), -1.0)
             AS second_total,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey),
           w2 AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation surface (C15/C16 completion): lag/lead,
    first/last/nth value over the full-partition frame, ntile,
    percent_rank, cume_dist — all ordered by the UNIQUE orderkey so
    every value is total-ordered and engine-independent. One shuffle
    on the partition key serves all ten expressions (same window)."""
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    total = F.col("o_totalprice").cast("double")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce(F.lag(total).over(w), F.lit(-1.0)).alias("prev_total"),
        F.coalesce(F.lead(total).over(w), F.lit(-1.0)).alias("next_total"),
        F.first(total).over(w2).alias("first_total"),
        F.last(total).over(w2).alias("last_total"),
        F.coalesce(F.nth_value(total, 2).over(w2), F.lit(-1.0)).alias(
            "second_total"
        ),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q_array_set_funcs",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             range(o_orderkey % 5, o_orderkey % 5 + 4) AS a,
             range(o_orderkey % 3, o_orderkey % 3 + 4) AS b
      FROM orders)
    SELECT o_orderkey,
           array_to_string(list_sort(list_distinct(a || b)), ',') AS union_csv,
           coalesce(array_to_string(list_sort(list_filter(a,
                      x -> list_contains(b, x))), ','), '') AS intersect_csv,
           coalesce(array_to_string(list_sort(list_filter(a,
                      x -> NOT list_contains(b, x))), ','), '') AS except_csv,
           CAST(list_position(a, (o_orderkey % 5) + 2) AS INTEGER) AS pos_of_third,
           list_contains(b, 3) AS has_three
    FROM t
    """,
)
def q_array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (C22 completion): union/intersect/except,
    position, contains — over integer sequences derived from the key
    (deterministic). Set results are sorted then joined to strings so
    the output is scalar and order-canonical in both engines."""
    o = T(spark, sf_dir, "orders")
    a = F.sequence(F.pmod("o_orderkey", F.lit(5)), F.pmod("o_orderkey", F.lit(5)) + 3)
    b = F.sequence(F.pmod("o_orderkey", F.lit(3)), F.pmod("o_orderkey", F.lit(3)) + 3)
    return o.select(
        "o_orderkey",
        F.concat_ws(",", F.array_sort(F.array_union(a, b))).alias("union_csv"),
        F.concat_ws(",", F.array_sort(F.array_intersect(a, b))).alias(
            "intersect_csv"
        ),
        F.concat_ws(",", F.array_sort(F.array_except(a, b))).alias("except_csv"),
        F.array_position(a, F.pmod("o_orderkey", F.lit(5)) + 2)
        .cast("int")
        .alias("pos_of_third"),
        F.array_contains(b, 3).alias("has_three"),
    )


@register(
    "q_salted_join_rows",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_salted_join_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted skew join (operators/skew.py) at ROW level: the
    probe side gets a deterministic xxhash64 salt, the build side
    replicates salt×, the hot key spreads over salt partitions — and
    the RESULT is row-identical to the plain equi-join, which is
    exactly what the oracle states. Complements q_salted_join
    (curation.py), which proves the same identity through an
    aggregate; this one hash-checks every individual joined row.
    (Until round 6 both shared one name and the import order silently
    shadowed this version — the registry now rejects duplicates.)"""
    from ..operators.skew import salted_join

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    out = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        on="k",
        salt=4,
        salt_cols=["l_linenumber"],
    )
    return out.select(
        F.col("k").alias("l_orderkey"), "l_linenumber", "o_orderstatus"
    )


@register(
    "q_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op,
             o_orderkey % 3 + 1 AS seq,
             o_orderpriority AS val
      FROM orders WHERE o_orderkey % 2 = 0),
    base AS (
      SELECT o_orderkey AS key, 'upsert' AS op, 0 AS seq,
             o_orderstatus AS val
      FROM orders),
    unioned AS (SELECT * FROM base UNION ALL SELECT * FROM log),
    ranked AS (
      SELECT key, op, val,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM unioned)
    SELECT key, val FROM ranked WHERE rn = 1 AND op != 'delete'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC resolve (operators/mutation.py::apply_change_log):
    base ∪ change-log, last-writer-wins per key, final-delete keys
    drop — the webhook Put/Copy-vs-Delete branch as one set operation.
    The log here is derived deterministically from orders (even keys
    mutate; every 10th deletes) so the oracle can state the same
    resolve with a window."""
    from ..operators.mutation import apply_change_log

    o = T(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("key"),
        F.lit(0).cast("long").alias("seq"),
        F.col("o_orderstatus").alias("val"),
    )
    log = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 10 == 0, "delete")
        .otherwise("upsert")
        .alias("op"),
        (F.pmod("o_orderkey", F.lit(3)) + 1).cast("long").alias("seq"),
        F.col("o_orderpriority").alias("val"),
    )
    return apply_change_log(base, log, key_cols=["key"], ts_col="seq").select(
        "key", "val"
    )


@register(
    "q_explode_outer",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN []
                  ELSE range(0, o_orderkey % 4 + 1) END AS items
      FROM orders),
    e AS (
      SELECT t.o_orderkey, u.item
      FROM t LEFT JOIN LATERAL (SELECT unnest(items) AS item) u ON true)
    SELECT o_orderkey,
           coalesce(CAST(item AS BIGINT), -1) AS item
    FROM e
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (explode_outer): rows with an empty
    array survive with a sentinel instead of disappearing — the
    semantics a fact-expansion join needs when absence is data. The
    oracle states it as a left lateral unnest."""
    o = T(spark, sf_dir, "orders")
    items = F.when(
        F.pmod("o_orderkey", F.lit(7)) == 0, F.array().cast("array<bigint>")
    ).otherwise(F.sequence(F.lit(0).cast("bigint"), F.pmod("o_orderkey", F.lit(4))))
    return o.select("o_orderkey", F.explode_outer(items).alias("item")).select(
        "o_orderkey", F.coalesce("item", F.lit(-1)).alias("item")
    )


@register(
    "q_tpch_q13",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority != '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): left join with an ON-
    clause filter (kept customers with zero orders count as c_count=0)
    feeding a second aggregation over the first — the histogram-of-
    aggregates shape. Two shuffles, both on shrinking data."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): aggregate-then-join-back-on-max — the
    argmax-via-scalar-subquery shape. The revenue aggregate feeds BOTH
    the max and the join, so it is persisted (one row per supplier —
    tiny); without the barrier the lineitem scan+shuffle — the
    dominant cost at scale — executes twice (verified in the physical
    plan). Revenue is decimal-exact so the max comparison is
    deterministic."""
    from ..cache import tracked_persist

    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    revenue = tracked_persist(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_tpch_q17",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.2 * a.aq
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    per-group average decorrelated into an aggregate-and-rejoin —
    the standard rewrite that replaces a per-row subquery with one
    extra shuffle. The mean is an exact decimal sum over a count, so
    the 0.2×avg threshold compares identically in both engines."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("aq")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            (F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking; late-shipment stands in
    for the commit/receipt columns the test tables omit): correlated
    EXISTS with an inequality on both sides' columns → left-semi join,
    then a tiny aggregate."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    return (
        filtered.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the
    OR-of-ANDs filter spans both join sides, so it evaluates post-join
    while the per-side conjuncts Catalyst can derive (brand/size sets)
    still push down. part broadcasts."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q22",
    oracle="""
    WITH rich AS (
      SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                     AS DOUBLE) / COUNT(*)
                         FROM customer WHERE c_acctbal > 0.0))
    SELECT r.c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(r.bal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM rich r
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = r.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY r.c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity; mktsegment stands in
    for the phone country code): scalar-subquery threshold (exact
    decimal mean) + anti join against orders + aggregate. The anti
    join is the scale piece — never materializes the complement."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    mean = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("m"))
    )
    rich = c.join(F.broadcast(mean), F.col("c_acctbal") > F.col("m")).select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double").alias("bal")
    )
    return (
        rich.join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec2("bal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_region, cust_region, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               {_DISC_PRICE_SQL} AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN region r1  ON n1.n_regionkey = r1.r_regionkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r2  ON n2.n_regionkey = r2.r_regionkey
        WHERE ((r1.r_name = 'AMERICA' AND r2.r_name = 'ASIA')
            OR (r1.r_name = 'ASIA' AND r2.r_name = 'AMERICA'))
          AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) shipping
    GROUP BY supp_region, cust_region, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two trading partners, by
    year; region stands in for nation so the pair is populated at
    every test scale — the two-sided disjunctive pair filter and the
    year rollup are Q7's shape). Dims broadcast; the pair filter
    lands on the joined row before aggregation, and the date filter
    pushes to the lineitem scan. At 100 TB this is broadcast joins
    plus the unavoidable orders<->lineitem shuffle — nothing else."""
    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    n_r = n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", F.col("r_name")
    )
    n1 = F.broadcast(n_r.select(F.col("n_nationkey").alias("sk"), F.col("r_name").alias("supp_region")))
    n2 = F.broadcast(n_r.select(F.col("n_nationkey").alias("ck"), F.col("r_name").alias("cust_region")))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("sk") == F.col("s_nationkey"))
        .join(n2, F.col("ck") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_region") == "AMERICA") & (F.col("cust_region") == "ASIA"))
            | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "AMERICA"))
        )
        .groupBy("supp_region", "cust_region", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_DISC_PRICE_SQL} AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share within a region for a part
    type). Ratio of two decimal-exact sums, divided as doubles and
    rounded — identical IEEE ops in both engines. The part-type
    filter prunes lineitem early via the broadcast part join; region
    and nation dims broadcast."""
    p = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    n2 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation"))
    asia = F.broadcast(
        n1.join(r.filter(F.col("r_name") == "ASIA"), F.col("crk") == F.col("r_regionkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(asia, F.col("ck") == F.col("c_nationkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("sk") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _disc_price().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_DISC_PRICE_SQL} AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year; the
    test tables carry no partsupp, so profit is the discounted price
    — the join/aggregate skeleton is Q9's). The p_name LIKE filter
    rides the broadcast part join, pruning lineitem before the orders
    shuffle."""
    p = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p.filter(F.col("p_name").like("%red%"))), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; "late" is
    shipdate > orderdate + 90 days since the test lineitem has no
    commit/receipt dates). The EXISTS / NOT EXISTS pair is rewritten
    as per-order aggregates — one pass over lineitem computes
    distinct-supplier counts, one pass over the late lines computes
    distinct-late-supplier counts, and the filter `nsupp > 1 AND
    nlate = 1` reproduces the correlated semantics without any
    per-row subquery. The late join output is persisted so the l1
    side and the nlate aggregate share a single orders<->lineitem
    shuffle."""
    from ..cache import tracked_persist

    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    late = tracked_persist(
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    nsupp = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("nsupp")
    ).filter(F.col("nsupp") > 1).select(F.col("l_orderkey").alias("ok_multi"))
    nlate = late.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("nlate")
    ).filter(F.col("nlate") == 1).select(F.col("l_orderkey").alias("ok_solo"))
    return (
        late.join(nsupp, F.col("ok_multi") == F.col("l_orderkey"))
        .join(nlate, F.col("ok_solo") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@register(
    "q_tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship counts; the test
    tables carry no partsupp, so the DISTINCT (l_partkey, l_suppkey)
    pairs observed in lineitem stand in for it, and negative account
    balance stands in for the complaints subquery). Supplier
    exclusion decorrelates to an anti join; the part filters ride the
    broadcast join; the final count-distinct aggregates the already-
    distinct pair set — one partial+final pair per grouping."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    s = T(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(
            F.broadcast(
                p.filter(
                    (F.col("p_brand") != "Brand#1")
                    & ~F.col("p_type").like("PROMO%")
                    & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q2",
    oracle="""
    WITH price AS (
        SELECT l.l_partkey, s.s_suppkey, s.s_name, n.n_name,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS unit_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1, 2, 3, 4)
    SELECT p.p_partkey, p.p_name, pr.s_name, pr.n_name,
           CAST(pr.rev AS DOUBLE) AS sum_rev,
           CAST(pr.qty AS DOUBLE) AS sum_qty
    FROM part p
    JOIN price pr ON pr.l_partkey = p.p_partkey
    WHERE p.p_size = 9
      AND pr.unit_cost = (SELECT MIN(pr2.unit_cost) FROM price pr2
                          WHERE pr2.l_partkey = p.p_partkey)
      AND pr.s_suppkey = (SELECT MIN(pr3.s_suppkey) FROM price pr3
                          WHERE pr3.l_partkey = p.p_partkey
                            AND pr3.unit_cost = pr.unit_cost)
    ORDER BY p.p_partkey
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part in a region; the
    test tables carry no partsupp, so observed unit price — decimal
    revenue over decimal quantity per (part, supplier) — stands in
    for ps_supplycost). The correlated MIN subquery decorrelates to a
    per-part window: rank suppliers by (unit_cost, s_suppkey) inside
    each part and keep rank 1 — one shuffle on partkey instead of a
    per-row subquery; the suppkey tiebreak makes the pick total. At
    100 TB the region filter prunes the supplier side before the
    lineitem join, and the window reuses the aggregate's partitioning."""
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    p = T(spark, sf_dir, "part")
    eu_supp = F.broadcast(
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r.filter(F.col("r_name") == "EUROPE"), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    price = (
        li.join(eu_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "n_name")
        .agg(
            F.sum(dec2("l_extendedprice")).alias("rev"),
            F.sum(dec2("l_quantity")).alias("qty"),
        )
        # UNROUNDED double ratio for ordering/selection only (identical
        # IEEE value in both engines); the OUTPUT carries the exact
        # decimal sums — a rounded quotient hash-diverged at sf0.1 when
        # one value sat on a 5e-7 representation boundary (Spark rounds
        # the shortest-repr BigDecimal, DuckDB the scaled binary).
        .withColumn(
            "unit_cost",
            F.col("rev").cast("double") / F.col("qty").cast("double"),
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("s_suppkey").asc()
    )
    best = (
        price.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        best.join(
            F.broadcast(p.filter(F.col("p_size") == 9)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("rev").cast("double").alias("sum_rev"),
            F.col("qty").cast("double").alias("sum_qty"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY l_partkey)
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM val
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM val)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock: parts whose value within one
    region exceeds a fraction of the regional total; lineitem revenue
    stands in for partsupp value, and region scope keeps the supplier
    side populated at every test scale). The scalar-subquery
    threshold is a broadcast single-row cross join over the SAME
    persisted aggregate — the lineitem scan+shuffle runs once,
    mirroring the Q15 fix."""
    from ..cache import tracked_persist

    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    nat_supp = F.broadcast(
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            r.filter(F.col("r_name") == "ASIA"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey")
    )
    val = tracked_persist(
        li.join(nat_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec2("l_extendedprice")).alias("part_value"))
    )
    # decimal*decimal keeps the threshold exact in both engines
    thresh = val.agg(
        (F.sum("part_value") * F.lit("0.001").cast("decimal(6,4)")).alias("_t")
    )
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("_t"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH red_qty AS (
        SELECT l.l_suppkey, SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM red_qty WHERE qty > 50)
    ORDER BY s.s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with meaningful flow of a part
    family in a year; shipped quantity stands in for partsupp
    availability). A chain of semi joins: part-name filter → lineitem
    aggregate → threshold → semi join into supplier. Nothing wider
    than (suppkey, qty) ever shuffles; the part filter broadcasts."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    red = F.broadcast(p.filter(F.col("p_name").like("red%")).select("p_partkey"))
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(red, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qty), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --- Pareto skyline ---------------------------------------------------------

@register(
    "q_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_size,
           CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over part (minimize retail price, maximize size):
    a part survives iff no other part is at least as good in both
    dimensions and strictly better in one. The naive formulation (the
    oracle's NOT EXISTS) is an all-pairs theta anti-join — quadratic
    and infeasible at 100 TB. The Spark plan collapses it to two
    linear passes: (1) a hash aggregate to max-size-per-price (output
    bounded by DISTINCT prices, not rows), (2) a running-max window
    over the price-ordered aggregate — a price level survives iff its
    best size strictly exceeds every cheaper level's best — then (3) a
    broadcast join back tags the surviving (price, max-size) rows.
    The only global sort runs over the aggregated price levels."""
    from pyspark.sql.window import Window

    p = T(spark, sf_dir, "part").select(
        "p_partkey", "p_size", dec2("p_retailprice").alias("_price")
    )
    levels = p.groupBy("_price").agg(F.max("p_size").alias("_msz"))
    w = Window.orderBy("_price").rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        levels.withColumn("_best_cheaper", F.max("_msz").over(w))
        .filter(
            F.col("_best_cheaper").isNull()
            | (F.col("_msz") > F.col("_best_cheaper"))
        )
        .select(F.col("_price").alias("_fp"), F.col("_msz").alias("_fsz"))
    )
    return (
        p.join(
            F.broadcast(frontier),
            (F.col("_price") == F.col("_fp")) & (F.col("p_size") == F.col("_fsz")),
        )
        .select("p_partkey", "p_size", F.col("_price").cast("double").alias("price"))
    )


# --- RFM customer segmentation ---------------------------------------------

@register(
    "q_rfm_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS freq,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT custkey,
               ntile(4) OVER (ORDER BY last_order, custkey) AS r,
               ntile(4) OVER (ORDER BY freq, custkey) AS f,
               ntile(4) OVER (ORDER BY monetary, custkey) AS m
        FROM base
    )
    SELECT r || '-' || f || '-' || m AS segment,
           COUNT(*) AS n_customers
    FROM scored GROUP BY segment
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency / frequency / monetary,
    each cut into EXACT quartiles, concatenated to a segment label and
    counted. Every quartile ordering carries the custkey tiebreak so
    ranks are a total order (engine-independent). Each quartile is the
    closed-form ntile over a two-phase distributed global rank
    (operators/twophase.global_ntile) — the per-customer table is
    range-partitioned per dimension and NO data-cardinality window
    runs on a single task, so the plan survives 100× customers (the
    r7 version pushed every customer through three unpartitioned
    ntile windows; plan-pinned in tests/test_plans_analytics.py)."""
    from ..operators.twophase import global_ntile

    o = T(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(dec2("o_totalprice")).alias("monetary"),
    )
    scored = global_ntile(base, ["last_order", "custkey"], 4, "r")
    scored = global_ntile(scored, ["freq", "custkey"], 4, "f")
    scored = global_ntile(scored, ["monetary", "custkey"], 4, "m")
    return (
        scored.select(
            F.concat_ws("-", "r", "f", "m").alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- z-score outliers, division-free exact arithmetic ----------------------

@register(
    "q_outlier_zscore",
    oracle="""
    WITH st AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(CAST(value * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS s,
               SUM(CAST(CAST(value * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0))
                   * CAST(CAST(value * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS ss
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) AS value
    FROM events e JOIN st ON e.event_type = st.event_type
    WHERE (st.n * CAST(CAST(e.value * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0)) - st.s)
          * (st.n * CAST(CAST(e.value * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0)) - st.s)
          > 4 * (st.n * st.ss - st.s * st.s)
    """,
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 2-sigma outliers with DIVISION-FREE exact
    arithmetic: |x - mean| > 2*stddev is algebraically identical to
    (n*x - S)^2 > 4*(n*SS - S^2) with S=sum(x), SS=sum(x^2) — every
    operand an exact integer (cent-scaled values in DECIMAL(38,0)),
    so the outlier set is bit-identical across engines and partition
    orders, where a float mean/stddev pipeline would be neither. Two
    scans of events (one aggregate, one probe) joined by a broadcast
    of the tiny per-type stats table — no global shuffle of the fact
    side at any scale."""
    e = T(spark, sf_dir, "events")
    cents = (
        (F.col("value") * 100).cast("decimal(18,0)").cast("decimal(38,0)")
    )
    st = (
        e.select("event_type", cents.alias("_c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("s"),
            F.sum(F.col("_c") * F.col("_c")).alias("ss"),
        )
    )
    probe = e.select(
        "event_id",
        F.col("event_type").alias("_et"),
        dec2("value").cast("double").alias("value"),
        cents.alias("_c"),
    )
    dev = F.col("n") * F.col("_c") - F.col("s")
    spread = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        probe.join(F.broadcast(st), probe["_et"] == st["event_type"])
        .filter(dev * dev > 4 * spread)
        .select("event_id", "event_type", "value")
    )


# --- exact per-group median and deterministic mode -------------------------

@register(
    "q_median_mode",
    oracle="""
    WITH cnts AS (
        SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v, COUNT(*) AS c
        FROM events GROUP BY event_type, v
    ),
    md AS (
        SELECT event_type, MIN(v) AS mode_value
        FROM cnts q
        WHERE c = (SELECT MAX(c) FROM cnts q2 WHERE q2.event_type = q.event_type)
        GROUP BY event_type
    )
    SELECT e.event_type,
           quantile_cont(CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE), 0.5)
               AS median_value,
           CAST(ANY_VALUE(md.mode_value) AS DOUBLE) AS mode_value,
           COUNT(*) AS n
    FROM events e JOIN md ON e.event_type = md.event_type
    GROUP BY e.event_type
    """,
)
def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (interpolated, Spark `percentile` ==
    DuckDB `quantile_cont` on 2-decimal values — the midpoint average
    of exact doubles is itself exact) and a DETERMINISTIC mode: both
    engines' bare mode() leaves ties unspecified, so the mode is
    computed explicitly as min(value) among max-count values — a
    value-level aggregate (bounded by distinct values per group), a
    per-group max, and a broadcast join. percentile is the one
    genuinely sort-based term; it runs per-group, partition-parallel."""
    e = T(spark, sf_dir, "events").select(
        "event_type", dec2("value").alias("_v")
    )
    cnts = e.groupBy("event_type", "_v").agg(F.count(F.lit(1)).alias("_cnt"))
    mode = (
        cnts.groupBy("event_type")
        .agg(
            F.min_by(
                F.struct(F.col("_cnt"), F.col("_v")),
                F.struct(-F.col("_cnt"), F.col("_v")),
            ).alias("_top")
        )
        .select(
            F.col("event_type").alias("_et"),
            F.col("_top._v").cast("double").alias("mode_value"),
        )
    )
    med = e.groupBy("event_type").agg(
        F.percentile(F.col("_v").cast("double"), F.lit(0.5)).alias("median_value"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        med.join(F.broadcast(mode), med["event_type"] == mode["_et"])
        .select("event_type", "median_value", "mode_value", "n")
    )


# --- grouped least-squares regression --------------------------------------

@register(
    "q_regression_groups",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(l_quantity) AS sx,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS sy,
               SUM(l_quantity
                   * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS sxy,
               SUM(l_quantity * l_quantity) AS sxx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6)
               AS slope,
           round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0, 6)
               AS intercept
    FROM s
    """,
)
def q_regression_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit (price-cents vs quantity), the
    regr_slope/regr_intercept surface — computed from EXACT integer
    sufficient statistics (sx, sy, sxy, sxx are long sums; quantity
    <= 50 and cent prices keep every term under 2^63), then one
    closed-form double evaluation per group with the identical
    operand order in both engines. The whole fit is a single hash
    aggregate — sufficient statistics compose map-side, so at 100 TB
    the shuffle carries 5 longs per group, nothing else."""
    li = T(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    x = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(cents).alias("sy"),
        F.sum(x * cents).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    slope_raw = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope_raw / F.lit(100.0), 6).alias("slope"),
        F.round(
            (syd / nd - slope_raw * sxd / nd) / F.lit(100.0), 6
        ).alias("intercept"),
    )


# --- contingency table with expected counts --------------------------------

@register(
    "q_contingency",
    oracle="""
    WITH obs AS (
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               COUNT(*) AS observed
        FROM orders GROUP BY status, priority
    ),
    tot AS (SELECT SUM(observed) AS total FROM obs),
    rows_ AS (SELECT status, SUM(observed) AS row_total FROM obs GROUP BY status),
    cols_ AS (SELECT priority, SUM(observed) AS col_total FROM obs GROUP BY priority)
    SELECT o.status, o.priority, o.observed,
           round(CAST(r.row_total * c.col_total AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 6) AS expected
    FROM obs o
    JOIN rows_ r ON o.status = r.status
    JOIN cols_ c ON o.priority = c.priority
    CROSS JOIN tot t
    """,
)
def q_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table with independence-model expected counts (the
    chi-square input): observed cell counts plus expected =
    row_total * col_total / grand_total. The fact table aggregates
    ONCE to the tiny cell grid; margins and the grand total derive
    from the grid itself (re-aggregation of dozens of rows, not a
    rescan), and every join back is a broadcast. The per-cell
    expected value is one double division of exact integers — no
    cross-partition float accumulation anywhere."""
    o = T(spark, sf_dir, "orders")
    obs = (
        o.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    from ..cache import tracked_persist

    obs = tracked_persist(obs)
    rows_ = obs.groupBy("status").agg(F.sum("observed").alias("row_total"))
    cols_ = obs.groupBy("priority").agg(F.sum("observed").alias("col_total"))
    tot = obs.agg(F.sum("observed").alias("total"))
    return (
        obs.join(F.broadcast(rows_), "status")
        .join(F.broadcast(cols_), "priority")
        .crossJoin(F.broadcast(tot))
        .select(
            "status",
            "priority",
            "observed",
            F.round(
                (F.col("row_total") * F.col("col_total")).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("expected"),
        )
    )


# --- first-touch attribution -----------------------------------------------

@register(
    "q_first_touch",
    oracle="""
    WITH fp AS (
        SELECT user_id, MIN(ts) AS fp_ts
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
        SELECT e.user_id, e.event_type, e.ts, e.event_id,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN fp ON e.user_id = fp.user_id
        WHERE e.ts < fp.fp_ts AND e.event_type <> 'purchase'
    )
    SELECT event_type AS first_touch, COUNT(*) AS n_conversions
    FROM touches WHERE rn = 1
    GROUP BY event_type
    """,
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: for every converting user, credit the
    earliest non-purchase event strictly before their first purchase.
    The purchase side collapses to (user, min ts) before joining, and
    the earliest touch is a single min_by struct aggregate (ties
    broken by event_id), so the fact table is scanned once and
    shuffled once on user_id; no window materializes per-row ranks.
    The broadcast hint fits converter-cardinality here; at extreme
    user counts AQE would fall back to the same-keyed shuffle join
    the aggregate already paid for."""
    e = T(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_fp_ts"))
    )
    touches = (
        e.join(F.broadcast(fp), "user_id")
        .filter((F.col("ts") < F.col("_fp_ts")) & (F.col("event_type") != "purchase"))
        .groupBy("user_id")
        .agg(
            F.min_by(
                F.col("event_type"), F.struct("ts", "event_id")
            ).alias("first_touch")
        )
    )
    return touches.groupBy("first_touch").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


# --- top session paths -----------------------------------------------------

@register(
    "q_top_paths",
    oracle="""
    WITH s AS (
        SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id, day
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM s GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common user journeys: each (user, day) session's ordered
    event-type sequence collapses to a path string, then global top-20
    by frequency. The path assembly is the array_sort-of-structs idiom
    — (ts, event_id, type) structs aggregated per session and sorted
    IN the row, so ordering needs no window and ties are broken by
    event_id identically in both engines. Two aggregates (session,
    then path) and a TakeOrderedAndProject — at 100 TB the session
    aggregate is the only fact-scale shuffle."""
    e = T(spark, sf_dir, "events")
    s = (
        e.groupBy(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        s.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


# --- A/B experiment readout (Welch z from exact raw moments) ----------------

@register(
    "q_abtest",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority, o_orderkey % 2 AS arm,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spp
      FROM orders GROUP BY 1, 2),
    w AS (SELECT a.o_orderpriority,
                 a.n AS n_a, b.n AS n_b,
                 a.sp / a.n AS mean_a, b.sp / b.n AS mean_b,
                 (a.spp - a.sp * a.sp / a.n) / (a.n - 1.0) AS var_a,
                 (b.spp - b.sp * b.sp / b.n) / (b.n - 1.0) AS var_b
          FROM s a JOIN s b ON a.o_orderpriority = b.o_orderpriority
                           AND a.arm = 0 AND b.arm = 1)
    SELECT o_orderpriority,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
               AS welch_z
    FROM w
    """,
)
def q_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's z statistic for the spend
    difference between two deterministic arms (orderkey parity — the
    hash-bucket assignment an experimentation system uses), per
    experiment stratum. Built from EXACT raw moments (decimal sums of
    2dp money, cast to double once), so the scalar Welch formula — the
    same fixed-order IEEE ops in both engines, with sqrt correctly
    rounded by spec — hash-matches the oracle exactly; the
    q_stats_moments technique applied to experimentation.

    Plan: one partial+final aggregate on (stratum, arm) — 10 groups —
    then a self-join of the tiny aggregate table. The 100 TB cost is
    the one scan; everything after is constant-size."""
    o = T(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.groupBy(
        "o_orderpriority", (F.col("o_orderkey") % 2).alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(p * p).cast("double").alias("spp"),
    )
    a = s.filter(F.col("arm") == 0).alias("a")
    b = s.filter(F.col("arm") == 1).alias("b")
    j = a.join(b, F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
    mean_a = F.col("a.sp") / F.col("a.n")
    mean_b = F.col("b.sp") / F.col("b.n")
    var_a = (F.col("a.spp") - F.col("a.sp") * F.col("a.sp") / F.col("a.n")) / (
        F.col("a.n") - F.lit(1.0)
    )
    var_b = (F.col("b.spp") - F.col("b.sp") * F.col("b.sp") / F.col("b.n")) / (
        F.col("b.n") - F.lit(1.0)
    )
    return j.select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        F.col("a.n").cast("long").alias("n_a"),
        F.col("b.n").cast("long").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(
            (mean_a - mean_b)
            / F.sqrt(var_a / F.col("a.n") + var_b / F.col("b.n")),
            6,
        ).alias("welch_z"),
    )


# --- half-life decayed aggregation ------------------------------------------

# 7-day half-life in epoch-microseconds; ages cap at 40 half-lives so
# the power-of-two weight (1 << (40-k)) stays inside a BIGINT and events
# older than ~9 months contribute the minimum weight 1 instead of 0
# (a pure cutoff would make the metric discontinuous at the horizon).
_HL_US = 7 * 86400 * 1_000_000
_HL_CAP = 40


@register(
    "q_decay_halflife",
    oracle=f"""
    WITH ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
    w AS (SELECT event_type,
                 1::BIGINT << ({_HL_CAP} - LEAST(
                     (ref.ref_us - epoch_us(e.ts)) // {_HL_US},
                     {_HL_CAP})) AS wt,
                 CAST(floor(e.value * 1000000) AS BIGINT) AS value_micro
          FROM events e CROSS JOIN ref),
    a AS (SELECT event_type,
                 COUNT(*) AS n_events,
                 SUM(CAST(wt AS DECIMAL(38,0))) AS decayed_n,
                 SUM(CAST(wt AS DECIMAL(38,0)) * value_micro)
                     AS decayed_value_micro
          FROM w GROUP BY event_type),
    t AS (SELECT SUM(decayed_n) AS total_n FROM a)
    -- HUGEINT `//` is exact integer floor; DECIMAL `//` would round
    SELECT a.event_type, a.n_events, a.decayed_n, a.decayed_value_micro,
           CAST((CAST(a.decayed_n AS HUGEINT) * 1000000)
                // CAST(t.total_n AS HUGEINT) AS BIGINT) AS share_ppm
    FROM a CROSS JOIN t
    ORDER BY a.event_type
    """,
)
def q_decay_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed event aggregation — the recency weighting a
    feature store / trending-topics job applies so that last week's
    signal outweighs last quarter's — computed EXACTLY: the decay
    factor 2^-(age/H) is discretized to whole half-lives and applied
    as a power-of-two integer weight (1 << (CAP - k)), so the whole
    metric is integer/decimal arithmetic and no engine ever evaluates
    exp/log (the registry's no-transcendentals rule). Weighted sums
    accumulate in decimal(38,0): weight ≤ 2^40 ≈ 1.1e12 times micro
    values ≤ 5e8 leaves 17 orders of magnitude of headroom over a
    100 TB event corpus before the decimal ceiling.

    Plan: one scalar max (broadcast back via cross join of a 1-row
    aggregate), one fact-scale hash aggregate on event_type, then a
    5-row share join — a single shuffle on the group key at any SF;
    the decayed sums are algebraic so partial aggregation (map-side
    combine) applies. Reference scope: the app (s3vectors-app/
    pythonvectordbceph.py) timestamps nothing; this is the recency
    semantics its event feed needs for ranking freshness."""
    e = T(spark, sf_dir, "events")
    ref = e.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    w = e.crossJoin(F.broadcast(ref)).select(
        "event_type",
        F.expr(
            f"shiftleft(1L, {_HL_CAP} - least("
            f"(ref_us - unix_micros(ts)) div {_HL_US}L, {_HL_CAP}L))"
        ).alias("wt"),
        F.floor(F.col("value") * F.lit(1000000.0)).alias("value_micro"),
    )
    a = w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("wt").cast("decimal(38,0)")).alias("decayed_n"),
        F.sum(F.col("wt").cast("decimal(38,0)") * F.col("value_micro")).alias(
            "decayed_value_micro"
        ),
    )
    t = a.agg(F.sum("decayed_n").alias("total_n"))
    return (
        a.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "n_events",
            "decayed_n",
            "decayed_value_micro",
            F.expr("CAST((decayed_n * 1000000) div total_n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("event_type")
    )


# --- linear multi-touch attribution -----------------------------------------

@register(
    "q_linear_attribution",
    oracle="""
    WITH fp AS (
        SELECT user_id, MIN(ts) AS fp_ts
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
        SELECT e.user_id, e.event_type,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn,
               COUNT(*) OVER (PARTITION BY e.user_id) AS n
        FROM events e JOIN fp ON e.user_id = fp.user_id
        WHERE e.ts < fp.fp_ts AND e.event_type <> 'purchase'
    ),
    credit AS (
        SELECT event_type,
               (1000000 // n)
               + CASE WHEN rn = 1
                      THEN 1000000 - (1000000 // n) * n ELSE 0 END
                   AS credit_ppm,
               rn
        FROM touches
    )
    SELECT event_type,
           SUM(credit_ppm) AS credit_ppm,
           COUNT(*) AS n_touches,
           SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_first
    FROM credit GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — q_first_touch's companion that
    splits each conversion's credit EQUALLY across every touch before
    the first purchase instead of crediting only the earliest. Credit
    is exact integer ppm: each touch gets 1e6 // n and the FIRST touch
    absorbs the remainder, so per-user credits sum to exactly 1e6 and
    the per-channel totals are engine-exact integers (sum over
    channels = 1e6 × converting-users-with-touches, an invariant the
    pytest asserts).

    Plan: purchase side collapses to (user, min ts) before the join;
    the rank/count windows partition on user_id (per-user event counts
    are bounded by construction — the sessionize family's contract),
    so the fact table shuffles once on user_id and aggregates once on
    event_type. The broadcast hint fits converter cardinality; at
    extreme user counts AQE falls back to the same-keyed shuffle the
    windows already paid for."""
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_fp_ts"))
    )
    wu = Window.partitionBy("user_id")
    touches = (
        e.join(F.broadcast(fp), "user_id")
        .filter((F.col("ts") < F.col("_fp_ts")) & (F.col("event_type") != "purchase"))
        .select(
            "event_type",
            F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
            F.count(F.lit(1)).over(wu).alias("n"),
        )
    )
    credit = touches.select(
        "event_type",
        "rn",
        (
            F.expr("1000000 div n")
            + F.when(
                F.col("rn") == 1, F.lit(1000000) - F.expr("(1000000 div n) * n")
            ).otherwise(F.lit(0))
        ).alias("credit_ppm"),
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.sum("credit_ppm").alias("credit_ppm"),
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_first"),
        )
        .orderBy("event_type")
    )


# --- Lorenz concentration deciles -------------------------------------------

@register(
    "q_lorenz_deciles",
    oracle="""
    WITH base AS (SELECT o_custkey,
                         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
                  FROM orders GROUP BY o_custkey),
    t AS (SELECT o_custkey, spend,
                 ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
          FROM base),
    d AS (SELECT decile, COUNT(*) AS n_customers,
                 SUM(CAST(spend * 100 AS HUGEINT)) AS cents
          FROM t GROUP BY decile),
    tot AS (SELECT SUM(cents) AS tc FROM d)
    SELECT decile, n_customers,
           CAST(cents AS DECIMAL(38,0)) AS spend_cents,
           CAST(cents * 1000000 // tot.tc AS BIGINT) AS share_ppm,
           CAST(SUM(cents) OVER (ORDER BY decile) * 1000000 // tot.tc
                AS BIGINT) AS cum_share_ppm
    FROM d CROSS JOIN tot ORDER BY decile
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve in spend deciles — the curve POINTS
    behind q_gini_spend's scalar: per ascending-spend decile of the
    customer base, exact cent sums and the cumulative revenue share in
    integer ppm (cum_share of decile 10 = exactly 1e6; the gap between
    the curve and the diagonal IS the Gini). The how-top-heavy-is-the-
    corpus question, asked of revenue the way q_domain_mixture asks it
    of tokens.

    Plan: per-customer aggregate (the only fact-scale shuffle), then
    the EXACT two-phase ntile (operators/twophase.global_ntile — no
    unpartitioned customer-cardinality window, same machinery as
    q_rfm_segments), a 10-row rollup and a 10-row running sum. Decimal
    cents end-to-end; shares by exact integral div."""
    from pyspark.sql.window import Window

    from ..operators.twophase import global_ntile

    d38 = "decimal(38,0)"
    o = T(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.sum(dec2("o_totalprice")).alias("spend")
    )
    scored = global_ntile(base, ["spend", "o_custkey"], 10, "decile")
    dec = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum((F.col("spend") * 100).cast(d38)).alias("cents"),
    )
    tot = dec.agg(F.sum("cents").alias("tc"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("cents").cast(d38).alias("spend_cents"),
            F.expr("CAST(cents * 1000000 div tc AS BIGINT)").alias("share_ppm"),
            F.expr("CAST(1000000 AS DECIMAL(38,0))")
            .alias("_m"),
            F.col("cents").alias("_c"),
            F.col("tc").alias("_tc"),
        )
        .withColumn("_cum", F.sum("_c").over(w))
        .select(
            "decile",
            "n_customers",
            "spend_cents",
            "share_ppm",
            F.expr("CAST(_cum * _m div _tc AS BIGINT)").alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )
