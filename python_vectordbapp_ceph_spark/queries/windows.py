"""Time-window surface (SURVEY §2.C28-C29): tumbling, sliding and
session windows over the events stream table — batch forms here (the
same helper functions run under readStream; streaming execution with
watermarks is exercised in tests/test_streaming.py).

Timestamp outputs are epoch-microsecond bigints (unix_micros ↔
epoch_us) or second-granularity strings — never raw timestamps — so
engine representation differences can't break the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register
from ._common import T, ts_str
from ..streaming.windows import sessionize_batch, sliding_agg, session_agg, tumbling_agg


@register(
    "q_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(ts, '1 hour') — epoch-aligned, so the batch oracle is a
    plain date_trunc. Identical code runs under readStream + watermark."""
    e = T(spark, sf_dir, "events")
    out = tumbling_agg(e, width="1 hour", group_cols=["event_type"])
    return out.select(
        ts_str("window_start").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


@register(
    "q_sliding_window",
    oracle="""
    WITH s AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS tb FROM events),
    u AS (SELECT unnest([tb, tb - INTERVAL '30 minutes']) AS ws FROM s)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, COUNT(*) AS n_events
    FROM u GROUP BY 1
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(ts, '1 hour', '30 minutes'): each event lands in exactly
    width/slide windows; the oracle materializes the same two starts."""
    e = T(spark, sf_dir, "events")
    out = sliding_agg(e, width="1 hour", slide="30 minutes")
    return out.select(ts_str("window_start").alias("window_start"), "n_events")


_SESSION_ORACLE = """
    WITH f AS (SELECT user_id, event_id, ts,
                      CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                           WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1
                           ELSE 0 END AS new_s
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM f)
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
"""


@register("q_sessionize", oracle=_SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag + cumulative sum, 30-minute gap) — the
    classic SQL formulation; one shuffle on user_id."""
    e = T(spark, sf_dir, "events")
    out = sessionize_batch(e, gap_minutes=30)
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "n_events",
    )


@register("q_session_window", oracle=_SESSION_ORACLE)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window(ts, '30 minutes') — same semantics as
    q_sessionize, checked against the SAME oracle: the two independent
    formulations cross-validate each other."""
    e = T(spark, sf_dir, "events")
    out = session_agg(e, gap="30 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        "n_events",
    )


@register(
    "q_interval_join",
    oracle="""
    SELECT s.user_id, s.event_id AS s_id, p.event_id AS p_id
    FROM events s
    JOIN events p
      ON s.user_id = p.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts BETWEEN s.ts - INTERVAL 1 HOUR AND s.ts + INTERVAL 1 HOUR
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream interval join run on batch inputs (the
    watermark is a no-op there — streaming/windows.py::
    stream_stream_join; stream ≡ batch is pytest-pinned). Signups
    joined to same-user purchases within ±1 hour; state eviction at
    scale is bounded by watermark + interval."""
    from ..streaming.windows import stream_stream_join

    e = T(spark, sf_dir, "events")
    signup = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")
    )
    purchase = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    return stream_stream_join(
        signup, purchase, key="user_id", left_ts="s_ts", right_ts="p_ts"
    ).select("user_id", "s_id", "p_id")


@register(
    "q_scd2",
    oracle="""
    SELECT user_id, event_type AS state,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS valid_to_us
    FROM events
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval construction: a change log becomes validity
    ranges [valid_from, valid_to) via lead() per key — the open
    current row carries NULL valid_to. One shuffle on the dimension
    key; the window's sort is total (ts, event_id tiebreak) so the
    intervals are deterministic under any parallelism. This is how a
    mutable dimension is tracked in an append-only lake — the batch
    mirror of the collection's last-writer-wins upsert."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
    )


@register(
    "q_temporal_lookup",
    oracle="""
    WITH dim AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events WHERE event_id % 7 = 0),
    fact AS (SELECT user_id, event_id, ts FROM events
             WHERE event_id % 7 <> 0)
    SELECT d.state, COUNT(*) AS n_facts,
           COUNT(DISTINCT f.user_id) AS n_users
    FROM fact f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY d.state
    """,
)
def q_temporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup — the classic warehouse join this
    tier was missing: facts resolve the SCD2 dimension version VALID
    AT their timestamp (key equality + half-open interval
    containment), composing q_scd2's interval construction with the
    fact stream. Distinct from the as-of join: as-of takes the latest
    row ≤ ts regardless of validity, while the interval predicate
    expresses "the version that was true then" and naturally yields
    zero rows for facts before the first version. Plan: the EQUALITY
    key (user_id) drives a sort-merge join — the interval predicate
    rides along as a post-join filter on already co-located rows, so
    there is no range-explosion; the per-key interval count is
    bounded by the change-log density. Aggregated to a per-state
    summary so the check pins the full join semantics in 5 rows."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    wd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_id") % 7 == 0)
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wd).alias("valid_to"),
        )
    )
    fact = e.filter(F.col("event_id") % 7 != 0).select(
        "user_id", "event_id", "ts"
    )
    joined = fact.join(
        dim,
        (fact["user_id"] == dim["d_user"])
        & (fact["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact["ts"] < dim["valid_to"])),
    )
    return joined.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_gapfill",
    oracle="""
    WITH grid AS (
        SELECT u.user_id, unnest(generate_series(
                 TIMESTAMP '2024-01-01 00:00:00',
                 TIMESTAMP '2024-01-01 23:00:00', INTERVAL 1 HOUR)) AS h
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 0) u),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS v
        FROM events
        WHERE user_id % 10 = 0
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY 1, 2)
    SELECT g.user_id,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           last_value(hr.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
           hr.v IS NULL AS filled
    FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
    """,
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + forward fill (the hypertable
    `time_bucket_gapfill` / `locf` shape): a dense per-key hour grid
    (sequence+explode — generated, never shuffled), left join of the
    sparse hourly aggregate, then last-non-null carry-forward via a
    ROWS window. At scale the grid is generated per key inside the
    task and both join sides arrive hash-partitioned on user_id; the
    window reuses that partitioning — one shuffle total."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    day = e.filter(
        (F.col("user_id") % 10 == 0)
        & (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
    )
    hourly = (
        day.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("v")
        )
    )
    users = (
        e.filter(F.col("user_id") % 10 == 0).select("user_id").distinct()
    )
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-01 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    return joined.select(
        "user_id",
        ts_str("h").alias("hour_ts"),
        F.last("v", ignorenulls=True).over(w).alias("value_ff"),
        F.col("v").isNull().alias("filled"),
    )


@register(
    "q_funnel",
    oracle="""
    WITH stage AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
    SELECT user_id,
           (t_signup IS NOT NULL) AS did_signup,
           coalesce(t_signup IS NOT NULL AND t_view > t_signup,
                    FALSE) AS did_view_after,
           coalesce(t_signup IS NOT NULL AND t_view > t_signup
                    AND t_purchase > t_view, FALSE) AS did_purchase_after
    FROM stage
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → view → purchase, strictly in order):
    conditional-MIN firsts per stage in ONE hash aggregate over the
    events — no self-joins, no window — then pure boolean stage
    logic. The classic CEP sequence question collapsed to a single
    shuffle on user_id; NULL comparisons are three-valued in both
    engines so the strict-order predicates agree exactly."""
    e = T(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    stage = e.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("view").alias("t_view"),
        first("purchase").alias("t_purchase"),
    )
    did_signup = F.col("t_signup").isNotNull()
    did_view = did_signup & (F.col("t_view") > F.col("t_signup"))
    did_purch = did_view & (F.col("t_purchase") > F.col("t_view"))
    return stage.select(
        "user_id",
        did_signup.alias("did_signup"),
        F.coalesce(did_view, F.lit(False)).alias("did_view_after"),
        F.coalesce(did_purch, F.lit(False)).alias("did_purchase_after"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(datediff('week', f.cohort_week,
                             date_trunc('week', e.ts)) AS BIGINT) AS week_n
        FROM events e JOIN first_seen f ON e.user_id = f.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
           week_n, COUNT(*) AS active_users
    FROM activity GROUP BY cohort_week, week_n
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week,
    counted once per (cohort, weeks-since) cell. Two shuffles on
    user_id (first-seen aggregate + activity join — co-partitioned,
    so AQE elides the second exchange) then the cell count. The
    DISTINCT before counting is what keeps a user with 50 events in
    a week a single retained unit."""
    e = T(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("bigint").alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_n").agg(
        F.count(F.lit(1)).alias("active_users")
    ).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
        "week_n",
        "active_users",
    )


@register(
    "q_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts (the Markov-chain / next-event
    matrix behind journey analysis): per-user lead() then a global
    pair count. One shuffle on user_id for the window, one tiny
    shuffle of (from, to) pairs for the count — the |types|² result
    is independent of event volume."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- time-weighted average (the hypertable downsampling primitive) ---------

@register(
    "q_time_weighted_avg",
    oracle="""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               lag(epoch_us(ts)) OVER w AS pus,
               lag(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w
                   AS pcents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           round(CAST(SUM(CAST(pcents AS DECIMAL(38,0))
                          * CAST(us - pus AS DECIMAL(38,0))) AS DOUBLE)
                 / CAST(MAX(us) - MIN(pus) AS DOUBLE) / 100.0, 6) AS twa,
           COUNT(*) AS n_intervals
    FROM o WHERE pus IS NOT NULL
    GROUP BY user_id
    HAVING MAX(us) > MIN(pus)
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (left-closed step interpolation,
    the TimescaleDB `time_weight('LOCF')` primitive): each reading
    holds until the next one, so the integral is sum(prev_value *
    dt). Integration runs in exact integers — cent-scaled values times
    microsecond deltas accumulated in DECIMAL(38,0) — with ONE double
    division per user at the end (identical operands both engines).
    One shuffle on user_id for the lag window; the aggregate reuses
    the same partitioning, so no second exchange."""
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        cents.alias("cents"),
        F.lag(F.unix_micros("ts")).over(w).alias("pus"),
        F.lag(cents).over(w).alias("pcents"),
    ).filter(F.col("pus").isNotNull())
    return (
        o.groupBy("user_id")
        .agg(
            F.sum(
                F.col("pcents").cast("decimal(38,0)")
                * (F.col("us") - F.col("pus")).cast("decimal(38,0)")
            ).alias("_area"),
            F.max("us").alias("_hi"),
            F.min("pus").alias("_lo"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .filter(F.col("_hi") > F.col("_lo"))
        .select(
            "user_id",
            F.round(
                F.col("_area").cast("double")
                / (F.col("_hi") - F.col("_lo")).cast("double")
                / F.lit(100.0),
                6,
            ).alias("twa"),
            "n_intervals",
        )
    )


# --- multi-granularity time rollup (continuous-aggregate shape) ------------

@register(
    "q_time_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           extract(hour FROM ts) AS hour,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY GROUPING SETS ((day), (day, hour))
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups
    of the event stream in ONE grouping-sets pass — the hourly cells
    and their daily parents come out of a single shuffle instead of
    two scans (at 100 TB the scan is the cost; Spark's expand operator
    doubles rows map-side but partial-aggregates before the exchange,
    so the shuffle carries one row per live cell). Decimal-exact sums;
    the NULL hour marks the daily tier, exactly as in the oracle."""
    T(spark, sf_dir, "events").createOrReplaceTempView("_ev_rollup")
    return spark.sql(
        """
        SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               extract(hour FROM ts) AS hour,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM _ev_rollup
        GROUP BY GROUPING SETS ((day), (day, hour))
        """
    )


# --- lag-1 autocorrelation per series --------------------------------------

@register(
    "q_autocorr",
    oracle="""
    WITH c AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               lag(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        FROM events
    ),
    s AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(pv) AS sx, SUM(v) AS sy,
               SUM(pv * v) AS sxy,
               SUM(pv * pv) AS sxx, SUM(v * v) AS syy
        FROM c WHERE pv IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS autocorr
    FROM s
    WHERE n >= 3
      AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series (the
    stationarity probe): Pearson r over (prev, current) pairs from a
    lag window, computed from exact integer sufficient statistics with
    one closed-form double evaluation per user — sqrt is IEEE
    correctly-rounded, so identical operands give identical results in
    both engines. Zero-variance series are filtered on the exact
    integer spread, not a float epsilon. The lag window and the
    aggregate share the user_id shuffle."""
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = e.select(
        "user_id", cents.alias("v"), F.lag(cents).over(w).alias("pv")
    ).filter(F.col("pv").isNotNull())
    s = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pv").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("pv") * F.col("v")).alias("sxy"),
        F.sum(F.col("pv") * F.col("pv")).alias("sxx"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    nd, sxd, syd = [F.col(x).cast("double") for x in ("n", "sx", "sy")]
    sxyd, sxxd, syyd = [F.col(x).cast("double") for x in ("sxy", "sxx", "syy")]
    varx = nd * sxxd - sxd * sxd
    vary = nd * syyd - syd * syd
    return (
        s.filter((F.col("n") >= 3) & (varx > 0) & (vary > 0))
        .select(
            "user_id",
            "n",
            F.round((nd * sxyd - sxd * syd) / F.sqrt(varx * vary), 6)
            .alias("autocorr"),
        )
    )


# --- moving median (order statistics in a sliding frame) -------------------

@register(
    "q_moving_median",
    oracle="""
    SELECT user_id, event_id,
           round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.5)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
               AS moving_median
    FROM events
    """,
)
def q_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-event median per user — the robust smoother a mean
    can't be (one spike drags a moving average; the median ignores
    it). Spark's exact `percentile` runs as a WINDOW aggregate over
    the rows frame; on 2-decimal values the middle element (odd
    frames) and midpoint average (even warm-up frames) are both exact
    doubles, so the rolling values hash-match quantile_cont. One
    shuffle on user_id; the frame re-sorts 5 elements per row, not
    the partition."""
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.percentile(
                F.col("value").cast("decimal(18,2)").cast("double"), F.lit(0.5)
            ).over(w),
            6,
        ).alias("moving_median"),
    )


# --- exponentially weighted moving average ---------------------------------

_EWMA_L = 8          # lag depth: (1-α)^8 = 1/256 ≈ 0.4% residual weight
_EWMA_W = [0.5 ** k for k in range(_EWMA_L)]  # α=0.5 → exact binary fractions


def _ewma_oracle() -> str:
    num = " + ".join(
        f"COALESCE({w!r} * lag(CAST(value AS DOUBLE), {k}) OVER w, 0.0)"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 ELSE {w!r} END"
        for k, w in enumerate(_EWMA_W)
    )
    return f"""
    SELECT user_id, event_id,
           round(({num}) / ({den}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("q_ewma", oracle=_ewma_oracle())
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (pandas
    ``ewm(alpha=0.5, adjust=True)`` semantics, truncated at 8 lags —
    (1-α)^8 leaves 0.4% residual weight, below the round(…,6) output
    precision for this value range).

    The textbook EWMA is a per-row recurrence — not expressible as a
    window aggregate without recursion. The truncated ADJUSTED form
    Σ wₖ·x_{t-k} / Σ wₖ (over available lags) is: an 8-term lag chain
    over ONE window spec, so Catalyst plans a single sort+window pass
    (one shuffle on user_id). α=1/2 makes every weight an exact binary
    fraction, so both engines' double arithmetic is bit-identical in
    the fixed k-ascending addition order. At 100 TB this is the same
    shuffle any per-entity window costs; depth-L truncation keeps the
    state bounded (the streaming twin would carry one running value)."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast("double")
    num = None
    den = None
    for k, wt in enumerate(_EWMA_W):
        lagk = F.lag(v, k).over(w) if k else v
        term = F.coalesce(F.lit(wt) * lagk, F.lit(0.0))
        cnt = F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = cnt if den is None else den + cnt
    return e.select(
        "user_id", "event_id", F.round(num / den, 6).alias("ewma")
    )


# --- churn: active-then-absent users ---------------------------------------

@register(
    "q_churn",
    oracle="""
    WITH early AS (
        SELECT user_id, COUNT(*) AS n_early
        FROM events
        WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-04 00:00:00'
        GROUP BY user_id),
    late AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-28 00:00:00')
    SELECT e.user_id, e.n_early
    FROM early e
    LEFT JOIN late l ON l.user_id = e.user_id
    WHERE l.user_id IS NULL
    """,
)
def q_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-churn cohort: users exhibiting a behavior early in the
    window (error events in the first 3 days) who no longer exhibit it
    at the end (none in the last 3) — the complement of
    q_cohort_retention (which measures who RETURNS; this isolates who
    STOPPED, with their prior intensity attached). 34 of 116 early
    error-users churn at sf0.01, so both join outcomes are exercised.

    Plan: both windows are filter-pushed scans of the same table
    (disjoint ts predicates, so row groups prune by footer stats); the
    absence check is a left-anti join on user_id — one shuffle per
    side on the join key, no window function. At 100 TB with
    date-partitioned events, each side reads only its partitions."""
    e = T(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error")
    early = (
        err.filter(F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp_ntz"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_early"))
    )
    late = (
        err.filter(F.col("ts") >= F.lit("2024-01-28 00:00:00").cast("timestamp_ntz"))
        .select("user_id")
        .distinct()
    )
    return early.join(late, "user_id", "left_anti")


# --- conversion latency -----------------------------------------------------

@register(
    "q_time_to_convert",
    oracle="""
    WITH first_click AS (
        SELECT user_id, MIN(ts) AS click_ts
        FROM events WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
        SELECT f.user_id,
               MIN(e.ts) AS purchase_ts,
               ANY_VALUE(f.click_ts) AS click_ts
        FROM first_click f
        JOIN events e ON e.user_id = f.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts >= f.click_ts
        GROUP BY f.user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(SUM(epoch_us(purchase_ts) - epoch_us(click_ts)) AS BIGINT)
               AS total_latency_us,
           round(CAST(SUM(epoch_us(purchase_ts) - epoch_us(click_ts)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6)
               AS avg_latency_s
    FROM conv
    """,
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: time from each user's FIRST click to their
    first purchase at-or-after it — the funnel metric q_funnel's
    ordered-step check doesn't expose (how LONG conversion takes, not
    just whether it happens). Exact arithmetic: latencies are integer
    epoch-microsecond differences summed as BIGINT (order-insensitive),
    divided once at the end.

    Plan: one aggregate for first clicks (map-side combine to one row
    per user), an equi-join back on user_id with the range predicate
    ANDed in (no range-join explosion — the predicate filters inside
    the per-key join), then a MIN aggregate and a single global
    reduce. Two shuffles on user_id, one scalar result row."""
    e = T(spark, sf_dir, "events")
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("purchase_ts"),
            F.first("click_ts").alias("click_ts"),
        )
    )
    lat = F.unix_micros(F.col("purchase_ts").cast("timestamp")) - F.unix_micros(
        F.col("click_ts").cast("timestamp")
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.sum(lat).cast("long").alias("total_latency_us"),
        F.round(
            F.sum(lat).cast("double") / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("avg_latency_s"),
    )


# --- categorical distribution shift ----------------------------------------

@register(
    "q_dist_shift",
    oracle="""
    WITH halves AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 0 ELSE 1 END AS half,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    tot AS (SELECT half, SUM(n) AS t FROM halves GROUP BY half),
    ppm AS (SELECT h.event_type, h.half, (h.n * 1000000) // t.t AS share_ppm
            FROM halves h JOIN tot t USING (half)),
    wide AS (SELECT event_type,
                    SUM(CASE WHEN half = 0 THEN share_ppm ELSE 0 END) AS p0,
                    SUM(CASE WHEN half = 1 THEN share_ppm ELSE 0 END) AS p1
             FROM ppm GROUP BY event_type)
    SELECT event_type, CAST(p0 AS BIGINT) AS share_ppm_first,
           CAST(p1 AS BIGINT) AS share_ppm_second,
           CAST(abs(p0 - p1) AS BIGINT) AS abs_delta_ppm
    FROM wide
    """,
)
def q_dist_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical distribution shift between the two halves of the
    window: per-class share in integer parts-per-million and the
    absolute delta — the drift monitor a training pipeline runs on its
    label/source mix before each refresh (sum abs_delta_ppm / 2 is the
    total-variation distance). Integer ppm (floor division of exact
    counts), not double ratios, so every value is exact and
    order-insensitive under any partitioning — the q_key_skew trick
    applied to drift detection. One count aggregate, broadcast-sized
    totals joined back; a single scan at any scale."""
    e = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    halves = e.groupBy(
        "event_type",
        F.when(F.col("ts") < cut, F.lit(0)).otherwise(F.lit(1)).alias("half"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = halves.groupBy("half").agg(F.sum("n").alias("t"))
    ppm = halves.join(F.broadcast(tot), "half").select(
        "event_type",
        "half",
        # integral div on a decimal-promoted product: long/long `/`
        # is DOUBLE division, which loses ulps past 2^53 (~9e15 —
        # inside the 100 TB event-count regime) and truncates the
        # rounded double instead of flooring the exact quotient
        F.expr("(CAST(n AS DECIMAL(38,0)) * 1000000) div t").alias(
            "share_ppm"
        ),
    )
    wide = ppm.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, F.col("share_ppm")).otherwise(0)).alias("p0"),
        F.sum(F.when(F.col("half") == 1, F.col("share_ppm")).otherwise(0)).alias("p1"),
    )
    return wide.select(
        "event_type",
        F.col("p0").cast("long").alias("share_ppm_first"),
        F.col("p1").cast("long").alias("share_ppm_second"),
        F.abs(F.col("p0") - F.col("p1")).cast("long").alias("abs_delta_ppm"),
    )


# --- period-over-period growth ----------------------------------------------

@register(
    "q_period_growth",
    oracle="""
    WITH m AS (SELECT o_orderpriority AS priority,
                      date_trunc('month', o_orderdate) AS mon,
                      SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
               FROM orders GROUP BY 1, 2)
    SELECT priority, strftime(mon, '%Y-%m') AS mon,
           CAST(rev AS DOUBLE) AS revenue,
           CASE WHEN lag(rev) OVER w IS NULL
                     OR lag(rev) OVER w = 0 THEN NULL
                ELSE CAST(round((rev - lag(rev) OVER w) * 1000000
                          / lag(rev) OVER w) AS BIGINT)
           END AS growth_ppm
    FROM m
    WINDOW w AS (PARTITION BY priority ORDER BY mon)
    ORDER BY priority, mon
    """,
)
def q_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per order priority — the
    period-over-period readout layered on a time rollup: aggregate
    FIRST (months × priorities rows), lag window over the tiny rollup
    AFTER. Growth is integer ppm via decimal arithmetic — the delta
    and the divisor are exact DECIMAL sums, one rounded division at
    the end; first month (and a zero base) report NULL rather than a
    fake infinity. The window is partitioned per priority over ~7×5
    rows: the aggregate-before-window discipline means the fact scan
    never feeds a window."""
    o = T(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.partitionBy("priority").orderBy("mon")
    prev = F.lag("rev").over(w)
    return (
        m.select(
            "priority",
            F.date_format("mon", "yyyy-MM").alias("mon"),
            F.col("rev").cast("double").alias("revenue"),
            F.when(
                prev.isNull() | (prev == 0), F.lit(None).cast("long")
            )
            .otherwise(
                F.round((F.col("rev") - prev) * 1000000 / prev).cast("long")
            )
            .alias("growth_ppm"),
        )
        .orderBy("priority", "mon")
    )


# --- cumulative distinct users over time ------------------------------------

@register(
    "q_cumulative_users",
    oracle="""
    WITH fs AS (SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id),
    d AS (SELECT first_day, COUNT(*) AS new_users FROM fs GROUP BY first_day)
    SELECT strftime(first_day, '%Y-%m-%d') AS day, new_users,
           SUM(new_users) OVER (ORDER BY first_day) AS cum_users
    FROM d ORDER BY first_day
    """,
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct BUYERS by day (first-purchase attribution)
    — the audience-growth curve.
    A naive COUNT(DISTINCT) per expanding window recounts the whole
    history every day; the scalable identity is first-seen
    attribution: each user contributes exactly once, on their first
    day (one per-user aggregate), the daily new-user counts are a
    day-keyed aggregate, and the cumulative sum runs over the DAY
    table (calendar-bounded — the q_auc histogram-window discipline).
    Every stage is map-side combinable; nothing rescans history."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    fs = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    d = fs.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    return (
        d.select(
            F.date_format("first_day", "yyyy-MM-dd").alias("day"),
            "new_users",
            F.sum("new_users")
            .over(
                Window.orderBy("first_day").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("cum_users"),
        )
        .orderBy("day")
    )
