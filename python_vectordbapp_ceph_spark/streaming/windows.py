"""Time-window operators — tumbling, sliding, session — that work on
BOTH batch and streaming DataFrames (Spark's window()/session_window()
are mode-agnostic; watermarks only apply when streaming).

Replaces the reference's event-at-a-time webhook accounting with
set-at-a-time windowed aggregation; the batch forms have exact DuckDB
oracles (date_trunc / bucket arithmetic / lag+cumsum sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum; streaming-safe with a watermark."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    keys = [F.window(ts_col, width)] + [F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        *[F.col(c) for c in (group_cols or [])],
        "n_events",
        "sum_value",
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window count: each event lands in width/slide windows."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    out = df.groupBy(F.window(ts_col, width, slide)).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(F.col("window.start").alias("window_start"), "n_events")


def session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based) via the native session_window —
    works in batch too, which is what the oracle checks."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    out = df.groupBy(F.col(key_col), F.session_window(ts_col, gap)).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        "n_events",
    )


def sessionize_batch(
    events: DataFrame,
    ts_col: str = "ts",
    gap_minutes: int = 30,
    key_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization by lag + cumulative-sum — the classic SQL
    formulation, used to cross-check session_window and as the shape
    the DuckDB oracle mirrors exactly.

    Semantics match native session_window: a gap of EXACTLY ``gap``
    starts a new session (windows are [start, last+gap)); comparison
    in microseconds (unix_micros) to avoid second-truncation drift.
    """
    order = [F.col(ts_col).asc(), F.col("event_id").asc()] if "event_id" in events.columns else [F.col(ts_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    flagged = events.withColumn(
        "_new_session",
        F.when(prev.isNull(), 1)
        .when(F.unix_micros(F.col(ts_col)) - prev >= gap_us, 1)
        .otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("_new_session").over(wsum))
    return sess.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def streaming_dedupe(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful exactly-once-per-key within the watermark horizon —
    the streaming half of the idempotent-upsert story (state is
    bounded by the watermark; without it state grows forever)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def stateful_running_count(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    timeout_minutes: int | None = 120,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the PySpark
    arbitrary-state surface, SURVEY C31/C32): per-key running event
    count + last-seen timestamp, state evicted by processing-time
    timeout so it stays bounded.

    This is the shape the built-ins can't express (cross-batch
    arbitrary state with custom eviction); everything expressible with
    window()/session_window/dropDuplicates stays on those (JVM-side).

    ``timeout_minutes=None`` disables the TTL. Required for bounded
    (Trigger.AvailableNow) drains: pending processing-time timers keep
    the query alive in no-new-data state-cleanup micro-batches until
    every timer has fired, so an availableNow run with a 2 h TTL spins
    for 2 h after the data is done instead of terminating. Continuous
    production streams keep the TTL; batch-drain replays don't need
    eviction (the query ends anyway).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, n_events long, last_ts timestamp"
    state_schema = "n long"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n = state.get[0] if state.exists else 0
        last = None
        for pdf in pdfs:
            n += len(pdf)
            m = pdf[ts_col].max()
            last = m if last is None else max(last, m)
        state.update((n,))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "last_ts": [last]}
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "2 hours",
    within: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join bounded to ±``within``.

    Both inputs carry watermarks and the join condition carries the
    time bound, so the state store provably evicts rows older than
    watermark+within — without the bound a stream-stream join buffers
    forever. Works identically on batch DataFrames (the watermark is
    a no-op there), which is how the test proves stream ≡ batch.

    ``left_ts``/``right_ts`` must be distinct column names; both are
    kept in the output for downstream delta computations."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond).drop(rw[key])


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "2 hours",
    within: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join bounded to ±``within``
    — the "did a matching event arrive in time?" shape (click with no
    purchase, request with no response). Spark emits the unmatched
    left row with NULL right columns only once the watermark passes
    the end of its match window, i.e. the join is also a TIMEOUT
    detector: null rows are late-arrival-proof negatives, not
    maybe-still-coming rows. Same eviction bound as the inner form;
    outer emission is why BOTH the watermark and the time-range
    condition are mandatory here (Spark rejects an unbounded outer
    stream-stream join outright)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "left_outer").drop(rw[key])


def stateful_ewma_stream(
    stream: DataFrame,
    alpha: float = 0.5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming EWMA — the TRUE per-key recurrence
    (ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁, seeded with the first value; pandas
    ``ewm(adjust=False)``) that the batch q_ewma approximates with an
    8-lag truncation. The state is ONE (ewma, n) pair per key —
    constant-size regardless of stream length, which is exactly why
    the recurrence form is the streaming-native one: batch needs the
    whole history (or a truncation), the stream needs one double.

    Rows are folded in event-time order within each micro-batch;
    cross-batch order is the source's delivery order (per-key ordered
    sources — a keyed queue, a file-per-window drop — keep it exact).
    Emits the post-batch (key, ewma, n) in update mode."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, ewma double, n long"
    state_schema = "ewma double, n long"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = None, 0
        for pdf in pdfs:
            for v in pdf.sort_values(ts_col)[value_col]:
                v = float(v)
                ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
                n += 1
        state.update((ewma, n))
        yield pd.DataFrame({key_col: [key[0]], "ewma": [ewma], "n": [n]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
