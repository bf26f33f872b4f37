"""Join operators Spark lacks as single calls: as-of join.

The reference delegates all lookup semantics to its backends; as-of
(latest-row-at-or-before) is the temporal-join primitive a training-data
pipeline needs when stitching event streams to slowly-changing facts.

Scale design — the union-sort formulation, NOT range-join + window:
a range join (l.key = r.key AND r.ts <= l.ts) explodes to one row per
(event, every earlier fact) before the window prunes it; the union form
shuffles each input exactly once on the key and resolves the match with
a running ``last(ignorenulls)`` — O(n log n) per key, no blow-up. This
is the classic formulation used by point-in-time-correct feature joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_order: str,
    direction: str = "backward",
    tolerance_s: float | None = None,
    _tol_us: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the right
    row with the greatest ``right_ts <= left_ts`` (direction
    'backward', the default) or the smallest ``right_ts >= left_ts``
    ('forward' — "next event after") for the same key. Ties on
    right_ts break deterministically by ``payload_order``.

    Returns all left columns plus ``payload_cols`` (null if no match).
    One shuffle on the key; deterministic, so it has an exact SQL oracle
    (row_number over the range join — same result, different plan).

    ``tolerance_s`` (pandas merge_asof parity): a match farther than
    this many seconds from the left timestamp is discarded (payload
    null) — the guard against stitching a years-stale fact onto an
    event. Applied as a post-filter on the resolved match, so the
    plan shape (one shuffle, no row explosion) is unchanged.
    Timestamp ts columns only (numeric ts columns have no defined
    second — pass them as timestamps to bound them). ``_tol_us`` is
    the internal micros form threaded through the forward/nearest
    recursion, where ts is already negated micros.

    The forward direction is the same union-sort machinery run on
    NEGATED timestamps: min(right_ts >= t) ≡ max(-right_ts <= -t).
    """
    if tolerance_s is not None and _tol_us is None:
        if not dict(left.dtypes)[left_ts].startswith("timestamp"):
            raise ValueError(
                "tolerance_s requires a timestamp ts column "
                f"({left_ts} is {dict(left.dtypes)[left_ts]})"
            )
        _tol_us = int(tolerance_s * 1_000_000)
    if direction == "forward":
        orig_type = dict(left.dtypes)[left_ts]

        def neg(df, ts):
            # parquet timestamps read as TIMESTAMP_NTZ; unix_micros
            # needs TIMESTAMP — cast through it (session TZ is pinned
            # UTC by the loaders, so the round-trip is lossless)
            return df.withColumn(
                ts, -F.unix_micros(F.col(ts).cast("timestamp"))
            )

        out = asof_join(
            neg(left, left_ts).withColumnRenamed(left_ts, "_negts"),
            neg(right, right_ts).withColumnRenamed(right_ts, "_negts_r"),
            left_key, right_key, "_negts", "_negts_r",
            payload_cols, payload_order,
            # tolerance carries through as micros: in negated-micros
            # space (-l) - (-r) = r - l, exactly the forward gap
            _tol_us=_tol_us,
        )
        restored = out.withColumn(
            left_ts, F.timestamp_micros(-F.col("_negts")).cast(orig_type)
        ).drop("_negts")
        return restored.select(*left.columns, *payload_cols)
    if direction == "nearest":
        # Run the backward and forward passes with direction-prefixed
        # payloads (each pass is the one-shuffle union form; nearest
        # costs two), then pick per row by absolute time delta —
        # equal deltas break to the BACKWARD match (the pandas
        # merge_asof convention a feature pipeline expects).
        def prefixed(prefix: str) -> tuple[DataFrame, list[str], str]:
            pc = [f"{prefix}{c}" for c in payload_cols] + [f"{prefix}_rts"]
            rr = right.select(
                F.col(right_key),
                F.col(right_ts),
                F.col(right_ts).alias(f"{prefix}_rts"),
                *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
            )
            return rr, pc, f"{prefix}{payload_order}"

        rb, pcb, ob = prefixed("_b_")
        rf, pcf, of = prefixed("_f_")
        step = asof_join(
            left, rb, left_key, right_key, left_ts, right_ts, pcb, ob,
            "backward", _tol_us=_tol_us,
        )
        step = asof_join(
            step, rf, left_key, right_key, left_ts, right_ts, pcf, of,
            "forward", _tol_us=_tol_us,
        )
        lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
        delta_b = lts - F.unix_micros(F.col("_b__rts").cast("timestamp"))
        delta_f = F.unix_micros(F.col("_f__rts").cast("timestamp")) - lts
        use_b = F.col("_b__rts").isNotNull() & (
            F.col("_f__rts").isNull() | (delta_b <= delta_f)
        )
        return step.select(
            *left.columns,
            *[
                F.when(use_b, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_f_{c}"))
                .alias(c)
                for c in payload_cols
            ],
        )
    if direction != "backward":
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    left_cols = left.columns
    # The payload struct leads with (ts, order) so struct ordering gives
    # the deterministic "latest right row" under the running last().
    payload = F.struct(
        F.col(right_ts).alias("_ts"),
        F.col(payload_order).alias("_ord"),
        *[F.col(c) for c in payload_cols],
    )
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )  # NULL right_ts can never satisfy right_ts <= left_ts; without
    # this filter NULLS-FIRST ordering would attach it as a match
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left_cols],
    )
    unioned = r.select("_k", "_t", "_side", "_p", *[
        F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols
    ]).unionByName(l)
    # right rows sort before left rows at equal ts (side 0 < 1) → "<=";
    # among right rows at equal ts the struct order puts max payload_order last.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_p").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    if _tol_us is not None:
        # _t is a timestamp on the direct path but an already-negated
        # micros LONG on the forward path's inner call — normalize to
        # micros either way, then null out matches past the tolerance
        def micros(c):
            return (
                F.unix_micros(c.cast("timestamp"))
                if dict(unioned.dtypes)["_t"].startswith("timestamp")
                else c.cast("long")
            )

        gap = micros(F.col("_t")) - micros(F.col("_m").getField("_ts"))
        matched = matched.withColumn(
            "_m",
            F.when(gap <= F.lit(_tol_us), F.col("_m")).otherwise(
                F.lit(None).cast(matched.schema["_m"].dataType)
            ),
        )
    return matched.filter(F.col("_side") == 1).select(
        *left_cols, *[F.col("_m").getField(c).alias(c) for c in payload_cols]
    )
