"""Mutation semantics: upsert-by-key and delete-by-key/predicate.

Reference behavior being reproduced:
  - upsert: Milvus ``client.upsert(collection, data)`` — replace by
    primary key (milvus-app/pythonvectordbceph_milvus.py:154); S3V
    ``put_vectors`` put-by-key (s3vectors-app/pythonvectordbceph.py:194-206).
  - delete: Milvus boolean filter ``url == "..."`` → ``client.delete``
    (milvus-app/pythonvectordbceph_milvus.py:108-113); S3V
    ``delete_vectors(keys=[...])`` (pythonvectordbceph.py:143-147).

Spark-first design: a vector collection is an append-only parquet log
of (key, payload, ingest_ts, op) rows; reads resolve last-writer-wins
per key with a window, deletes resolve as anti-joins. This makes the
sink idempotent under at-least-once event delivery (the reference's
Knative channel is at-least-once, rook-resources.yaml persistent:true)
— exactly-once lands for free at read time.

At scale: the window shuffles on the key once; compaction (rewriting
the resolved snapshot, optionally bucketed by key) amortizes it away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert_last_writer(
    log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Resolve an upsert log to its latest row per key.

    Deterministic: ties on ts break by ``tiebreak_cols`` (required to
    be unique in tests so the DuckDB oracle hashes identically).
    """
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def delete_keys(df: DataFrame, deletes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Remove rows whose key appears in ``deletes`` — left anti-join.

    The delete set is usually tiny (user-issued delete calls →
    broadcast, base never shuffles), but a bulk GDPR-style purge can be
    corpus-scale — the broadcast is count-gated like the dedup drop
    lists, falling back to a plain anti-join AQE can plan from the
    real size.

    Not fully lazy: the gate runs an eager count job over the delete
    set at call time and pins it in the tracked-cache registry —
    long-lived batch sessions release it with
    ``operators.dedup.release_caches()`` once the returned plan has
    materialized.
    """
    from .dedup import gate_broadcast

    return df.join(gate_broadcast(deletes.select(*key_cols).distinct()),
                   on=key_cols, how="left_anti")


def delete_where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Delete-by-predicate: keep the complement (null-safe)."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.filter(~F.coalesce(cond, F.lit(False)))


def apply_change_log(
    base: DataFrame,
    log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Full CDC resolve: union base (as oldest writes) with the change
    log, last-writer-wins per key, drop keys whose final op is delete.

    This is the batch equivalent of the reference's webhook handler
    branching on eventName Put/Copy vs Delete
    (s3vectors-app/pythonvectordbceph.py:138-152).
    """
    base_as_log = base.withColumn(op_col, F.lit("upsert"))
    resolved = upsert_last_writer(
        base_as_log.unionByName(log, allowMissingColumns=True),
        key_cols, ts_col, tiebreak_cols,
    )
    return resolved.filter(F.col(op_col) != delete_op).drop(op_col)
