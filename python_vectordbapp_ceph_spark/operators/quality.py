"""Declarative data-quality checks, evaluated in one pass.

The ingest side of a 100 TB pipeline needs constraint verification
(nulls, ranges, domains, uniqueness, referential integrity) BEFORE
data reaches training jobs — and it needs all of it from one scan,
not one job per rule. Row-level rules compile to conditional-sum
aggregate columns folded into a single hash aggregate (one scan, one
reduce); table-level rules (uniqueness) ride the same aggregate via
count vs count-distinct; referential integrity is the one rule that
genuinely needs a second table, expressed as a broadcast anti-join
count. Results unpivot to a uniform (check, n_violations, n_rows)
report.

This is the engine-side analog of what the reference leaves to its
backend's schema enforcement (milvus-app/pythonvectordbceph_milvus.py
collection schema): Milvus rejects rows one insert at a time; at
Spark scale validation is a query, not a per-row gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return f"in_range({col})", ~F.col(col).between(lo, hi) | F.col(col).isNull()


def in_set(col: str, values: list) -> tuple[str, Column]:
    return f"in_set({col})", ~F.col(col).isin(values) | F.col(col).isNull()


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return f"matches({col})", ~F.col(col).rlike(pattern) | F.col(col).isNull()


def quality_report(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
    fk: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """Evaluate all checks and return (check, n_violations, n_rows).

    ``row_checks``: (name, violation-predicate) pairs — see the rule
    constructors above. ``unique_cols``: duplicate rows on these
    columns count as violations (count - distinct count). ``fk``:
    (local_col, dim_df, dim_col) — values absent from the dimension.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred) in enumerate(row_checks):
        # coalesce: SUM over an EMPTY table is NULL, but "violations
        # among zero rows" is 0 — without this an empty drop of data
        # reports NULL violation counts and breaks >0 alert predicates
        aggs.append(
            F.coalesce(F.sum(pred.cast("long")), F.lit(0)).alias(f"_v{i}")
        )
    if unique_cols:
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(c) for c in unique_cols])
            ).alias("_vu")
        )
    base = df.agg(*aggs)

    pairs = [
        (name, f"_v{i}") for i, (name, _) in enumerate(row_checks)
    ]
    if unique_cols:
        pairs.append((f"unique({','.join(unique_cols)})", "_vu"))
    stack = F.expr(
        "stack({n}, {args}) AS (check, n_violations)".format(
            n=len(pairs),
            args=", ".join(f"'{name}', {c}" for name, c in pairs),
        )
    )
    report = base.select(stack, F.col("_n").alias("n_rows"))

    if fk is not None:
        local_col, dim_df, dim_col = fk
        missing = (
            df.join(
                F.broadcast(dim_df.select(F.col(dim_col).alias(local_col))),
                local_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(
                F.lit(f"fk({local_col})").alias("check"),
                "n_violations",
                "n_rows",
            )
        )
        report = report.unionByName(missing)
    return report
