"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is seed-deterministic only for a fixed partitioning —
repartition the input and rows migrate between splits. Training-data
pipelines need membership that is a pure function of the ROW, so the
same document lands in 'train' on every engine, every run, every
layout. Knuth multiplicative hashing on the key gives that with exact
integer arithmetic both Spark and any SQL oracle can reproduce
(id × 2654435761 stays < 2^63 for ids < 2^31 — no overflow under ANSI).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, the classic multiplicative hash


def split_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from an integer id.

    Defined for the FULL signed-64-bit id range: the id is first folded
    to 31 bits with pmod (non-negative, so sign-preserving SQL ``%``
    oracles reproduce it via ((x % m) + m) % m), and the 31-bit × 33-bit
    product stays under 2^63 — no overflow under ANSI mode.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    folded = F.pmod(c.cast("long"), F.lit(1 << 31))
    return F.pmod(F.pmod(folded * F.lit(KNUTH), F.lit(1 << 32)), F.lit(n_buckets))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Adds 'train' / 'valid' / 'test' membership as a column; the
    remainder after train+valid is test. Membership depends only on
    the id — stable across runs, engines and partitionings."""
    b = split_bucket(id_col)
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + valid_pct, "valid")
        .otherwise("test"),
    )
