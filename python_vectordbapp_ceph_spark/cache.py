"""Tracked persist registry: operators that must persist intermediates
(self-join inputs, branch-split inputs) register them here so a
long-lived session (driver gate, bench loop) can release them instead
of accumulating pinned blocks until eviction churn."""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df.persist())
    return df


def release_caches() -> None:
    """Unpersist every tracked intermediate."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass
