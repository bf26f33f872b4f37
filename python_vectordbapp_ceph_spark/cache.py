"""Tracked persist registry: operators that must persist intermediates
(self-join inputs, branch-split inputs) register them here so a
long-lived session (driver gate, bench loop) can release them instead
of accumulating pinned blocks until eviction churn."""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []

# applicationId → checkpoint dir already registered on that context, so
# repeated materialize() calls don't spawn a fresh UUID subdir each time
_CKPT_REGISTERED: dict[str, str] = {}


def tracked_persist(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df.persist())
    return df


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Default (``checkpoint_dir=None``) is ``localCheckpoint()``: blocks
    live on executor block managers — fastest, but any executor loss
    mid-job fails the query unrecoverably (Spark cannot recompute
    truncated lineage). Fine on local[*]; on a 1000-node 100 TB run
    pass a reliable ``checkpoint_dir`` (HDFS/S3A path) to switch to
    ``df.checkpoint()``, which survives executor churn at the cost of
    one distributed write per materialization."""
    if checkpoint_dir is None:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if _CKPT_REGISTERED.get(sc.applicationId) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        _CKPT_REGISTERED[sc.applicationId] = checkpoint_dir
    return df.checkpoint(eager=True)


def release_caches() -> None:
    """Unpersist every tracked intermediate."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass
