"""Partition-pruned MERGE: upsert/delete into a bucketed parquet base
rewriting ONLY the partitions the changes touch.

The append-log collection (collection.py) is the streaming-friendly
write path; this is the batch MERGE INTO equivalent for a compacted
base at rest. Layout: the base is partitioned by a stable hash bucket
of the key (`_kb = pmod(xxhash64(key), n_buckets)`). A merge:

  1. derives the affected bucket set from the (small) change set —
     driver gets only bucket ids, never rows;
  2. reads ONLY those partitions of the base (partition pruning),
     resolves last-writer-wins against the changes, drops deletes;
  3. rewrites just those partitions via dynamic partition overwrite.

At 100 TB with n_buckets≈4096 and a typical batch touching a few
hundred buckets, the merge reads and writes a few percent of the
table instead of all of it. xxhash64 (not `hash()`/rand) keeps bucket
assignment stable across Spark versions and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import materialize
from .mutation import upsert_last_writer

N_BUCKETS_DEFAULT = 64


def _with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn("_kb", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)))


def _bucket_aligned(df: DataFrame, n_buckets: int, files_per_bucket: int) -> DataFrame:
    """Repartition for a bucket-partitioned write. ``files_per_bucket=1``
    hashes on `_kb` alone: one task → one file per bucket (no sliver
    files). At 100 TB a single giant bucket would then serialize
    through one task, so a multiplier >1 adds a within-bucket salt to
    the shuffle key: `files_per_bucket` tasks (and files) per bucket,
    still bucket-aligned — readers prune on the `_kb` directory either
    way."""
    if files_per_bucket <= 1:
        return df.repartition("_kb")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_bucket))
    return df.repartition(
        n_buckets * files_per_bucket, F.col("_kb"), salt
    )


def overwrite_touched_buckets(
    spark: SparkSession,
    path: str,
    result: DataFrame,
    buckets: list[int],
    n_buckets: int = N_BUCKETS_DEFAULT,
    files_per_bucket: int = 1,
) -> None:
    """Dynamic-overwrite the `_kb` partitions present in ``result`` and
    delete the directories of touched buckets that emptied out (dynamic
    mode writes no partition for them, leaving stale files). ``result``
    must already be materialized (checkpointed) if its lineage reads
    ``path``."""
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # repartition on the partition column first: without it every
        # shuffle partition writes a sliver into every bucket dir
        # (buckets × partitions small files — measured 512 files for a
        # 16-bucket base on local[32]); with it, the write tasks stay
        # bucket-aligned at any cluster size (see _bucket_aligned for
        # the giant-bucket multiplier)
        _bucket_aligned(result, n_buckets, files_per_bucket).write.mode(
            "overwrite"
        ).partitionBy("_kb").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    survivors = {r._kb for r in result.select("_kb").distinct().collect()}
    hpath = spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
    # resolve the filesystem FROM the path (s3a://, hdfs://, file://),
    # not the cluster default FS — they routinely differ
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    for b in set(buckets) - survivors:
        fs.delete(hpath(f"{path}/_kb={b}"), True)
    # the session caches the path's file listing; later reads must see
    # the rewritten partitions
    spark.catalog.refreshByPath(path)


def write_bucketed_base(
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    files_per_bucket: int = 1,
) -> None:
    """Initial layout: parquet partitioned by the key's hash bucket
    (repartitioned onto the bucket key first — `files_per_bucket`
    files per bucket, not one per bucket per task; see
    overwrite_touched_buckets)."""
    _bucket_aligned(
        _with_bucket(df, key_col, n_buckets), n_buckets, files_per_bucket
    ).write.mode("overwrite").partitionBy("_kb").parquet(path)


def merge_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
    n_buckets: int = N_BUCKETS_DEFAULT,
    files_per_bucket: int = 1,
    checkpoint_dir: str | None = None,
) -> list[int]:
    """MERGE the change set into the bucketed base at ``path``.

    ``changes`` carries (key, payload..., ts, op). Returns the list of
    rewritten bucket ids (the driver-side footprint — ids only).
    Pass a reliable ``checkpoint_dir`` on long cluster runs (see
    cache.materialize); ``files_per_bucket`` bounds write skew for
    giant buckets (see _bucket_aligned).
    """
    # materialize the (small, by contract) change set ONCE: bucket
    # derivation and the merge plan below both read it, and without
    # this the change lineage — often scans+filters over a big fact —
    # executes twice
    ch = materialize(_with_bucket(changes, key_col, n_buckets), checkpoint_dir)
    buckets = [r._kb for r in ch.select("_kb").distinct().collect()]
    if not buckets:
        return []

    base = spark.read.parquet(path).filter(F.col("_kb").isin(buckets))
    base_cols = [c for c in base.columns]
    # changes beat base rows on timestamp ties (the MERGE contract):
    # explicit priority, not op-name ordering
    ch_aligned = ch.select(*base_cols, F.col(op_col)).withColumn("_prio", F.lit(1))
    base_log = base.withColumn(op_col, F.lit("upsert")).withColumn("_prio", F.lit(0))
    # tiebreak chain: change beats base (_prio), and within one change
    # set an upsert beats a delete at the same ts ('upsert' > 'delete'
    # descending) — fully deterministic even for conflicting same-key
    # same-ts change rows
    merged = upsert_last_writer(
        base_log.unionByName(ch_aligned),
        [key_col],
        ts_col,
        tiebreak_cols=["_prio", op_col],
    )
    result = merged.filter(F.col(op_col) != delete_op).drop(op_col, "_prio")
    # materialize BEFORE overwriting the path we just read (truncates
    # the lineage back to the files being replaced); eager by default
    result = materialize(result, checkpoint_dir)
    overwrite_touched_buckets(
        spark, path, result, buckets, n_buckets, files_per_bucket
    )
    return sorted(buckets)


def read_base(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read the merged base. Pass ``schema`` for the degenerate case
    where every row has been deleted (no files left to infer from)."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path).drop("_kb")
