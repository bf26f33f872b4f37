"""Incremental view maintenance for additive aggregates.

A continuously-ingesting pipeline cannot afford to rescan the base
table to refresh `GROUP BY` rollups — the standard answer is delta
maintenance (the materialized-view literature's "self-maintainable
aggregates"): COUNT and SUM (and anything derived from them, e.g.
AVG) are updatable from the change rows alone, with no access to the
base data. This module maintains such a view as bucketed parquet,
mirroring the MERGE layout (merge.py): refresh cost is proportional
to the DELTA and the buckets it touches, never to the view or the
base table.

Reference parity: the reference's ingest loop re-derives collection
stats on every write by re-reading state from the backend
(milvus-app/pythonvectordbceph_milvus.py upsert path); this is the
scale-path replacement — stats stay current for the cost of the
micro-batch.

Delta rows carry a ``sign`` (+1 insert, -1 retraction/delete); an
UPDATE is a -1/+1 pair. Groups whose maintained count reaches zero
are physically dropped, so the view equals a full recompute at every
point — verified by pytest and by the q_incremental_view oracle.

MIN/MAX are deliberately NOT offered here: they are not
self-maintainable under deletes (a retracted maximum requires the
base). The collection's snapshot path covers those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import overwrite_touched_buckets, read_buckets, replace_base

N_BUCKETS_DEFAULT = 64


def _bucketed(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    # xxhash64 over ALL group keys: stable across Spark versions and
    # restarts, and multi-key groups land in one deterministic bucket
    return df.withColumn(
        "_kb", F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    )


def _delta_agg(delta: DataFrame, keys: list[str], value_col: str,
               sign_col: str) -> DataFrame:
    """Collapse a change set to per-group (d_cnt, d_total). This is the
    only shuffle in a refresh, and it shuffles the delta, not the view."""
    sign = F.col(sign_col).cast("long")
    val = F.col(value_col).cast("decimal(18,2)")
    return delta.groupBy(*keys).agg(
        F.sum(sign).alias("cnt"),
        F.sum(sign.cast("decimal(18,2)") * val).cast("decimal(38,2)").alias("total"),
    )


def _write_schema_sidecar(spark: SparkSession, path: str, schema_json: str) -> None:
    """Persist the view schema beside the data: a partitionBy write of
    an EMPTY view emits no parquet files at all (only _SUCCESS), so a
    later read cannot infer the schema — the sidecar makes a view
    initialized before any data arrives readable and delta-appendable.
    Written through the Hadoop FS of the path (works on s3a/hdfs/file
    alike, same idiom as collection.compact)."""
    jvm = spark._jvm  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path + "_schema.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    out = fs.create(p, True)
    out.write(bytearray(schema_json.encode("utf-8")))
    out.close()


def _read_with_sidecar(spark: SparkSession, path: str) -> DataFrame:
    """Manifest-resolved view read; an empty manifest (never populated,
    or every group retracted) falls back to the schema sidecar so the
    view stays readable and delta-appendable."""
    from pyspark.sql.types import StructType

    df = read_buckets(spark, path)
    if df is not None:
        return df
    jvm = spark._jvm  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path + "_schema.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(p):
        raise FileNotFoundError(f"empty view at {path} with no schema sidecar")
    stream = fs.open(p)
    try:
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()
    schema = StructType.fromJson(__import__("json").loads(data))
    return spark.createDataFrame([], schema)


def init_agg_view(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    path: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> None:
    """Full (one-time) aggregate of the base, laid out by key bucket.

    One exchange end-to-end (r15, guide §2.4): `_kb` is a pure function
    of the group keys, so repartitioning the RAW rows on `_kb` already
    clusters every (keys) group into one partition — the aggregate
    (grouped by `_kb` + keys, same groups) then needs no exchange of
    its own, and the staged write takes the result pre-aligned instead
    of paying the alignment repartition a second time."""
    b = (
        _bucketed(df, keys, n_buckets)
        .repartition(F.col("_kb"))
        .groupBy("_kb", *keys)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("total"),
        )
        # column order of the pre-r15 plan (view cols then _kb): the
        # schema sidecar and read paths are order-sensitive consumers
        .select(*keys, "cnt", "total", "_kb")
    )
    spark = df.sparkSession
    # staged generation + manifest publish (merge.py protocol): the
    # view is unreadable until the commit lands, so a crashed init
    # never exposes a partial rollup, and a re-init atomically
    # replaces the old view
    replace_base(b, path, n_buckets, 1, pre_aligned=True)
    # the sidecar keeps a never-populated or fully-emptied view
    # readable (a staged write of zero groups emits no files to infer
    # a schema from)
    _write_schema_sidecar(spark, path, b.schema.json())


def apply_delta(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sign_col: str = "sign",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> list[int]:
    """Fold a change set into the view. Returns the rewritten bucket
    ids (the refresh footprint — ids only ever reach the driver).

    Reads ONLY the touched buckets of the view, merges additively
    (one union + re-aggregate over view-rows + delta-groups, both
    tiny), drops zero-count groups, rewrites only those buckets."""
    from ..cache import tracked_persist

    # persisted: the bucket-id probe below AND the merge union both
    # consume the collapsed delta — unpersisted, the full change-set
    # aggregation (often a scan+filter over a fact table) ran twice
    # per refresh
    d = tracked_persist(
        _bucketed(_delta_agg(delta, keys, value_col, sign_col), keys, n_buckets)
    )
    buckets = [r._kb for r in d.select("_kb").distinct().collect()]
    if not buckets:
        return []

    # resolve ONCE and pin both the read and the optimistic commit's
    # conflict check to that version (merge.py merge_into discipline:
    # a disjoint writer may commit between this read and the publish)
    from .merge import current_manifest

    read_version, _ = current_manifest(spark, path)
    if read_version is None:
        raise FileNotFoundError(f"no committed manifest under {path}")
    # manifest-pruned read: only the touched buckets' directories are
    # even LISTED; None = none of them exist yet (pure insert)
    view = read_buckets(spark, path, buckets, version=read_version)
    if view is None:
        view = spark.createDataFrame([], d.schema)
    merged = (
        view.unionByName(d)
        # ONE exchange for merge + write (r15, guide §2.4): hashing the
        # union on `_kb` alone already clusters every (_kb, keys) group
        # into one partition, so the aggregate below adds no exchange
        # of its own and the staged write takes the result pre-aligned
        # — previously the agg shuffled on (_kb, keys) and the write
        # re-shuffled the same rows on _kb for layout.
        .repartition(F.col("_kb"))
        .groupBy("_kb", *keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").cast("decimal(38,2)").alias("total"),
        )
        .filter(F.col("cnt") > 0)
        # no materialize: the staged write goes to a private gen dir
        # and the old bucket files outlive the write (merge.py's
        # round-14 contract) — the localCheckpoint was a full extra
        # execution of the refresh plan
    )
    overwrite_touched_buckets(
        spark, path, merged, buckets, read_version=read_version,
        pre_aligned=True,
    )
    return sorted(buckets)


def read_view(spark: SparkSession, path: str) -> DataFrame:
    return _read_with_sidecar(spark, path).drop("_kb")
