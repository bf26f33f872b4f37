"""Loaders for the driver's synthetic parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Everything is a plain columnar parquet scan so Catalyst's predicate
pushdown + column pruning apply for free; at 100 TB the same loader
points at a partitioned directory tree and nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns written as parquet TIMESTAMP(NANOS): Spark 4 refuses them by
# default (PARQUET_TYPE_ILLEGAL). We read them as raw nanos longs
# (legacy.parquet.nanosAsLong) and rebuild micro-precision timestamps —
# integer `div 1000` (no double round-trip, exact beyond 2^53) which is
# bit-identical to what DuckDB's reader produces for the oracle.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


_PYFILES_SHIPPED: set[str] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to Python UDF workers via addPyFile.

    Workers deserialize module-referenced pandas UDFs (fingerprint,
    embedders, PQ encode) by importing their module — which fails with
    ModuleNotFoundError when the driving process runs from another CWD
    (workers inherit neither the driver's sys.path mutations nor env
    changes made after the JVM launched). A one-time zip + addPyFile
    puts the package on every worker's sys.path regardless of CWD —
    and is exactly what a spark-submit deployment of this repo would
    do with --py-files."""
    sc = spark.sparkContext
    # keyed on applicationId, NOT id(sc): CPython reuses object
    # addresses, so a new context allocated where a collected one
    # lived would silently skip shipping
    key = sc.applicationId
    if key in _PYFILES_SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"pvcs_pkg_{os.getpid()}_{key}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    try:
        sc.addPyFile(zpath)
    except Exception as exc:
        # e.g. a session that forbids addFile — CWD path still works,
        # but a real shipping failure would otherwise surface much
        # later as a worker ModuleNotFoundError, so say so now
        import logging

        logging.getLogger(__name__).warning(
            "addPyFile(%s) failed (%s); workers must already have the "
            "package on sys.path", zpath, exc,
        )
    _PYFILES_SHIPPED.add(key)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Filters/projections placed on the
    result reach the parquet reader (PushedFilters / ReadSchema)."""
    # Runtime-settable SQL conf, so this works even under the driver's
    # own SparkSession (which we don't get to build). UTC session tz so
    # a TIMESTAMP_NTZ wall-clock reinterprets to the identical instant
    # DuckDB's naive reader produces.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ensure_workers_can_import(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANOS_TS_COLS.get(name, ()):
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":
            # FLOOR division, not `div` (truncates toward zero): DuckDB's
            # nanos reader floors, so pre-epoch timestamps must floor here
            # too or the engines disagree by 1µs on negative ts.
            df = df.withColumn(
                c,
                F.expr(
                    f"timestamp_micros(if({c} >= 0, {c} div 1000,"
                    f" -((999 - {c}) div 1000)))"
                ),
            )
        elif dt == "timestamp_ntz":
            # Newer testdata writes plain TIMESTAMP(MICROS) (naive), which
            # Spark reads as TIMESTAMP_NTZ. Our whole query surface (and
            # unix_micros/window arithmetic) is written against TIMESTAMP;
            # under the UTC session tz set above this cast is an exact
            # epoch reinterpretation, matching the oracle engine.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
