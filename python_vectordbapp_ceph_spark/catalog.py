"""A18 DDL / catalog surface: the Spark-native analog of the
reference's collection admin verbs —

  has_collection / create_collection / describe_collection /
  list_indexes (milvus-app/pythonvectordbceph_milvus.py:92-103,
  describe.py:11-24) and get/create_vector_bucket
  (s3vectors-app/pythonvectordbceph.py:93-119)

— expressed through spark.catalog + SQL DDL over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table


def register_table_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Idempotent 'ensure exists' for the whole star schema: every
    driver table becomes a temp view (the has→create pattern)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def has_table(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def describe_table(spark: SparkSession, name: str) -> DataFrame:
    """DESCRIBE TABLE → (col_name, data_type) rows."""
    return spark.sql(f"DESCRIBE TABLE {name}").select("col_name", "data_type")


def list_tables(spark: SparkSession) -> list[str]:
    return [t.name for t in spark.catalog.listTables()]


def create_collection_table(spark: SparkSession, name: str, dim: int, path: str) -> None:
    """CREATE TABLE DDL for a vector collection over parquet — the
    create_collection(schema) analog. Idempotent."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {name} (
            key STRING, url STRING, embedding ARRAY<FLOAT>,
            tags MAP<STRING,STRING>, props MAP<STRING,STRING>,
            ingest_ts TIMESTAMP, seq BIGINT, op STRING
        ) USING parquet LOCATION '{path}'
        """
    )
