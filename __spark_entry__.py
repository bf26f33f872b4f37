"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry itself lives in ``python_vectordbapp_ceph_spark.queries``
(one module per operator family, oracle SQL colocated with each query).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# import must work regardless of the harness CWD
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 M0): the reference's search path —
    multimodal join (documents⋈embeddings), L2-normalize, exact top-k
    by L2 distance, project (doc_id, distance, text preview).

    Mirrors milvus-app/search.py:13-19 / s3vectors-app/search.py:49-58
    re-expressed as one declarative plan: broadcast-joined dims, all
    vector math in codegen'd higher-order functions, top-k planned as
    TakeOrderedAndProject (no shuffle of the base table).
    """
    from python_vectordbapp_ceph_spark.functions import vector as V
    from python_vectordbapp_ceph_spark.operators.knn import knn_topk
    from python_vectordbapp_ceph_spark.queries._common import T
    from python_vectordbapp_ceph_spark.queries.vector import QVEC

    sf_dir = "/root/testdata/sf0.001"
    docs = T(spark, sf_dir, "documents")
    embs = T(spark, sf_dir, "embeddings")
    collection = docs.join(embs, docs.doc_id == embs.vec_id).select(
        "doc_id",
        V.l2_normalize("embedding").alias("embedding"),
        F.substring("text", 1, 40).alias("preview"),
    )
    qnorm = [x / (sum(v * v for v in QVEC) ** 0.5) for x in QVEC]
    return knn_topk(
        collection, qnorm, k=5, id_col="doc_id", output_cols=["doc_id", "preview"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from python_vectordbapp_ceph_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every hash-checkable query; approximate /
    non-SQL-expressible operators are intentionally absent (the driver
    records the weaker rows-only check for them)."""
    from python_vectordbapp_ceph_spark.queries import ORACLES

    return dict(ORACLES)
