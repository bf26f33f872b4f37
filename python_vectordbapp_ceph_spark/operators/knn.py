"""Top-k nearest-neighbor search — the reference's read query.

Reference behavior being reproduced (Spark-first, not a port):
  - embed query → ``query_vectors(..., topK=k, returnDistance=True)``
    (s3vectors-app/search.py:49-58) / ``client.search(limit=k,
    output_fields=[...])`` (milvus-app/search.py:13-19), metric L2.

Plan shapes (scale notes):
  - single query vector: literal-array distance column →
    ``orderBy(dist).limit(k)``. Catalyst plans TakeOrderedAndProject —
    a per-partition top-k + tiny final merge on the driver. No shuffle
    of the base table; at 100 TB this is a full scan + k-row merge,
    the optimal exact plan.
  - query BATCH: broadcast the (small) query side, BroadcastNestedLoop
    join, then per-query window ``row_number() <= k``. The big side is
    never shuffled for the join (broadcast); the window shuffles only
    (qid) partitions of candidate rows. For large k×N, pre-filter with
    the IVF operator (operators/ivf.py) to prune partitions first.

Distance ties are broken by the id column so results are deterministic
and oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def _query_vec_literal(qvec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in qvec]).cast("array<double>")


def knn_topk(
    df: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    output_cols: list[str] | None = None,
) -> DataFrame:
    """Exact top-k for ONE query vector.

    TakeOrderedAndProject plan: no shuffle, scales linearly in rows.
    """
    dist = F.round(V.distance(F.col(vec_col), _query_vec_literal(qvec), metric), 6)
    out = df.withColumn("distance", dist)
    cols = output_cols or [id_col]
    # nulls LAST: cosine distance is NULL for zero-norm vectors, and
    # plain asc() is NULLS FIRST — degenerate rows must not outrank
    # every real neighbor
    return (
        out.select(*cols, "distance")
        .orderBy(F.col("distance").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def knn_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "q_embedding",
    q_id_col: str = "q_id",
    metric: str = "l2",
) -> DataFrame:
    """Exact top-k per query for a BATCH of query vectors.

    ``queries`` is small (broadcast); base table is scanned once.
    Returns (q_id, vec_id, distance) with deterministic tie-breaks.
    """
    joined = df.crossJoin(F.broadcast(queries))
    dist = F.round(V.distance(F.col(vec_col), F.col(q_vec_col), metric), 6)
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("distance").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("distance", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(q_id_col, id_col, "distance")
    )


def similarity_topk(
    df: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine-similarity top-k (descending similarity)."""
    sim = F.round(
        V.cosine_similarity(F.col(vec_col), _query_vec_literal(qvec)), 6
    )
    return (
        df.withColumn("similarity", sim)
        .select(id_col, "similarity")
        .orderBy(F.col("similarity").desc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )
