"""A3 type dispatch: route TEXT vs IMAGE objects to their embedding
pipelines — the reference's ``match object_type`` branch
(s3vectors-app/pythonvectordbceph.py:158-173, env OBJECT_TYPE).

Spark-first shape: filter-split → per-modality pipeline → unionByName,
NOT a CASE WHEN over UDFs. A CASE expression does not short-circuit
vectorized pandas_udfs per row — both towers would run over every row.
The split form sends each row through exactly one model, and each
branch is independently parallel.

Unknown types are not dropped silently and not a job-failure either:
they surface with status='unsupported_type' (the reference returns
HTTP 400, pythonvectordbceph.py:171-173; its Milvus twin has an
unbound-variable crash there which we deliberately do not reproduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_modalities(
    df: DataFrame,
    modality_col: str = "modality",
    text_col: str = "text",
    content_col: str = "content",
) -> DataFrame:
    """Split by modality, embed each branch with its tower, re-union.

    Returns the input plus ``embedding`` (384-d text / 512-d image /
    null) and ``status`` ('ok' | 'unsupported_type').
    """
    from ..cache import tracked_persist
    from ..embed.embedders import image_embed_udf, text_embed_udf

    # the three branch filters each re-read the input; persist so an
    # expensive upstream (decode UDFs, joins) is paid once per action
    # (tracked: cache.release_caches() frees it in long-lived sessions)
    df = tracked_persist(df)
    m = F.lower(F.col(modality_col))
    texts = df.filter(m == "text").withColumn(
        "embedding", text_embed_udf(F.col(text_col))
    ).withColumn("status", F.lit("ok"))
    images = df.filter(m == "image").withColumn(
        "embedding", image_embed_udf(F.col(content_col))
    ).withColumn("status", F.lit("ok"))
    other = df.filter(m.isNull() | ~m.isin("text", "image")).withColumn(
        "embedding", F.lit(None).cast("array<float>")
    ).withColumn("status", F.lit("unsupported_type"))
    return texts.unionByName(images).unionByName(other)
