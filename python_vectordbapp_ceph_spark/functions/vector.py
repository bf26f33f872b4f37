"""Vector column expressions — all JVM-side higher-order functions.

Replaces the reference's numpy/sklearn per-row math with whole-stage
codegen'd Catalyst expressions:

  - L2 normalize   (reference: sklearn ``normalize(..., norm="l2")``,
    s3vectors-app/pythonvectordbceph.py:47, milvus twin :52)
  - L2 / cosine / dot distance (reference delegates to the backend:
    ``distanceMetric='euclidean'`` s3vectors-app/pythonvectordbceph.py:114,
    ``metric_type="L2"`` milvus-app/pythonvectordbceph_milvus.py:101)
  - float32 cast    (reference: np.float32 cast, pythonvectordbceph.py:191)
  - dimension check (reference: backend dim-checked index,
    pythonvectordbceph.py:113)

All math accumulates in DOUBLE, left-to-right over the array, which is
bit-identical to the DuckDB oracle's list_transform/list_sum pipeline —
that determinism is what lets the driver value-hash distance columns.

No Python UDFs here: every expression stays inside whole-stage codegen,
so a 100 TB scan of embeddings never crosses the JVM/Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def squared_l2(a: Column | str, b: Column | str) -> Column:
    """Sum of squared differences, accumulated in double."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b

    def sqdiff(x, y):
        d = x.cast("double") - y.cast("double")
        # multiply, not **2: pow() is allowed 1-ulp error in libm, while
        # d*d is IEEE-exact in every engine — keeps the oracle hashable
        return d * d

    return F.aggregate(
        F.zip_with(a, b, sqdiff),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (the reference's search metric)."""
    return F.sqrt(squared_l2(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(v: Column | str) -> Column:
    """Scale to unit L2 norm; zero vectors pass through unchanged
    (sklearn's behavior, which the reference relies on)."""
    v = F.col(v) if isinstance(v, str) else v
    norm = l2_norm(v)
    return F.when(norm == 0.0, v.cast("array<double>")).otherwise(
        F.transform(v, lambda x: x.cast("double") / norm)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|) — on pre-normalized vectors this equals dot.

    NULL (not an error) when either vector has zero norm: under Spark
    4's default ANSI mode a bare division raises DIVIDE_BY_ZERO and
    would kill the whole job on one degenerate row (hypothesis-found).
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def as_float32(v: Column | str) -> Column:
    """array<float> cast — the storage dtype of the reference
    (np.float32 cast before put_vectors, pythonvectordbceph.py:191)."""
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<float>")


def dim_ok(v: Column | str, dim: int) -> Column:
    """Boolean dimension check (what the backend index enforced)."""
    v = F.col(v) if isinstance(v, str) else v
    return v.isNotNull() & (F.size(v) == dim)


DISTANCE_FNS = {
    "l2": l2_distance,
    "euclidean": l2_distance,
    "sqeuclidean": squared_l2,
    "cosine": cosine_distance,
    "dot": dot,
}


def distance(a: Column | str, b: Column | str, metric: str = "l2") -> Column:
    try:
        return DISTANCE_FNS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(DISTANCE_FNS)}")
