"""PCA over an embedding column — the dimension-reduction step a
vector pipeline runs between embedding and indexing (project 64-dim
vectors onto the leading principal components, then hand the smaller
vectors to the IVF/SQ/PQ tiers; also the whitening/collapse companion
to q_embed_covariance's raw covariance report).

Spark-shaped in the way that matters at 100 TB: the ONLY driver-side
object is the d×d covariance matrix (d = embedding dim, a constant —
64 here, kilobytes), assembled from EXACT decimal sums so the matrix,
and therefore the eigendecomposition, is bit-identical under every
partitioning:

  - components round to the 1e-6 grid → pairwise products live
    exactly on the 1e-12 grid → Σx in DECIMAL(18,6) and Σxy in
    DECIMAL(24,12) are exact order-insensitive reductions (same
    discipline as q_embed_covariance, evaluation.py:843).
  - the (i ≤ j) moment aggregate has d(d+1)/2 groups — a CONSTANT
    group count with map-side partials; the per-row fan-out is d²-ish
    but data-independent.
  - ``numpy.linalg.eigh`` runs on the driver over the d×d matrix
    (LAPACK on a 64×64 symmetric matrix — microseconds); eigenvector
    sign is fixed deterministically (largest-|component| entry made
    positive, lowest index on ties).
  - projection back on the cluster is a whole-stage-codegen
    ``F.aggregate`` dot product against the broadcast literal
    component arrays — no Python, no shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> np.ndarray:
    """Exact (rounded-6-grid) covariance matrix of the first ``dim``
    components, deterministic under any partitioning."""
    x = df.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.posexplode(F.slice(vec_col, 1, dim)).alias("i", "_x"),
    ).select("_rid", "i", F.round(F.col("_x").cast("double"), 6).alias("v"))
    a = x.select("_rid", F.col("i").alias("di"), F.col("v").alias("va"))
    b = x.select(
        F.col("_rid").alias("_rb"), F.col("i").alias("dj"), F.col("v").alias("vb")
    )
    p = (
        a.join(b, (a["_rid"] == b["_rb"]) & (a["di"] <= b["dj"]))
        .groupBy("di", "dj")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("va").cast("decimal(18,6)")).alias("sx"),
            F.sum(F.col("vb").cast("decimal(18,6)")).alias("sy"),
            F.sum((F.col("va") * F.col("vb")).cast("decimal(24,12)")).alias("sxy"),
        )
        .collect()  # bounded: d(d+1)/2 rows, never data-sized
    )
    cov = np.zeros((dim, dim))
    for r in p:
        c = (float(r["sxy"]) - float(r["sx"]) * float(r["sy"]) / r["n"]) / r["n"]
        cov[r["di"], r["dj"]] = c
        cov[r["dj"], r["di"]] = c
    return cov


def pca_fit(
    df: DataFrame, vec_col: str, dim: int, q: int
) -> tuple[np.ndarray, np.ndarray]:
    """Top-q principal components (q×dim) + their eigenvalues,
    descending, with deterministic sign convention."""
    cov = covariance_matrix(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:q]
    comps, evs = [], []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))  # argmax takes lowest on ties
        if v[pivot] < 0:
            v = -v
        comps.append(v)
        evs.append(float(vals[idx]))
    return np.vstack(comps), np.array(evs)


def project_col(vec_col: str, component: np.ndarray) -> Column:
    """JVM-side dot product of the vector column against one literal
    component — codegen'd, no Python in the hot path."""
    comp = F.array(*[F.lit(float(c)) for c in component])
    return F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            comp,
            lambda x, c: x * c,
        ),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )


def pca_project(
    df: DataFrame, vec_col: str, components: np.ndarray, prefix: str = "pc"
) -> DataFrame:
    """Append rounded projections onto the top components."""
    out = df
    for j, comp in enumerate(components, start=1):
        out = out.withColumn(
            f"{prefix}{j}", F.round(project_col(vec_col, comp), 6)
        )
    return out
