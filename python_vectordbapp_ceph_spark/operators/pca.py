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
    components, deterministic under any partitioning.

    The (i ≤ j) component pairs are generated INSIDE each row by two
    chained generators (posexplode of the vector, then posexplode of
    its j ≥ i suffix) — no row id, no self-join: a row-id pairing
    (monotonically_increasing_id on two branches) is only correct for
    deterministic file scans and silently mis-pairs under upstream
    shuffles or nondeterministic sources, and it shuffles n·d rows.
    Here rows never leave their input partition until the d(d+1)/2-
    group aggregate's map-side partials."""
    base = df.select(
        F.transform(
            F.slice(F.col(vec_col), 1, dim),
            lambda c: F.round(c.cast("double"), 6),
        ).alias("_v")
    )
    a = base.select("_v", F.posexplode("_v").alias("di", "va"))
    p = (
        a.select(
            "di",
            "va",
            F.posexplode(
                F.slice(F.col("_v"), F.col("di") + 1, F.lit(dim) - F.col("di"))
            ).alias("_p", "vb"),
        )
        .select("di", (F.col("di") + F.col("_p")).alias("dj"), "va", "vb")
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
