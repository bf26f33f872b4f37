"""PCA operator invariants (operators/pca.py): exact covariance →
deterministic eigh → orthonormal, variance-ordered components whose
projections don't depend on the input partitioning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.io import load_table
from python_vectordbapp_ceph_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
)

SF_DIR = "/root/testdata/sf0.001"
DIM, Q = 64, 4


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)


def test_covariance_partitioning_invariant(spark, emb):
    c1 = covariance_matrix(emb.repartition(1), "embedding", 8)
    c7 = covariance_matrix(emb.repartition(7), "embedding", 8)
    assert np.array_equal(c1, c7)  # exact integer sums → bit-identical
    assert np.allclose(c1, c1.T)


def test_covariance_sql_path_partitioning_invariant(spark, emb):
    c1 = covariance_matrix(emb.repartition(1), "embedding", 8, method="sql")
    c7 = covariance_matrix(emb.repartition(7), "embedding", 8, method="sql")
    assert np.array_equal(c1, c7)  # exact decimal sums → bit-identical
    assert np.allclose(c1, c1.T)


def test_covariance_arrow_matches_sql_twin(spark, emb):
    """The integer-gram arrow path and the all-JVM decimal path are
    the same exact math on the same 1e-6 grid; they may only diverge
    where a value sits within a double ULP of a .5 grid boundary
    (none in this corpus)."""
    ca = covariance_matrix(emb, "embedding", 16, method="arrow")
    cs = covariance_matrix(emb, "embedding", 16, method="sql")
    assert np.allclose(ca, cs, atol=1e-9), np.max(np.abs(ca - cs))


def test_components_orthonormal_and_ordered(spark, emb):
    comps, evs = pca_fit(emb, "embedding", DIM, Q)
    assert comps.shape == (Q, DIM)
    assert np.allclose(comps @ comps.T, np.eye(Q), atol=1e-9)
    assert all(evs[i] >= evs[i + 1] for i in range(Q - 1))
    assert evs[-1] >= 0  # covariance is PSD
    # deterministic sign: the largest-|entry| component is positive
    for v in comps:
        assert v[int(np.argmax(np.abs(v)))] > 0


def test_projection_matches_numpy_and_partitioning(spark, emb):
    comps, _ = pca_fit(emb, "embedding", DIM, Q)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"], r["pc3"], r["pc4"])
        for r in pca_project(emb.repartition(5), "embedding", comps)
        .select("vec_id", "pc1", "pc2", "pc3", "pc4")
        .collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows[:20]:
        v = np.array(r["embedding"], dtype=np.float64)
        want = comps @ v
        for j in range(Q):
            assert abs(got[r["vec_id"]][j] - want[j]) < 1e-5


def test_projected_variance_captures_and_orders(spark, emb):
    comps, evs = pca_fit(emb, "embedding", DIM, Q)
    proj = pca_project(emb, "embedding", comps)
    stats = proj.agg(
        *[F.variance(f"pc{j}").alias(f"v{j}") for j in range(1, Q + 1)]
    ).collect()[0]
    sample_vars = [stats[f"v{j}"] for j in range(1, Q + 1)]
    # population eigenvalue ≈ sample variance (n/(n-1) factor + rounding)
    n = emb.count()
    for ev, sv in zip(evs, sample_vars):
        assert abs(ev * n / (n - 1) - sv) < 1e-3
    assert all(
        sample_vars[i] >= sample_vars[i + 1] - 1e-9 for i in range(Q - 1)
    )
