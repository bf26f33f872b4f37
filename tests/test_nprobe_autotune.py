"""Auto-tuned nprobe (r13 verdict ask #5): build/rebuild can record
the index's OWN recall-vs-nprobe curve as a `_nprobe_curve` sidecar
(ground truth = the full probe, which is exact by construction), and
`search(..., target_recall=)` / `search_batch(..., target_recall=)`
resolve nprobe from the measured knee — the IVF tier's accuracy
contract, stated like the quantized tiers' re-rank. Pins: monotone
non-decreasing recall, exactness of the full-probe point, knee
resolution, save/load round-trip, staged-with-the-swap persistence on
rebuild, and the stale-curve INVALIDATION semantics (a plain rebuild
drops the old curve rather than letting it describe new centroids).
"""

from __future__ import annotations

import random

import pytest

import python_vectordbapp_ceph_spark.operators.ivf as ivf

DIM, N, NLIST = 8, 400, 8


def _emb(spark, n=N, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(DIM)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_curve_monotone_and_full_probe_exact(spark, tmp_path):
    index = ivf.build_ivf(_emb(spark), nlist=NLIST)
    curve = ivf.record_recall_curve(index, None, k=5, n_queries=16)
    assert [p for p, _ in curve] == [1, 2, 4, 8]
    recalls = [r for _, r in curve]
    assert recalls == sorted(recalls), (
        "larger nprobe examines a candidate superset — recall must be "
        f"monotone non-decreasing, got {curve}"
    )
    assert recalls[-1] == 1.0, "full probe IS exact"
    assert recalls[0] < 1.0, (
        "uniform vectors must lose some neighbors at nprobe=1 — if this "
        "ever trips, the fixture stopped exercising the trade-off"
    )
    assert index.curve == curve


def test_resolver_picks_measured_knee(spark):
    index = ivf.build_ivf(_emb(spark), nlist=NLIST)
    ivf.record_recall_curve(index, None, k=5, n_queries=16)
    # the knee: smallest ladder point meeting the target
    knee = index.resolve_nprobe(1.0)
    assert knee == min(p for p, r in index.curve if r >= 1.0)
    assert index.resolve_nprobe(0.0) == 1, "any point meets target 0"
    for target in (0.5, 0.9, 0.99):
        p = index.resolve_nprobe(target)
        assert dict(index.curve)[p] >= target
        smaller = [q for q, _ in index.curve if q < p]
        assert all(dict(index.curve)[q] < target for q in smaller), (
            "resolver must pick the SMALLEST satisfying nprobe"
        )


def test_resolver_without_curve_fails_loudly(spark):
    index = ivf.build_ivf(_emb(spark), nlist=NLIST)
    with pytest.raises(ValueError, match="record_curve"):
        index.resolve_nprobe(0.9)
    with pytest.raises(ValueError, match="record_curve"):
        ivf.search_batch(
            index,
            _emb(spark, n=4).selectExpr(
                "vec_id as q_id", "embedding as q_embedding"
            ),
            k=3, target_recall=0.9,
        )


@pytest.mark.slow
def test_save_load_roundtrip_and_target_recall_search(spark, tmp_path):
    root = str(tmp_path / "idx")
    index = ivf.build_ivf(_emb(spark), nlist=NLIST)
    ivf.save_ivf(index, root, record_curve=True, curve_queries=16)
    loaded = ivf.load_ivf(spark, root)
    assert loaded.curve is not None and loaded.curve[-1][1] == 1.0
    queries = _emb(spark, n=6, seed=99).selectExpr(
        "vec_id as q_id", "embedding as q_embedding"
    )
    want_np = loaded.resolve_nprobe(0.9)
    via_target = {
        (r.q_id, r.vec_id)
        for r in ivf.search_batch(
            loaded, queries, k=3, target_recall=0.9
        ).collect()
    }
    via_np = {
        (r.q_id, r.vec_id)
        for r in ivf.search_batch(
            loaded, queries, k=3, nprobe=want_np
        ).collect()
    }
    assert via_target == via_np, "target_recall= is sugar for the knee"
    # single-query surface too
    one = loaded.search([0.0] * DIM, k=3, target_recall=0.9)
    assert one.count() == 3


@pytest.mark.slow
def test_rebuild_stages_curve_with_swap_and_invalidates_stale(
    spark, tmp_path
):
    root = str(tmp_path / "idx")
    index = ivf.build_ivf(_emb(spark), nlist=NLIST)
    ivf.save_ivf(index, root, record_curve=True, curve_queries=16)
    assert ivf.load_ivf(spark, root).curve is not None

    # a plain rebuild DROPS the old curve (it described the old
    # centroids) — target_recall then fails loudly until re-recorded
    ivf.rebuild_saved_ivf(spark, root, lease_timeout_ms=0)
    reloaded = ivf.load_ivf(spark, root)
    assert reloaded.curve is None, (
        "a stale curve surviving a rebuild would resolve nprobe "
        "against centroids it never measured"
    )
    with pytest.raises(ValueError, match="record_curve"):
        reloaded.resolve_nprobe(0.9)

    # rebuild WITH record_curve stages the fresh curve with the swap
    ivf.rebuild_saved_ivf(
        spark, root, lease_timeout_ms=0, record_curve=True, curve_queries=16
    )
    fresh = ivf.load_ivf(spark, root)
    assert fresh.curve is not None and fresh.curve[-1][1] == 1.0
