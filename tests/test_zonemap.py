"""Ledger sidecar key-range zonemaps (r11): a probe batch whose key
range is disjoint from a container's committed (kmin, kmax) skips that
container's bloom entirely — and the dedup answer is byte-identical
with the pruning on, off, or unavailable (legacy sidecars)."""

import pytest
from pyspark.sql import functions as F

import python_vectordbapp_ceph_spark.operators.shards as sh
from python_vectordbapp_ceph_spark.operators.shards import (
    append_segment,
    dedup_against_ledger,
)

BUDGET = 500


def _docs(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100)) + 1).alias("n_tokens"),
    )


@pytest.fixture()
def probe_spy(monkeypatch):
    """Record which containers each dedup probe actually blooms."""
    calls = []
    real = sh.bloom_contains_many

    def spy(blooms, *a, **k):
        calls.append(sorted(tag for tag, _, _ in blooms))
        return real(blooms, *a, **k)

    monkeypatch.setattr(sh, "bloom_contains_many", spy)
    return calls


def _ledger(spark, tmp_path):
    led = str(tmp_path / "led")
    append_segment(spark, led, _docs(spark, 0, 50), BUDGET)       # keys 0-49
    append_segment(spark, led, _docs(spark, 100, 50), BUDGET)     # keys 100-149
    return led


def test_disjoint_batch_skips_all_blooms(spark, tmp_path, probe_spy):
    led = _ledger(spark, tmp_path)
    out = dedup_against_ledger(spark, led, _docs(spark, 500, 30))
    assert out.count() == 30  # nothing committed in range → all kept
    assert probe_spy == [], "disjoint batch must not bloom any container"


def test_overlap_probes_only_overlapping_container(spark, tmp_path, probe_spy):
    led = _ledger(spark, tmp_path)
    # 40..59 overlaps container 0 (0-49) only: 40-49 are redeliveries
    out = dedup_against_ledger(spark, led, _docs(spark, 40, 20))
    assert sorted(r.doc_id for r in out.collect()) == list(range(50, 60))
    assert probe_spy == [[0]], f"expected only container 0 probed: {probe_spy}"

    # spanning batch probes both and drops both containers' redeliveries
    probe_spy.clear()
    out2 = dedup_against_ledger(spark, led, _docs(spark, 45, 60))  # 45..104
    assert sorted(r.doc_id for r in out2.collect()) == list(range(50, 100))
    assert probe_spy == [[0, 1]]


def test_legacy_sidecar_without_zonemap_still_exact(spark, tmp_path):
    """Pre-r11 sidecars carry no (kmin, kmax): never pruned, always
    probed — the gate stays exact, just without the skip."""
    import os
    import shutil

    from python_vectordbapp_ceph_spark.operators.bloom import bloom_build

    led = _ledger(spark, tmp_path)
    # rewrite container 1's sidecar in the pre-r10 position-set form
    # (no m, no zonemap)
    import json

    cdir = os.path.join(led, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        live = json.load(f)["buckets"]
    g1 = live["1"]
    bpath = os.path.join(led, f"gen={g1}", "_bloom")
    shutil.rmtree(bpath)
    bloom_build(
        _docs(spark, 100, 50).select("doc_id"), "doc_id",
        sh.BLOOM_K, sh.BLOOM_M,
    ).coalesce(1).write.parquet(bpath)
    sh._SIDECAR_M_CACHE.clear()

    # disjoint from container 0's zonemap, unknown for container 1 →
    # container 1 probed anyway, answer exact
    out = dedup_against_ledger(spark, led, _docs(spark, 120, 60))  # 120..179
    assert sorted(r.doc_id for r in out.collect()) == list(range(150, 180))


def test_compacted_container_zonemap_covers_merged_range(spark, tmp_path):
    led = _ledger(spark, tmp_path)
    append_segment(spark, led, _docs(spark, 300, 20), BUDGET)
    assert sh.compact(spark, led, max_segments=1) == 3
    sh._SIDECAR_M_CACHE.clear()
    # the merged container's zonemap must span 0..319, so a batch
    # inside the old gap (60..99) now overlaps and is probed — and
    # correctly all-new
    out = dedup_against_ledger(spark, led, _docs(spark, 60, 40))
    assert out.count() == 40
    # while a redelivery across the merge is still dropped exactly
    out2 = dedup_against_ledger(spark, led, _docs(spark, 140, 20))  # 140..159
    assert sorted(r.doc_id for r in out2.collect()) == list(range(150, 160))
