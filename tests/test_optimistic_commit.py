"""Optimistic multi-writer commits (operators/merge.commit_optimistic
— the r13 verdict's top ask): writers stage independently and
conflict-check the TOUCHED BUCKET SET of every commit that landed
since their read version. Disjoint commits rebase and BOTH land
(the table equals the serial execution in either order); overlapping
commits — and commits carrying no touched info — still single-win
with a clean, typed loss. Pinned here IN-process under BOTH publish
backends; the cross-process race lives in tools/contention_twin.py +
tests/test_contention_twin.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import python_vectordbapp_ceph_spark.operators.merge as M
from python_vectordbapp_ceph_spark.operators import publish as P

N_BUCKETS = 16


@pytest.fixture(params=["rename", "conditional-put"])
def backend(request):
    P.force_publish_backend(request.param)
    yield request.param
    P.force_publish_backend(None)


def _base_rows(spark, n=40):
    return spark.createDataFrame(
        [(f"k{i}", i * 10, 0) for i in range(n)],
        "key string, val long, ts long",
    )


def _bucket_of(spark, key: str) -> int:
    return spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(key)), F.lit(N_BUCKETS)).alias("b")
    ).collect()[0].b


def _two_disjoint_keys(spark):
    """Two keys whose buckets differ (so two merges touch disjoint
    bucket sets)."""
    a = "k1"
    ba = _bucket_of(spark, a)
    for i in range(2, 40):
        b = f"k{i}"
        if _bucket_of(spark, b) != ba:
            return a, b
    raise AssertionError("no disjoint key pair in 40 keys?!")


def _change(spark, key, val, ts=1):
    return spark.createDataFrame(
        [(key, val, ts, "upsert")],
        "key string, val long, ts long, op string",
    )


def _rows(spark, path):
    return {(r.key, r.val) for r in M.read_base(spark, path).collect()}


def _merge_with_stale_view(spark, path, change, stale, monkeypatch):
    """Run merge_into as a writer that READ the table at ``stale`` —
    the optimistic-concurrency geometry: its staged result derives
    from the stale version while newer commits may exist."""
    monkeypatch.setattr(M, "current_manifest", lambda *a, **kw: stale)
    try:
        return M.merge_into(
            spark, path, change, key_col="key", ts_col="ts",
            n_buckets=N_BUCKETS, keep_history=True,
        )
    finally:
        monkeypatch.undo()


def test_disjoint_merges_both_land_equal_serial(
    spark, tmp_path, monkeypatch, backend
):
    """Two merges read the SAME version and touch DISJOINT buckets:
    the second rebases over the first and both land — final content
    identical to the serial run, under both publish backends."""
    ka, kb = _two_disjoint_keys(spark)

    serial = str(tmp_path / "serial")
    M.write_bucketed_base(_base_rows(spark), serial, "key", N_BUCKETS)
    M.merge_into(spark, serial, _change(spark, ka, 111), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS)
    M.merge_into(spark, serial, _change(spark, kb, 222), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS)
    want = _rows(spark, serial)

    raced = str(tmp_path / "raced")
    M.write_bucketed_base(_base_rows(spark), raced, "key", N_BUCKETS)
    stale = M.current_manifest(spark, raced)       # both writers read v0
    M.merge_into(spark, raced, _change(spark, ka, 111), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS, keep_history=True)  # v1
    _merge_with_stale_view(
        spark, raced, _change(spark, kb, 222), stale, monkeypatch
    )                                              # rebases onto v1 → v2
    spark.catalog.refreshByPath(raced)
    v, _ = M.current_manifest(spark, raced)
    assert v == 2, "both commits landed (no lease, no lost write)"
    assert _rows(spark, raced) == want
    # each commit records its touched set for later conflict checks
    rec = M._read_json(spark, f"{raced}/_commits/{M._commit_file(2)}")
    assert rec["touched"] == [_bucket_of(spark, kb)]


def test_overlapping_merges_single_win_and_clean_staging(
    spark, tmp_path, monkeypatch, backend
):
    """Same read version, SAME bucket: the loser raises the typed
    conflict, its staged generation is eagerly cleaned up, and the
    winner's state is untouched."""
    path = str(tmp_path / "base")
    M.write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)
    stale = M.current_manifest(spark, path)
    M.merge_into(spark, path, _change(spark, "k1", 111), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS, keep_history=True)
    won = _rows(spark, path)
    with pytest.raises(M.ConcurrentWriteConflictError, match="overlapping"):
        _merge_with_stale_view(
            spark, path, _change(spark, "k1", 222, ts=2), stale, monkeypatch
        )
    spark.catalog.refreshByPath(path)
    assert _rows(spark, path) == won
    # exactly one v1-staged generation remains: the winner's (the
    # loser dropped its own eagerly — it KNOWS it lost)
    g1 = [d for d in os.listdir(path) if d.startswith("gen=1-")]
    assert len(g1) == 1


def test_rebase_over_multiple_disjoint_commits(
    spark, tmp_path, monkeypatch, backend
):
    """A writer that fell TWO disjoint commits behind rebases past both
    in one commit loop."""
    spark_keys = _two_disjoint_keys(spark)
    ka, kb = spark_keys
    # find a third key disjoint from both
    used = {_bucket_of(spark, ka), _bucket_of(spark, kb)}
    kc = next(
        f"k{i}" for i in range(2, 40)
        if _bucket_of(spark, f"k{i}") not in used
    )
    path = str(tmp_path / "base")
    M.write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)
    stale = M.current_manifest(spark, path)
    M.merge_into(spark, path, _change(spark, ka, 111), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS, keep_history=True)  # v1
    M.merge_into(spark, path, _change(spark, kb, 222), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS, keep_history=True)  # v2
    _merge_with_stale_view(
        spark, path, _change(spark, kc, 333), stale, monkeypatch
    )                                                                  # v3
    spark.catalog.refreshByPath(path)
    v, _ = M.current_manifest(spark, path)
    assert v == 3
    got = _rows(spark, path)
    assert {(ka, 111), (kb, 222), (kc, 333)} <= got


def test_version_race_loss_retries_and_lands(
    spark, tmp_path, monkeypatch, backend
):
    """Losing the PUBLISH race at version N (another writer snatched it
    between our resolve and our rename/create) is not a conflict: the
    loop conflict-checks the snatcher (disjoint) and lands at N+1."""
    ka, kb = _two_disjoint_keys(spark)
    path = str(tmp_path / "base")
    M.write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)

    real = M._try_publish
    sniped = {}

    def snipe(spark_, path_, version_, buckets_, extra=None, touched=None):
        if not sniped:
            sniped["v"] = version_
            # another writer snatches EXACTLY this version with a
            # disjoint no-op remap of kb's bucket
            live = M._read_manifest(spark_, path_, version_ - 1)
            bb = _bucket_of(spark_, kb)
            assert real(spark_, path_, version_, live, touched=[bb])
            return False  # and our caller loses the race
        return real(spark_, path_, version_, buckets_, extra, touched)

    monkeypatch.setattr(M, "_try_publish", snipe)
    M.merge_into(spark, path, _change(spark, ka, 111), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS, keep_history=True)
    monkeypatch.undo()
    assert sniped["v"] == 1
    spark.catalog.refreshByPath(path)
    v, _ = M.current_manifest(spark, path)
    assert v == 2, "snatcher at v1, our merge rebased to v2"
    assert (ka, 111) in _rows(spark, path)


def test_commit_without_touched_info_is_conservative_conflict(
    spark, tmp_path, monkeypatch, backend
):
    """A concurrent commit that predates the touched field (or was
    published through the low-level fixed-version primitive) must be
    treated as touching EVERYTHING — even if it was actually disjoint:
    correctness never depends on optional metadata."""
    ka, kb = _two_disjoint_keys(spark)
    path = str(tmp_path / "base")
    M.write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)
    stale = M.current_manifest(spark, path)
    # legacy-shaped commit: full map, no touched field
    _, live = M.current_manifest(spark, path)
    M._publish(spark, path, 1, live)
    with pytest.raises(M.ConcurrentWriteConflictError, match="v1"):
        _merge_with_stale_view(
            spark, path, _change(spark, kb, 222), stale, monkeypatch
        )


def test_full_replacement_conflicts_with_everything(
    spark, tmp_path, monkeypatch, backend
):
    """replace_base/write_bucketed_base commits carry touched="*": any
    optimistic writer rebasing across one must conflict — its staged
    result derives from a table that no longer exists."""
    _, kb = _two_disjoint_keys(spark)
    path = str(tmp_path / "base")
    M.write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)
    bb = _bucket_of(spark, kb)
    # the optimistic writer reads v0 and STAGES while v0's files still
    # exist (the realistic ordering — a lazy read after the replacement
    # fails loudly at scan time instead, also safe)
    staged = M.read_buckets(spark, path, [bb], version=0).localCheckpoint()
    gen = M._gen_token(1)
    survivors = M._staged_write(spark, path, staged, gen, N_BUCKETS, 1)
    # full replacement lands in between (touched="*")
    M.write_bucketed_base(_base_rows(spark, n=10), path, "key", N_BUCKETS)
    with pytest.raises(M.ConcurrentWriteConflictError, match="v1"):
        M.commit_optimistic(
            spark, path, read_version=0, touched={bb}, gen=gen,
            survivors=survivors,
        )


@pytest.mark.slow
def test_append_rebases_over_compaction(spark, tmp_path, monkeypatch, backend):
    """Ledger side: an append racing an in-line COMPACTION is disjoint
    (the compaction touches only already-committed container ids) —
    the append rebases and both land, with packing continuity intact."""
    import python_vectordbapp_ceph_spark.operators.shards as sh

    path = str(tmp_path / "ledger")
    docs = lambda lo: spark.createDataFrame(  # noqa: E731
        [(lo + j, 10 + (j % 7)) for j in range(50)],
        "doc_id long, n_tokens long",
    )
    for i in range(5):
        sh.append_segment(spark, path, docs(i * 1000), budget=500)  # v0..v4
    stale = sh.current_manifest(spark, path)      # v4, live {0..4}
    assert sh.compact(spark, path, max_segments=2) == 4          # v5
    before = {
        (r.doc_id, r.shard_id, r.segment)
        for r in sh.read_ledger(spark, path).collect()
    }
    monkeypatch.setattr(sh, "current_manifest", lambda *a, **kw: stale)
    seg = sh.append_segment(spark, path, docs(9000), budget=500)  # → v6
    monkeypatch.undo()
    assert seg == 5
    spark.catalog.refreshByPath(path)
    v, live = sh.current_manifest(spark, path)
    assert v == 6 and 5 in live
    after = {
        (r.doc_id, r.shard_id, r.segment)
        for r in sh.read_ledger(spark, path).collect()
    }
    assert before <= after and len(after) == len(before) + 50
    # continuity: the appended segment packs from the committed offset
    serial = str(tmp_path / "serial")
    for i in range(5):
        sh.append_segment(spark, serial, docs(i * 1000), budget=500)
    sh.append_segment(spark, serial, docs(9000), budget=500)
    want = {
        (r.doc_id, r.shard_id)
        for r in sh.read_ledger(spark, serial).collect()
    }
    assert {(d, s) for d, s, _ in after} == want


def test_merge_conflict_retries_rerun_from_fresh_read(
    spark, tmp_path, monkeypatch
):
    """conflict_retries=N re-runs the WHOLE merge (fresh read) on a
    typed conflict; the default 0 surfaces it. Pinned with a one-shot
    synthetic conflict at the commit step."""
    path = str(tmp_path / "base")
    M.write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)

    real = M.commit_optimistic
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise M.ConcurrentWriteConflictError("synthetic conflict")
        return real(*a, **kw)

    monkeypatch.setattr(M, "commit_optimistic", flaky)
    with pytest.raises(M.ConcurrentWriteConflictError):
        M.merge_into(spark, path, _change(spark, "k1", 111), key_col="key",
                     ts_col="ts", n_buckets=N_BUCKETS)  # default: surfaces
    calls["n"] = 0
    M.merge_into(spark, path, _change(spark, "k1", 111), key_col="key",
                 ts_col="ts", n_buckets=N_BUCKETS, conflict_retries=1)
    assert calls["n"] == 2, "one conflicted attempt + one clean retry"
    assert ("k1", 111) in _rows(spark, path)


def test_append_conflict_retries(spark, tmp_path, monkeypatch):
    import python_vectordbapp_ceph_spark.operators.shards as sh

    path = str(tmp_path / "ledger")
    docs = spark.createDataFrame(
        [(j, 10) for j in range(40)], "doc_id long, n_tokens long"
    )
    sh.append_segment(spark, path, docs, budget=200)

    real = sh.commit_optimistic
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise M.ConcurrentWriteConflictError("synthetic conflict")
        return real(*a, **kw)

    monkeypatch.setattr(sh, "commit_optimistic", flaky)
    more = spark.createDataFrame(
        [(100 + j, 10) for j in range(40)], "doc_id long, n_tokens long"
    )
    with pytest.raises(M.ConcurrentWriteConflictError):
        sh.append_segment(spark, path, more, budget=200, conflict_retries=1)
    calls["n"] = 0
    seg = sh.append_segment(
        spark, path, more, budget=200, conflict_retries=2
    )
    assert seg == 1 and calls["n"] == 3
    assert sh.read_ledger(spark, path).count() == 80


@pytest.mark.slow
def test_optimistic_commit_model_random_interleavings(
    spark, tmp_path, monkeypatch
):
    """Model-based sweep (the checkpoint plane's random-interleaving
    discipline applied to the commit protocol): a seeded random
    schedule of overlapped writers — each captures a read version,
    stages later, commits in arbitrary order — checked after EVERY
    commit against a driver-side model that predicts, from the
    recorded touched sets alone, (a) whether the commit rebases or
    conflicts and (b) the exact table contents. Any divergence between
    the protocol's conflict rule and the model's serial-equivalence
    rule fails here, not in production."""
    import random as _random

    rng = _random.Random(20260816)
    path = str(tmp_path / "base")
    keys = [f"k{i}" for i in range(24)]
    M.write_bucketed_base(
        spark.createDataFrame(
            [(k, i * 10, 0) for i, k in enumerate(keys)],
            "key string, val long, ts long",
        ),
        path, "key", N_BUCKETS,
    )
    # bucket map in ONE job
    brows = spark.createDataFrame([(k,) for k in keys], "key string").select(
        "key", F.pmod(F.xxhash64("key"), F.lit(N_BUCKETS)).alias("b")
    ).collect()
    bucket = {r.key: r.b for r in brows}

    model = {k: i * 10 for i, k in enumerate(keys)}
    committed_touched: list = [None]          # v0 full replacement = "*"
    pending: list = []                        # (read_version, {key: val}, ts)
    ts = 1
    n_rebase = n_conflict = 0

    def _current_rows():
        return {(r.key, r.val) for r in M.read_base(spark, path).collect()}

    for _step in range(40):
        if pending and (rng.random() < 0.55 or len(pending) >= 3):
            rv, kv, wts = pending.pop(rng.randrange(len(pending)))
            touched = {bucket[k] for k in kv}
            since = committed_touched[rv + 1:]
            expect_ok = all(t is not None and not (t & touched)
                            for t in since)
            change = spark.createDataFrame(
                [(k, v, wts, "upsert") for k, v in kv.items()],
                "key string, val long, ts long, op string",
            )
            stale = (rv, M._read_manifest(spark, path, rv))
            monkeypatch.setattr(
                M, "current_manifest", lambda *a, _s=stale, **kw: _s
            )
            try:
                if expect_ok:
                    M.merge_into(spark, path, change, key_col="key",
                                 ts_col="ts", n_buckets=N_BUCKETS,
                                 keep_history=True)
                    committed_touched.append(touched)
                    model.update(kv)
                    if since:
                        n_rebase += 1
                else:
                    with pytest.raises(M.ConcurrentWriteConflictError):
                        M.merge_into(spark, path, change, key_col="key",
                                     ts_col="ts", n_buckets=N_BUCKETS,
                                     keep_history=True)
                    n_conflict += 1
            finally:
                monkeypatch.undo()
            spark.catalog.refreshByPath(path)
            assert _current_rows() == {(k, v) for k, v in model.items()}, (
                f"table diverged from the model after commit "
                f"v{len(committed_touched) - 1}"
            )
            v, _ = M.current_manifest(spark, path)
            assert v == len(committed_touched) - 1
        else:
            rv = len(committed_touched) - 1
            ks = rng.sample(keys, rng.randrange(1, 6))
            pending.append(
                (rv, {k: rng.randrange(1000, 9999) for k in ks}, ts)
            )
            ts += 1
    # the schedule must actually have exercised both arms
    assert n_rebase >= 2 and n_conflict >= 2, (n_rebase, n_conflict)
