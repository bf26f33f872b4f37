"""Regression pins for the round-13 ADVICE items (all in the manifest
checkpoint/vacuum plane, operators/merge.py):

  1. `_write_checkpoint` must not treat a TRANSIENT commit-read error
     as "vacuumed": it re-probes existence, retries the read once, and
     if the file still exists but stays unreadable it ABORTS the
     checkpoint (deferring to a later publish) instead of permanently
     dropping a live version from the carried-forward history.
  2. `vacuum`'s kept-window guarantee depends on the `_last_checkpoint`
     floor advance landing BEFORE commit files are deleted; a failed
     pointer write must now SKIP the commit-file deletion loop (the
     next pass retries) instead of deleting under a stale floor.
  3. A checkpoint written after a CRASHED vacuum (pointer advanced,
     deletes incomplete) must carry forward the previous checkpoint's
     own file floor — not the pointer-maxed min — so the leftover
     commit files below the pointer stay inside every later vacuum's
     delete-retry range; the carried floor self-heals past versions
     whose files are confirmed gone.
"""

from __future__ import annotations

import json
import os

import pytest

from python_vectordbapp_ceph_spark.operators import merge as M


def _mk_base(spark, path, n=8):
    df = spark.createDataFrame(
        [(f"k{i}", i * 10, 0) for i in range(n)],
        "key string, val long, ts long",
    )
    M.write_bucketed_base(df, path, "key", n_buckets=4)


def _merge_one(spark, path, c, keep_history=True):
    ch = spark.createDataFrame(
        [(f"k{c % 8}", c * 100, c, "upsert")],
        "key string, val long, ts long, op string",
    )
    M.merge_into(spark, path, ch, key_col="key", ts_col="ts",
                 n_buckets=4, keep_history=keep_history)


def _commit_names(path):
    cdir = os.path.join(path, "_commits")
    return sorted(
        n for n in os.listdir(cdir)
        if n.startswith("v") and n.endswith(".json")
    )


def _ckpt_names(path):
    cdir = os.path.join(path, "_commits")
    return sorted(n for n in os.listdir(cdir) if n.startswith("_checkpoint."))


@pytest.fixture
def small_interval(monkeypatch):
    monkeypatch.setattr(M, "CHECKPOINT_EVERY_DEFAULT", 4)
    return 4


def _flaky_checkpoint(monkeypatch, fail_version, times):
    """Wrap _write_checkpoint so that, INSIDE it only, reads of commit
    ``fail_version`` fail ``times`` times (the transient-store shape)
    while the file stays on disk. Returns the fire counter."""
    real_ckpt = M._write_checkpoint
    real_read = M._read_json
    fired = {"n": 0}

    def flaky_read(spark, p):
        if p.endswith(M._commit_file(fail_version)) and fired["n"] < times:
            fired["n"] += 1
            raise RuntimeError("injected transient read failure")
        return real_read(spark, p)

    def ckpt(spark, p, v):
        monkeypatch.setattr(M, "_read_json", flaky_read)
        try:
            return real_ckpt(spark, p, v)
        finally:
            monkeypatch.setattr(M, "_read_json", real_read)

    monkeypatch.setattr(M, "_write_checkpoint", ckpt)
    return fired


def test_transient_commit_read_is_retried_not_skipped(
    spark, tmp_path, small_interval, monkeypatch
):
    """ADVICE #1a: one transient failure on a LIVE commit's read during
    a checkpoint is retried (the file still exists) and the version
    stays in the checkpointed history."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)                       # v0
    for c in range(1, 7):                       # v1..v6; ckpt at v4
        _merge_one(spark, path, c)
    fired = _flaky_checkpoint(monkeypatch, fail_version=6, times=1)
    for c in range(7, 9):                       # v7, v8 → ckpt at v8
        _merge_one(spark, path, c)
    assert fired["n"] == 1, "the injected failure must have fired"
    ck = M._read_checkpoint(spark, path)
    assert int(ck["version"]) == 8
    assert 6 in {int(r[0]) for r in ck["history"]}, (
        "v6 dropped from checkpoint history on a transient read error"
    )


def test_persistent_commit_read_aborts_checkpoint_not_history(
    spark, tmp_path, small_interval, monkeypatch
):
    """ADVICE #1b: a commit that exists but stays unreadable ABORTS the
    checkpoint (no _checkpoint.v8 published; the commit itself is
    durable) and a later, healthy checkpoint covers the version —
    nothing is permanently dropped."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)
    _flaky_checkpoint(monkeypatch, fail_version=6, times=10_000)
    for c in range(7, 9):                       # ckpt attempt at v8 aborts
        _merge_one(spark, path, c)
    assert M._ckpt_file(8) not in _ckpt_names(path)
    assert M._commit_file(8) in _commit_names(path), "commit must survive"
    monkeypatch.undo()  # store healthy again (also undid the interval)
    monkeypatch.setattr(M, "CHECKPOINT_EVERY_DEFAULT", 4)
    for c in range(9, 13):                      # v9..v12 → healthy ckpt v12
        _merge_one(spark, path, c)
    ck = M._read_checkpoint(spark, path)
    assert int(ck["version"]) == 12
    assert {int(r[0]) for r in ck["history"]} == set(range(13)), (
        "the deferred checkpoint must cover every version incl. v6"
    )


def test_vacuum_skips_commit_deletes_when_floor_advance_fails(
    spark, tmp_path, small_interval, monkeypatch
):
    """ADVICE #2: pointer write fails → vacuum still reclaims data dirs
    (safe regardless of the floor) but leaves every commit file for the
    next pass; a healthy later vacuum finishes the reclamation."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)              # ckpt at v4
    before = _commit_names(path)
    monkeypatch.setattr(M, "_write_ckpt_pointer", lambda *a, **k: False)
    removed = M.vacuum(spark, path, keep_versions=1)
    assert removed > 0, "data-dir reclamation is independent of the floor"
    assert _commit_names(path) == before, (
        "commit files deleted under a floor advance that never landed"
    )
    monkeypatch.undo()
    M.vacuum(spark, path, keep_versions=1)
    assert _commit_names(path) == [M._commit_file(6)]
    # the surviving state still reads
    assert M.read_base(spark, path).count() == 8


def test_checkpoint_carries_file_floor_past_crashed_vacuum(
    spark, tmp_path, small_interval
):
    """ADVICE #3: pointer advanced to 5 (crashed vacuum) with commit
    files v0..v6 still on disk → the NEXT checkpoint's own min_version
    stays at the carried file floor (0), keeping the leftovers in the
    delete-retry range; a later real vacuum reclaims them."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)              # ckpt at v4 (floor 0)
    # crashed vacuum: floor advance landed, deletes never ran
    assert M._write_ckpt_pointer(spark, path, 4, 5)
    for c in range(7, 9):
        _merge_one(spark, path, c)              # ckpt at v8
    raw = json.load(open(os.path.join(path, "_commits", M._ckpt_file(8))))
    assert int(raw["min_version"]) == 0, (
        "checkpoint must carry the previous FILE floor forward, not the "
        "pointer-maxed min — otherwise v0..v4's leftover commit files "
        "fall below every later vacuum's retry range forever"
    )
    # consumers still see the pointer-maxed live floor
    ck = M._read_checkpoint(spark, path)
    assert int(ck["min_version"]) == 5 and int(ck["file_min_version"]) == 0
    # a real vacuum now retries the leftover range and reclaims it
    M.vacuum(spark, path, keep_versions=1)
    assert _commit_names(path) == [M._commit_file(8)]


def test_checkpoint_file_floor_self_heals_when_range_is_clear(
    spark, tmp_path, small_interval
):
    """ADVICE #3 (self-heal): once the crashed range's commit files are
    confirmed absent, the carried floor advances to the live floor
    instead of staying pinned low forever."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)              # ckpt at v4
    assert M._write_ckpt_pointer(spark, path, 4, 5)
    # complete the "crashed" vacuum's deletes by hand: v0..v4 gone
    for v in range(5):
        os.remove(os.path.join(path, "_commits", M._commit_file(v)))
    for c in range(7, 9):
        _merge_one(spark, path, c)              # ckpt at v8
    raw = json.load(open(os.path.join(path, "_commits", M._ckpt_file(8))))
    assert int(raw["min_version"]) == 5, (
        "a confirmed-clear range must advance the carried file floor"
    )
    rows = M.describe_history(spark, path).collect()
    assert [r.version for r in rows] == [5, 6, 7, 8]


def test_ckpt_pointer_write_never_regresses_floor_or_version(
    spark, tmp_path, small_interval
):
    """Self-review pin: with optimistic commits running LEASE-FREE, a
    committing writer's checkpoint pointer refresh races a leased
    vacuum's floor advance. The pointer write must merge-max against
    the current pointer so a blind overwrite cannot regress either the
    floor (un-guaranteeing vacuum's kept window) or the checkpoint
    version (pointing readers at an older snapshot)."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 6):
        _merge_one(spark, path, c)              # ckpt at v4
    # a "concurrent vacuum" advanced the floor past what this writer
    # knows; the writer then refreshes the pointer with its stale view
    assert M._write_ckpt_pointer(spark, path, 4, 3)
    assert M._write_ckpt_pointer(spark, path, 4, 0)   # stale floor
    ptr = json.load(open(os.path.join(path, "_commits", "_last_checkpoint")))
    assert int(ptr["min_version"]) == 3, "stale floor must not regress"
    # same for the checkpoint version
    assert M._write_ckpt_pointer(spark, path, 2, 3)   # stale version
    ptr = json.load(open(os.path.join(path, "_commits", "_last_checkpoint")))
    assert int(ptr["checkpoint_version"]) == 4


def test_commit_optimistic_rejects_survivors_outside_touched(spark, tmp_path):
    """Self-review pin: a survivor bucket OUTSIDE the declared touched
    set would silently overwrite a live bucket the conflict check never
    protected — commit_optimistic must refuse loudly."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    with pytest.raises(ValueError, match="subset of touched"):
        M.commit_optimistic(
            spark, path, read_version=0, touched={1},
            gen="deadbeef", survivors={1, 2},
        )
