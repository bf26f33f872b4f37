"""Manifest CHECKPOINT plane (operators/merge.py) — the r12 verdict's
top ask: appends were already O(1) in commit history via the `_latest`
hint, but describe_history, vacuum, and the hint-absent recovery
fallback still LISTED `_commits/`, which grows one JSON per commit
forever under safe defaults. Every CHECKPOINT_EVERY_DEFAULT commits
the publisher now snapshots commit metadata into an immutable
`_commits/_checkpoint.v<V>.json` (same atomic publish as the commits)
plus a mutable `_last_checkpoint` pointer, and those three consumers
resolve from ONE checkpoint read + the bounded commit tail — no
listing. Time travel is untouched (commit files stay the source of
truth). These tests pin:

  - the write cadence, pointer maintenance, and old-checkpoint GC;
  - listing-free describe_history / vacuum / recovery (asserted by
    making the listing primitive raise);
  - equality of the checkpointed history with the legacy listed one;
  - time-travel reads ACROSS a checkpoint boundary;
  - the crash windows: checkpoint write fails after a commit (commit
    survives, later publish retries), pointer missing/stale (fallback
    costs a listing, never a wrong answer);
  - vacuum advancing the retention floor BEFORE deleting commit files
    so history never over-reports.
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


@pytest.fixture
def no_listing(monkeypatch):
    """Arm AFTER building the table: any `_commits/` listing past this
    point is the regression this plane exists to remove."""
    def _arm():
        def _boom(spark, path):
            raise AssertionError(
                "_list_commit_versions called — the checkpoint plane "
                "must resolve without listing _commits/"
            )
        monkeypatch.setattr(M, "_list_commit_versions", _boom)
    return _arm


@pytest.mark.slow
def test_checkpoint_written_at_interval_and_gcd(spark, tmp_path, small_interval):
    path = str(tmp_path / "base")
    _mk_base(spark, path)                      # v0
    for c in range(1, 9):                      # v1..v8
        _merge_one(spark, path, c)
    names = _ckpt_names(path)
    # checkpoints at v4 and v8; at most current+previous retained
    assert names == [M._ckpt_file(4), M._ckpt_file(8)]
    ptr = json.load(open(os.path.join(path, "_commits", M._LAST_CKPT)))
    assert ptr == {"checkpoint_version": 8, "min_version": 0}
    for c in range(9, 13):                     # v9..v12 → ckpt v12, GC v4
        _merge_one(spark, path, c)
    assert _ckpt_names(path) == [M._ckpt_file(8), M._ckpt_file(12)]


def test_history_matches_legacy_and_is_listing_free(
    spark, tmp_path, small_interval, no_listing
):
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):                      # v1..v6; ckpt at v4
        _merge_one(spark, path, c)
    legacy = [
        (r.version, r.n_buckets, r.n_generations)
        for r in M.describe_history(spark, path).collect()
    ]
    no_listing()
    got = M.describe_history(spark, path).collect()
    assert [(r.version, r.n_buckets, r.n_generations) for r in got] == legacy
    assert [r.version for r in got] == list(range(7))
    assert all(r.committed_at is not None for r in got)


def test_current_version_recovery_without_hint_is_listing_free(
    spark, tmp_path, small_interval, no_listing
):
    """The hint-absent fallback (crash between publish and hint
    refresh) resolves via checkpoint + forward probe, no listing."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)
    os.remove(os.path.join(path, "_commits", M._LATEST))
    no_listing()
    assert M._current_version(spark, path) == 6


def test_vacuum_is_listing_free_and_advances_floor(
    spark, tmp_path, small_interval, no_listing
):
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):                      # v0..v6, ckpt v4
        _merge_one(spark, path, c)
    no_listing()
    M.vacuum(spark, path, keep_versions=2)
    assert _commit_names(path) == [M._commit_file(5), M._commit_file(6)]
    ptr = json.load(open(os.path.join(path, "_commits", M._LAST_CKPT)))
    assert ptr["min_version"] == 5
    # retained window still time-travels; reclaimed raises
    assert M.read_base(spark, path, version=5).count() == 8
    with pytest.raises(FileNotFoundError):
        M.read_base(spark, path, version=3)
    # history reflects the floor without listing
    assert [r.version for r in M.describe_history(spark, path).collect()] \
        == [5, 6]
    # and a second vacuum (checkpointed version itself now below the
    # floor) still resolves and is a no-op on commits
    M.vacuum(spark, path, keep_versions=2)
    assert _commit_names(path) == [M._commit_file(5), M._commit_file(6)]


def test_current_version_when_checkpointed_commit_vacuumed(
    spark, tmp_path, small_interval, no_listing
):
    """Retention can reclaim the checkpoint's own commit file; the
    recovery probe then starts from the pointer's floor."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)
    M.vacuum(spark, path, keep_versions=1)     # v4's file is gone
    os.remove(os.path.join(path, "_commits", M._LATEST))
    no_listing()
    assert M._current_version(spark, path) == 6


def test_time_travel_across_checkpoint_boundary(spark, tmp_path, small_interval):
    """version= reads below, at, and above the checkpointed version
    all resolve from commit files — the checkpoint changes nothing."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    states = {0: {r.key: r.val for r in M.read_base(spark, path).collect()}}
    for c in range(1, 7):
        _merge_one(spark, path, c)
        states[c] = {r.key: r.val for r in M.read_base(spark, path).collect()}
    for v in (3, 4, 5, 6):                     # straddles ckpt v4
        got = {r.key: r.val for r in
               M.read_base(spark, path, version=v).collect()}
        assert got == states[v], f"time travel to v{v} diverged"


def test_commit_survives_checkpoint_write_failure(
    spark, tmp_path, small_interval, monkeypatch
):
    """Crash/failure between the commit and its checkpoint: the commit
    is already durable; the checkpoint is deferred to a later publish
    (here: the next interval)."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 4):
        _merge_one(spark, path, c)

    real = M._write_checkpoint

    def _fail(spark_, path_, version_):
        raise RuntimeError("injected checkpoint crash")

    monkeypatch.setattr(M, "_write_checkpoint", _fail)
    _merge_one(spark, path, 4)                 # v4: ckpt fails, commit lands
    assert _ckpt_names(path) == []
    assert M._current_version(spark, path) == 4
    assert M.read_base(spark, path).count() == 8
    monkeypatch.setattr(M, "_write_checkpoint", real)
    for c in range(5, 9):
        _merge_one(spark, path, c)             # v8 checkpoint succeeds
    assert _ckpt_names(path) == [M._ckpt_file(8)]
    # and the v8 checkpoint's bootstrap covered the missed window
    ck = M._read_checkpoint(spark, path)
    assert [r[0] for r in ck["history"]] == list(range(9))


def test_missing_pointer_falls_back_without_wrong_answers(
    spark, tmp_path, small_interval
):
    """Crash between checkpoint-file publish and pointer refresh (or a
    deleted pointer): consumers pay a listing, never read wrong."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 6):
        _merge_one(spark, path, c)
    os.remove(os.path.join(path, "_commits", M._LAST_CKPT))
    assert M._read_checkpoint(spark, path) is None
    assert M._current_version(spark, path) == 5
    assert [r.version for r in M.describe_history(spark, path).collect()] \
        == list(range(6))
    M.vacuum(spark, path, keep_versions=2)
    assert _commit_names(path) == [M._commit_file(4), M._commit_file(5)]
    # the next interval re-publishes a checkpoint and a fresh pointer
    for c in range(6, 9):
        _merge_one(spark, path, c)
    ptr = json.load(open(os.path.join(path, "_commits", M._LAST_CKPT)))
    assert ptr["checkpoint_version"] == 8


def test_checkpoint_referenced_pruned_to_existing_dirs(
    spark, tmp_path, small_interval
):
    """The referenced-generation set stays O(live generations):
    lazily-deleted (keep_history=False) gens drop out at build."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 5):
        _merge_one(spark, path, c, keep_history=False)
    ck = M._read_checkpoint(spark, path)
    existing = {n.split("=", 1)[1] for n in os.listdir(path)
                if n.startswith("gen=")}
    assert set(ck["referenced"]) <= existing
    # stage-grace vacuum classifies via the checkpoint set: a young
    # never-referenced dir survives, everything reclaimed is gone
    gen_dir = os.path.join(path, "gen=staged-test", "_kb=0")
    os.makedirs(gen_dir)
    M._stage_rename_json(
        spark, f"{path}/gen=staged-test/{M._STAGED_MARKER}",
        {"staged_at_ms": __import__("time").time() * 1000, "gen": "staged-test"},
    )
    M.vacuum(spark, path, keep_versions=1, stage_grace_ms=600_000)
    assert os.path.isdir(gen_dir), "in-flight staging lost grace protection"


def test_vacuum_with_widened_retention_after_narrow_vacuum(
    spark, tmp_path, small_interval
):
    """A vacuum with keep=2 followed by one with keep=10: the wider
    window's kept set must clamp to versions that still exist (the
    pointer-advanced floor), not pull already-deleted versions in from
    the checkpoint file's lower delete-retry floor and abort."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 7):
        _merge_one(spark, path, c)
    M.vacuum(spark, path, keep_versions=2)    # floor -> 5
    _merge_one(spark, path, 7)                # v7
    M.vacuum(spark, path, keep_versions=10)   # wider than what exists
    assert _commit_names(path) == [
        M._commit_file(v) for v in (5, 6, 7)
    ]
    assert M.read_base(spark, path, version=5).count() == 8


def test_checkpoint_under_conditional_put_backend(
    spark, tmp_path, small_interval
):
    """Checkpoint files publish through the same pluggable backend as
    the commits: with conditional-put FORCED (the S3/RGW protocol) the
    whole plane — immutable checkpoint, mutable pointer, vacuum floor
    update — works rename-free end-to-end."""
    from python_vectordbapp_ceph_spark.operators import publish as P

    P.force_publish_backend("conditional-put")
    P._BACKEND_CACHE.clear()
    try:
        path = str(tmp_path / "base")
        _mk_base(spark, path)
        for c in range(1, 6):
            _merge_one(spark, path, c)
        assert _ckpt_names(path) == [M._ckpt_file(4)]
        ck = M._read_checkpoint(spark, path)
        assert [r[0] for r in ck["history"]] == list(range(5))
        M.vacuum(spark, path, keep_versions=2)
        assert _commit_names(path) == [M._commit_file(4), M._commit_file(5)]
        assert M._current_version(spark, path) == 5
    finally:
        P.force_publish_backend(None)
        P._BACKEND_CACHE.clear()


def test_legacy_table_without_checkpoint_unaffected(spark, tmp_path, monkeypatch):
    """Interval larger than the commit count → no checkpoint anywhere;
    every consumer takes the legacy listing path."""
    monkeypatch.setattr(M, "CHECKPOINT_EVERY_DEFAULT", 1000)
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    for c in range(1, 4):
        _merge_one(spark, path, c)
    assert _ckpt_names(path) == []
    assert M._current_version(spark, path) == 3
    assert [r.version for r in M.describe_history(spark, path).collect()] \
        == [0, 1, 2, 3]
    M.vacuum(spark, path, keep_versions=1)
    assert _commit_names(path) == [M._commit_file(3)]


@pytest.mark.slow
def test_checkpoint_plane_model_random_interleavings(
    spark, tmp_path, small_interval, monkeypatch
):
    """Model-based soak over the whole plane: a seeded random sequence
    of merges, retention vacuums, crash injections (pointer deleted,
    checkpoint write suppressed, hint deleted), and interval changes —
    after EVERY op, the three consumers must agree with filesystem
    ground truth (the surviving v*.json files):

      - _current_version == the highest existing commit,
      - describe_history ⊆ existing commits and ⊇ the window every
        retained-version read must serve (no phantom versions; gaps
        only UNDER-report doomed sub-floor commits, per the vacuum
        pointer-first contract),
      - read_base(version=v) works for every version history reports.
    """
    import random

    rng = random.Random(1307)
    path = str(tmp_path / "base")
    _mk_base(spark, path)
    c = 0

    def ground_truth():
        return sorted(
            int(n[1:-5]) for n in _commit_names(path)
        )

    for step in range(24):
        op = rng.choice(
            ["merge", "merge", "merge", "vacuum", "crash_ptr",
             "crash_ckpt", "crash_hint"]
        )
        if op == "merge":
            c += 1
            _merge_one(spark, path, c)
        elif op == "vacuum":
            M.vacuum(spark, path, keep_versions=rng.choice([1, 2, 5]))
        elif op == "crash_ptr":
            try:
                os.remove(os.path.join(path, "_commits", M._LAST_CKPT))
            except FileNotFoundError:
                pass
        elif op == "crash_ckpt":
            # the next checkpoint-eligible publish fails its snapshot
            real = M._write_checkpoint
            monkeypatch.setattr(
                M, "_write_checkpoint",
                lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
            )
            c += 1
            _merge_one(spark, path, c)
            monkeypatch.setattr(M, "_write_checkpoint", real)
        elif op == "crash_hint":
            try:
                os.remove(os.path.join(path, "_commits", M._LATEST))
            except FileNotFoundError:
                pass

        existing = ground_truth()
        assert M._current_version(spark, path) == existing[-1], \
            f"step {step} ({op}): current_version diverged"
        hist = [r.version for r in M.describe_history(spark, path).collect()]
        assert set(hist) <= set(existing), \
            f"step {step} ({op}): history reports deleted versions {hist}"
        # every reported version must actually serve a snapshot read
        for v in hist[-3:]:
            assert M.read_base(spark, path, version=v).count() >= 1
        # the newest version must always be reported
        assert existing[-1] in hist, f"step {step} ({op}): newest missing"


def test_describe_checkpoint_health_report(spark, tmp_path, small_interval):
    """describe_checkpoint mirrors describe_history for the metadata
    plane: pre-checkpoint tables report has_checkpoint=false; after
    the interval, version/floors/tail/referenced counts line up with
    the on-disk state, and vacuum's floor advance is visible."""
    path = str(tmp_path / "base")
    _mk_base(spark, path)                      # v0
    for c in range(1, 3):                      # v1, v2 — no ckpt yet
        _merge_one(spark, path, c)
    r = M.describe_checkpoint(spark, path).collect()[0]
    assert r.has_checkpoint is False
    assert r.current_version == 2 and r.n_checkpoint_files == 0

    for c in range(3, 7):                      # v3..v6 → ckpt at v4
        _merge_one(spark, path, c)
    r = M.describe_checkpoint(spark, path).collect()[0]
    assert r.has_checkpoint is True
    assert r.checkpoint_version == 4 and r.current_version == 6
    assert r.tail_length == 2
    assert r.live_min_version == 0 and r.file_min_version == 0
    assert r.n_history_rows == 5               # v0..v4
    assert r.n_referenced_generations >= 1
    assert r.n_checkpoint_files == 1

    M.vacuum(spark, path, keep_versions=2)     # pointer floor → 5
    r = M.describe_checkpoint(spark, path).collect()[0]
    assert r.live_min_version == 5
    assert r.file_min_version == 0, (
        "the delete-retry floor stays at the checkpoint FILE's value "
        "until the next checkpoint confirms the range clear"
    )
    for c in range(7, 9):                      # v7, v8 → ckpt at v8
        _merge_one(spark, path, c)
    r = M.describe_checkpoint(spark, path).collect()[0]
    assert r.checkpoint_version == 8 and r.tail_length == 0
    assert r.live_min_version == 5
    assert r.file_min_version == 5, (
        "the next checkpoint self-heals the file floor past the "
        "confirmed-deleted range"
    )
