"""operators/lease.py — the ledger's single-writer lease.

The one unsafe composition in the commit protocol is a second writer
racing an armed compaction/vacuum pass: vacuum reclaims any staged
generation no retained manifest references, and a concurrent writer's
not-yet-published staging looks exactly like crash debris. These tests
pin the enforcement the r10 verdict asked for: two concurrent
appenders → one wins, the loser RAISES (never corrupts), ledger
content exact; plus the stale-lease takeover, heartbeat-loss, and
vacuum stage-grace behaviors.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.lease import (
    LEASE_FILE,
    LedgerLockedError,
    acquire_writer_lease,
)
from python_vectordbapp_ceph_spark.operators.merge import vacuum
from python_vectordbapp_ceph_spark.operators.shards import (
    append_segment,
    read_ledger,
)
from python_vectordbapp_ceph_spark.streaming.shard_ingest import stream_append

BUDGET = 500


def _docs(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100)) + 1).alias("n_tokens"),
    )


def _stream(spark, src):
    return spark.readStream.schema("doc_id long, n_tokens long").parquet(src)


def _lease_file(path):
    return os.path.join(path, "_commits", LEASE_FILE)


def _wait_released(path, timeout=15.0):
    """The release runs on a daemon thread right after termination —
    poll briefly instead of assuming it beat us here."""
    deadline = time.time() + timeout
    while os.path.exists(_lease_file(path)):
        if time.time() > deadline:
            raise AssertionError("lease not released after termination")
        time.sleep(0.1)


@pytest.mark.slow
def test_two_concurrent_appenders_one_wins_loser_raises(spark, tmp_path):
    """The r10 verdict's done-criterion: writer A streams into the
    ledger; writer B against the same path raises at start (fail-fast,
    no write, no reclaim); after A finishes, B succeeds and the ledger
    holds exactly both batches' docs in one coherent token sequence."""
    led = str(tmp_path / "led")
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    docs_a, docs_b = _docs(spark, 0, 120), _docs(spark, 5000, 80)
    docs_a.coalesce(1).write.parquet(src_a)
    docs_b.coalesce(1).write.parquet(src_b)

    qa = stream_append(
        _stream(spark, src_a), led, str(tmp_path / "ckpt_a"), BUDGET,
        vacuum_keep=2,
    )
    # A acquired synchronously before start ⇒ B must fail fast while
    # A's drain is still in flight (timeout 0: no grace poll)
    with pytest.raises(LedgerLockedError, match="live writer"):
        stream_append(
            _stream(spark, src_b), led, str(tmp_path / "ckpt_b"), BUDGET,
            vacuum_keep=2, lease_timeout_ms=0,
        )
    assert qa.awaitTermination(120)
    _wait_released(led)

    qb = stream_append(
        _stream(spark, src_b), led, str(tmp_path / "ckpt_b2"), BUDGET,
        vacuum_keep=2,
    )
    assert qb.awaitTermination(120)
    _wait_released(led)

    spark.catalog.refreshByPath(led)
    rows = read_ledger(spark, led).collect()
    want = {(r.doc_id, r.n_tokens) for r in docs_a.collect()} | {
        (r.doc_id, r.n_tokens) for r in docs_b.collect()
    }
    assert {(r.doc_id, r.n_tokens) for r in rows} == want
    prev = 0
    for r in sorted(rows, key=lambda r: r.cum):
        assert r.cum == prev + r.n_tokens, "token sequence broken"
        prev = r.cum


def test_stale_lease_is_broken_and_reacquired(spark, tmp_path):
    """A holder that died without release blocks only until its TTL;
    then the next writer breaks the lease and proceeds."""
    led = str(tmp_path / "led")
    append_segment(spark, led, _docs(spark, 0, 50), BUDGET)
    os.makedirs(os.path.join(led, "_commits"), exist_ok=True)
    now_ms = int(time.time() * 1000)
    with open(_lease_file(led), "w") as f:
        json.dump({"owner": "dead-writer", "acquired_ms": now_ms - 10_000,
                   "heartbeat_ms": now_ms - 10_000, "ttl_ms": 1_000}, f)
    lease = acquire_writer_lease(spark, led, timeout_ms=0)
    try:
        assert lease.owner != "dead-writer"
        cur = json.load(open(_lease_file(led)))
        assert cur["owner"] == lease.owner
    finally:
        lease.release()
    assert not os.path.exists(_lease_file(led))


def test_fresh_lease_fails_fast_and_steal_overrides(spark, tmp_path):
    led = str(tmp_path / "led")
    holder = acquire_writer_lease(spark, led)
    with pytest.raises(LedgerLockedError, match="live writer"):
        acquire_writer_lease(spark, led, timeout_ms=0)
    # explicit takeover (operator knows the holder is dead)
    thief = acquire_writer_lease(spark, led, timeout_ms=0, steal=True)
    # the displaced holder's next heartbeat must raise, not republish
    with pytest.raises(LedgerLockedError, match="lost"):
        holder.heartbeat()
    # and its release must not delete the thief's lease
    holder.release()
    cur = json.load(open(_lease_file(led)))
    assert cur["owner"] == thief.owner
    thief.release()


def test_lease_stolen_mid_stream_fails_batch_not_ledger(spark, tmp_path):
    """A writer whose lease was taken must fail its next micro-batch
    (heartbeat raises inside foreachBatch → the query errors) while
    the ledger stays exactly at its last committed state."""
    led = str(tmp_path / "led")
    src = str(tmp_path / "src")
    _docs(spark, 0, 60).coalesce(1).write.parquet(src)
    q = stream_append(_stream(spark, src), led, str(tmp_path / "ckpt"),
                      BUDGET)
    assert q.awaitTermination(120)
    _wait_released(led)
    spark.catalog.refreshByPath(led)
    committed = {(r.doc_id, r.n_tokens) for r in read_ledger(spark, led).collect()}

    # a rogue second writer holds the lease when the stream restarts
    rogue = acquire_writer_lease(spark, led)
    _docs(spark, 1000, 40).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(LedgerLockedError):
        stream_append(_stream(spark, src), led, str(tmp_path / "ckpt"),
                      BUDGET, lease_timeout_ms=0)
    # steal-restart: the checkpointed stream takes the lease back and
    # the rogue's in-memory handle can no longer heartbeat
    q2 = stream_append(_stream(spark, src), led, str(tmp_path / "ckpt"),
                       BUDGET, lease_timeout_ms=0, steal_lease=True)
    assert q2.awaitTermination(120)
    with pytest.raises(LedgerLockedError):
        rogue.heartbeat()
    spark.catalog.refreshByPath(led)
    now = {(r.doc_id, r.n_tokens) for r in read_ledger(spark, led).collect()}
    assert committed < now and len(now) == len(committed) + 40


def test_vacuum_stage_grace_protects_young_uncommitted_staging(
    spark, tmp_path
):
    """vacuum(stage_grace_ms=N): a staged generation NO commit ever
    referenced survives while young (it may be a live writer's
    in-flight staging), is reclaimed once older than the grace — and
    committed-then-superseded generations reclaim regardless of age,
    so retention bounds are unaffected."""
    led = str(tmp_path / "led")
    append_segment(spark, led, _docs(spark, 0, 50), BUDGET)
    append_segment(spark, led, _docs(spark, 100, 50), BUDGET)

    staged = os.path.join(led, "gen=99-deadbeef", "_kb=99")
    os.makedirs(staged)
    _docs(spark, 900, 5).coalesce(1).write.mode("overwrite").parquet(staged)

    # graced pass: the young never-committed stage survives
    removed = vacuum(spark, led, keep_versions=1,
                     stage_grace_ms=10 * 60 * 1000)
    assert os.path.exists(staged), "in-flight staging was reclaimed"

    assert removed == 0  # both committed gens are live in v1
    live_gens = {n for n in os.listdir(led) if n.startswith("gen=")}
    assert "gen=99-deadbeef" in live_gens
    # both committed generations stay (each holds a live segment),
    # plus the graced stage
    assert len(live_gens) == 3

    # age out the stage and vacuum again with the same grace: reclaimed
    old = (time.time() - 3600, time.time() - 3600)
    os.utime(os.path.join(led, "gen=99-deadbeef"), old)
    vacuum(spark, led, keep_versions=1, stage_grace_ms=10 * 60 * 1000)
    assert not os.path.exists(staged), "aged orphan must be reclaimed"

    # default grace=0 is the historical reclaim-now behavior
    staged2 = os.path.join(led, "gen=98-cafef00d", "_kb=98")
    os.makedirs(staged2)
    _docs(spark, 950, 5).coalesce(1).write.mode("overwrite").parquet(staged2)
    vacuum(spark, led, keep_versions=1)
    assert not os.path.exists(staged2)

    # ledger reads are untouched throughout
    assert read_ledger(spark, led).count() == 100


def _vecs(spark, lo, n, dim=8):
    return spark.createDataFrame(
        [(i, [float((i * 7 + j * 13) % 31) for j in range(dim)])
         for i in range(lo, lo + n)],
        "vec_id long, embedding array<float>",
    )


@pytest.mark.slow
def test_ivf_rebuild_and_stream_share_one_lease(spark, tmp_path):
    """The IVF maintenance surface has the ledger's hazard in reverse:
    an append racing rebuild's two-rename swap vanishes with the
    ``._old`` directory. Rebuild and the maintenance stream take the
    SAME sibling lease, so the race fails fast on either side."""
    from python_vectordbapp_ceph_spark.operators.ivf import (
        build_ivf,
        ivf_lease_path,
        load_ivf,
        rebuild_saved_ivf,
        save_ivf,
    )
    from python_vectordbapp_ceph_spark.streaming.ivf_ingest import (
        stream_into_ivf,
    )

    root = str(tmp_path / "ivf")
    save_ivf(build_ivf(_vecs(spark, 0, 120), nlist=4), root)
    assigned = f"{root}/assigned"

    # a held lease (stand-in for a live maintenance stream) blocks the
    # rebuild fail-fast, layout untouched
    holder = acquire_writer_lease(
        spark, assigned, lease_path=ivf_lease_path(assigned)
    )
    with pytest.raises(LedgerLockedError):
        rebuild_saved_ivf(spark, root, lease_timeout_ms=0)
    assert load_ivf(spark, root).assigned.count() == 120
    holder.release()

    # a REAL maintenance stream holds it; rebuild fails while draining,
    # succeeds after termination, and sees the streamed adds
    src = str(tmp_path / "src")
    _vecs(spark, 1000, 60).coalesce(2).write.parquet(src)
    q = stream_into_ivf(
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1).parquet(src),
        load_ivf(spark, root),
        assigned,
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(LedgerLockedError):
        rebuild_saved_ivf(spark, root, lease_timeout_ms=0)
    assert q.awaitTermination(120)
    deadline = time.time() + 15
    while os.path.exists(ivf_lease_path(assigned)):
        assert time.time() < deadline, "IVF lease not released"
        time.sleep(0.1)
    spark.catalog.refreshByPath(assigned)
    rebuilt = rebuild_saved_ivf(spark, root)
    assert rebuilt.assigned.count() == 180
    # and the lease is free again after the rebuild's finally-release
    acquire_writer_lease(
        spark, assigned, lease_path=ivf_lease_path(assigned), timeout_ms=0
    ).release()


def test_auto_heartbeat_keeps_idle_lease_fresh(spark, tmp_path):
    """A holder whose work doesn't tick (continuous stream with an
    idle source, a long refit) must not present as 'expired': the
    auto-heartbeat thread keeps the lease fresh past several TTLs, a
    would-be taker still fails fast, and release() stops the thread
    and frees the slot."""
    led = str(tmp_path / "led")
    holder = acquire_writer_lease(spark, led, ttl_ms=1500)
    holder.start_auto_heartbeat(interval_s=0.4)
    time.sleep(3.5)  # > 2 TTLs of idleness
    with pytest.raises(LedgerLockedError, match="live writer"):
        acquire_writer_lease(spark, led, timeout_ms=0)
    assert not holder.lost
    holder.release()
    time.sleep(0.6)  # a straggling heartbeat tick must not resurrect it
    assert not os.path.exists(_lease_file(led))
    acquire_writer_lease(spark, led, timeout_ms=0).release()


@pytest.mark.slow
def test_continuous_stream_survives_idle_gap(spark, tmp_path):
    """available_now=False (the 24/7 mode — previously untested): the
    source goes idle LONGER than the lease TTL, the auto-heartbeat
    keeps the lease fresh (a taker still fails fast), late-arriving
    data still packs without a spurious LedgerLockedError, and stop()
    releases the lease."""
    src = str(tmp_path / "src")
    led = str(tmp_path / "led")
    _docs(spark, 0, 40).coalesce(1).write.parquet(src)
    q = stream_append(
        _stream(spark, src), led, str(tmp_path / "ckpt"), BUDGET,
        available_now=False, lease_ttl_ms=2000,
    )
    try:
        deadline = time.time() + 60
        while True:
            try:
                spark.catalog.refreshByPath(led)
                if read_ledger(spark, led).count() == 40:
                    break
            except Exception:
                pass
            assert time.time() < deadline, "first batch never committed"
            time.sleep(0.5)

        time.sleep(3.0)  # idle gap > TTL: only the auto-heartbeat ticks
        with pytest.raises(LedgerLockedError, match="live writer"):
            acquire_writer_lease(spark, led, timeout_ms=0)

        _docs(spark, 1000, 25).coalesce(1).write.mode("append").parquet(src)
        deadline = time.time() + 60
        while True:
            spark.catalog.refreshByPath(led)
            if read_ledger(spark, led).count() == 65:
                break
            assert time.time() < deadline, (
                "post-idle batch never committed — heartbeat must not "
                "have spuriously failed the stream"
            )
            time.sleep(0.5)
        assert q.isActive and q.exception() is None
    finally:
        q.stop()
    _wait_released(led)
    acquire_writer_lease(spark, led, timeout_ms=0).release()


def test_collection_mutations_respect_writer_lease(spark, tmp_path):
    """The collection's change log is the third swap-guarded surface:
    compact()'s two-rename replaces the log directory, so appends hold
    the sibling lease briefly and compact holds it across the swap —
    a foreign holder makes both fail fast, and everything works again
    once released."""
    from python_vectordbapp_ceph_spark.collection import VectorCollection

    c = VectorCollection(
        spark=spark, path=str(tmp_path / "col"), dim=4, name="t"
    ).ensure_exists()
    c.lease_timeout_ms = 0

    def rows(*keys):
        return spark.createDataFrame(
            [(k, [1.0, 0.0, 0.0, 0.0], {"x": "1"}) for k in keys],
            "key string, embedding array<float>, tags map<string,string>",
        )

    c.upsert(rows("k1", "k2"))
    assert not os.path.exists(c.path + "._lease"), "append must release"

    holder = acquire_writer_lease(
        spark, c.path, lease_path=c.path + "._lease"
    )
    with pytest.raises(LedgerLockedError):
        c.upsert(rows("k3"))
    with pytest.raises(LedgerLockedError):
        c.compact()
    holder.release()

    c.upsert(rows("k3"))
    c.delete_keys(["k1"])
    c.compact()
    assert {r.key for r in c.snapshot().collect()} == {"k2", "k3"}
    assert not os.path.exists(c.path + "._lease")


def test_sidecar_union_warning_fires_when_unbounded(
    spark, tmp_path, monkeypatch, caplog
):
    """An unarmed stream's growing sidecar union warns loudly instead
    of degrading silently (threshold lowered to make 2 containers
    'big')."""
    import logging

    import python_vectordbapp_ceph_spark.operators.shards as sh

    led = str(tmp_path / "led")
    append_segment(spark, led, _docs(spark, 0, 50), BUDGET)
    append_segment(spark, led, _docs(spark, 100, 50), BUDGET)
    monkeypatch.setattr(sh, "SIDECAR_UNION_WARN_BYTES", 1)
    with caplog.at_level(logging.WARNING,
                         logger="python_vectordbapp_ceph_spark.operators.shards"):
        # probe range overlaps BOTH containers (the zonemap must not
        # prune them, or there is nothing to warn about)
        sh.dedup_against_ledger(spark, led, _docs(spark, 40, 80)).count()
    assert any("arm compaction" in r.message for r in caplog.records)
