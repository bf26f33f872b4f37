"""Streaming shard packing: continuously extend the incremental shard
ledger (operators/shards.py) as new documents arrive.

Each micro-batch becomes ONE manifest-committed ledger segment via
`foreachBatch` — the same exactly-once discipline as the ingest and
IVF-maintenance streams: the segment's parquet stage is invisible
until its manifest rename publishes, so a crashed batch leaves an
unreferenced orphan (vacuum() reclaims) and the restart replays the
batch into a fresh uniquely-named generation. Combined with the
checkpointed source offsets, a document is never packed twice into a
VISIBLE segment.

The batch/stream equivalence is structural, not approximate: a stream
drained through N micro-batches produces byte-for-byte the ledger of
N `append_segment` calls with the same batches (pytest-pinned with a
single-batch drain, where the equality is exact by construction).
Packing continuity is the ledger's own contract — each append resumes
from the last committed token offset, so shard boundaries are
identical whether docs arrived in one batch or twenty.

At scale this is the "corpus refresh lands nightly" loop: the stream
tails the curated-docs table, each trigger packs only the new slice
(bounded by the batch, never the history), and the training loader
polls `shard_manifest` for fresh shard ids.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..cache import cache_scope, release_caches
from ..operators.lease import (
    LEASE_TTL_MS,
    acquire_writer_lease,
    release_on_termination,
)
from ..operators.merge import vacuum
from ..operators.shards import (
    SHARD_BUDGET_DEFAULT,
    append_segment,
    compact,
    last_batch_tag,
)

_log = logging.getLogger(__name__)

# stream_append's default compaction bound: 64 live containers keeps
# every per-container cost a stream pays each batch — the sidecar-m
# probe, the bloom-union broadcast, the compaction size summaries, the
# manifest dict itself — metadata-sized at ANY stream lifetime, while
# staying far above the handful of containers a steady-state LSM
# tiering actually holds. Unbounded (None) is an explicit opt-out, not
# the default a year-long stream discovers the hard way (r10 verdict:
# the probe broadcast at bloom.py grows with container count).
MAX_SEGMENTS_DEFAULT = 64

# grace for vacuum while streaming: staged generations younger than
# this that NO commit has ever referenced are left alone — they may be
# another writer's in-flight staging (a misuse the lease already
# rejects, but reclamation must not be the failure mode) or this
# stream's own crash debris, reclaimed on any pass after the window.
STAGE_GRACE_MS_DEFAULT = 10 * 60 * 1000


def stream_append(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    budget: int = SHARD_BUDGET_DEFAULT,
    available_now: bool = True,
    max_segments: int | None = MAX_SEGMENTS_DEFAULT,
    vacuum_keep: int | None = None,
    dedup: bool = False,
    lease_ttl_ms: int = LEASE_TTL_MS,
    lease_timeout_ms: int | None = None,
    steal_lease: bool = False,
    stage_grace_ms: int = STAGE_GRACE_MS_DEFAULT,
    maintenance_every: int = 1,
) -> StreamingQuery:
    """Pack a streaming (doc_id, n_tokens) frame into the ledger at
    ``path``, one committed segment per non-empty micro-batch.
    ``available_now=True`` drains the current backlog and stops — the
    nightly-batch mode; False runs continuously.

    ``max_segments`` arms in-line compaction: after each committed
    batch, once the live container count exceeds the bound, the
    smallest containers are rewritten into one
    (operators.shards.compact) — the small-files defense a
    long-running stream needs, without a side maintenance job. Each
    compaction is its own manifest commit, so a crash between the
    append and the compaction loses nothing: the next batch's
    compaction pass picks up where it left off. DEFAULT-ON at
    ``MAX_SEGMENTS_DEFAULT`` (64): an unbounded stream grows the live
    container count — and with it the dedup gate's bloom-union
    broadcast — without limit; pass ``None`` to opt out explicitly.

    ``vacuum_keep`` adds the retention pass (operators.merge.vacuum):
    after each batch the newest N manifests stay time-travelable and
    everything older — compacted-away segments, their bloom sidecars,
    superseded commit JSONs — is reclaimed. With both knobs set, a
    stream that runs for a year holds ≤ max_segments live containers
    and ≤ vacuum_keep manifests of history, independent of how many
    micro-batches ever committed: storage AND metadata are bounded by
    policy, not by stream lifetime. The pass runs with
    ``stage_grace_ms`` (default 10 min): never-referenced staged
    generations younger than the grace survive, so even a rogue
    concurrent writer's in-flight staging is not silently reclaimed —
    it is refused up front by the lease below.

    ``dedup=True`` routes every batch through the ledger's bloom-gated
    key dedup (operators.shards.dedup_against_ledger) — the streaming
    case is exactly where it earns its keep: an at-least-once upstream
    feed (or a source whose files get rewritten in place) re-delivers
    documents, and the gate drops the already-committed keys at
    metadata-sized cost before packing. A batch that dedups to zero
    commits nothing (append_segment's empty guard), so re-delivery
    never mints empty segments.

    ``maintenance_every`` is the CADENCE of the in-line maintenance
    passes: compaction + vacuum run after every K-th COMMITTED batch
    (default 1 — the historical every-batch behavior). The tuned
    150-batch soak showed per-batch maintenance, not the lease or
    publish protocol, dominating the micro-batch wall under tight
    policies; K>1 amortizes it. The bounds relax accordingly and only
    transiently: the live container count can overshoot
    ``max_segments`` by up to K−1 between passes, and a DRAINED
    (availableNow) stream whose final batches landed after the last
    pass leaves that tail unmaintained until the next run's first
    cadence hit (or an offline operators.shards.compact). Crash-safe
    for free: maintenance never carries state between batches — a
    missed pass is picked up whole by the next one.

    SINGLE WRITER — ENFORCED: the stream acquires the ledger's writer
    lease (``_commits/_writer.lease``, operators/lease.py) before it
    starts, re-asserts it at every micro-batch, and releases it when
    the query terminates (any exit path; a hard-killed process leaves
    a lease that expires after ``lease_ttl_ms``). A second
    ``stream_append`` against the same ledger path raises
    :class:`~..operators.lease.LedgerLockedError` at start instead of
    racing the armed compaction/vacuum passes — the failure mode the
    lease exists to prevent is writer A's vacuum reclaiming writer B's
    staged-but-unpublished generation. ``steal_lease=True`` breaks a
    live lease — only for restarting a hard-killed stream before its
    lease expired (the checkpoint lock guarantees it's the same query).
    Side BATCH merges against the path remain the caller's
    responsibility: take ``acquire_writer_lease`` around them or run
    them while no stream holds the lease.

    (Since r14 the COMMIT protocol itself is optimistic —
    merge.commit_optimistic — so plain writers no longer need a lease
    between each other; this stream still holds it because it also
    runs the armed compaction/VACUUM maintenance, and vacuum racing
    another writer's in-flight staging remains the one composition
    only the lease or a stage-grace window makes safe.)"""
    spark = stream.sparkSession
    lease_kwargs = {} if lease_timeout_ms is None else {
        "timeout_ms": lease_timeout_ms
    }
    lease = acquire_writer_lease(
        spark, path, ttl_ms=lease_ttl_ms, steal=steal_lease, **lease_kwargs
    )
    # keep the lease fresh even when the SOURCE goes idle past the TTL
    # (a continuous stream with no arriving batches heartbeats nothing
    # in foreachBatch — without this, routine maintenance would break
    # the "expired" lease and the healthy stream dies on its next
    # real batch)
    lease.start_auto_heartbeat()

    # per-stream cache scope: the per-batch release below must drain
    # only THIS stream's pinned intermediates, never a concurrent
    # query's tracked persists in the same driver (twophase boundary
    # samples, another stream's dedup candidates)
    cache_tag = f"shard_ingest:{checkpoint_dir}"
    # committed-batch counter for the maintenance cadence — driver-
    # local is correct here: foreachBatch runs on the driver, and a
    # restart resetting the count only delays the first pass by <K
    committed_count = [0]

    def pack_batch(batch: DataFrame, batch_id: int) -> None:
        # re-assert ownership BEFORE mutating: if the lease was stolen
        # (expired under a stalled batch, or an operator forced a
        # takeover) this batch must fail, not publish into a ledger
        # whose new owner may be compacting/vacuuming concurrently
        lease.heartbeat()
        if batch.isEmpty():
            return
        spark_b = batch.sparkSession
        # foreachBatch is at-least-once: a crash AFTER the manifest
        # publish but BEFORE the checkpoint's commit-log write replays
        # this batch — without a marker the replay would pack the same
        # docs into a SECOND visible segment (dedup=True would catch
        # it; dedup=False has no other guard). The marker rides in the
        # commit (and survives in-line compaction, which carries it
        # forward), so a replayed batch is recognized and skipped.
        # CHECKPOINT-scoped: batch ids restart at 0 for every new
        # checkpoint, so a bare id would misread a DIFFERENT stream's
        # first batch as a replay of ours.
        tag = f"{checkpoint_dir}:{batch_id}"
        if last_batch_tag(spark_b, path) == tag:
            _log.warning(
                "stream_append batch %s: already committed (replay "
                "after a crash between publish and checkpoint) — "
                "skipping the re-pack", batch_id,
            )
            return
        # persist the micro-batch: the dedup gate alone reads it three
        # times (key min/max for the zonemap, the distinct probe keys,
        # the final anti-join) before the pack + staged write — a
        # re-fetching source (Kafka) would otherwise pay each pass
        batch = batch.persist()
        try:
            with cache_scope(cache_tag):
                append_segment(
                    spark_b, path, batch, budget, dedup=dedup,
                    batch_tag=tag,
                )
                # cadence counts COMMITTED batches (this one included);
                # empty/replayed batches returned above and don't tick
                committed_count[0] += 1
                if committed_count[0] % max(1, int(maintenance_every)):
                    return
                if max_segments is not None:
                    compact(spark_b, path, max_segments)
                if vacuum_keep is not None:
                    vacuum(
                        spark_b, path, keep_versions=vacuum_keep,
                        stage_grace_ms=stage_grace_ms,
                    )
        finally:
            batch.unpersist()
            # the dedup gate persists its candidate set for the
            # flagged-container collect + verify join; release per
            # batch — a long stream must not accumulate pinned blocks
            # (measured: the r10 soak's batch wall doubled from block
            # churn before this release). Scoped: only THIS stream's
            # pins are dropped.
            release_caches(cache_tag)

    writer = stream.writeStream.foreachBatch(pack_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    try:
        query = writer.start()
    except Exception:
        lease.release()
        raise
    release_on_termination(query, lease)
    return query
