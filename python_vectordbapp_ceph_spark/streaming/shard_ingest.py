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

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..cache import release_caches
from ..operators.merge import vacuum
from ..operators.shards import SHARD_BUDGET_DEFAULT, append_segment, compact


def stream_append(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    budget: int = SHARD_BUDGET_DEFAULT,
    available_now: bool = True,
    max_segments: int | None = None,
    vacuum_keep: int | None = None,
    dedup: bool = False,
) -> StreamingQuery:
    """Pack a streaming (doc_id, n_tokens) frame into the ledger at
    ``path``, one committed segment per non-empty micro-batch.
    ``available_now=True`` drains the current backlog and stops — the
    nightly-batch mode; False runs continuously.

    ``max_segments`` arms in-line compaction: after each committed
    batch, once the live container count exceeds the bound, the oldest
    containers are rewritten into one (operators.shards.compact) — the
    small-files defense a long-running stream needs, without a side
    maintenance job. Each compaction is its own manifest commit, so a
    crash between the append and the compaction loses nothing: the
    next batch's compaction pass picks up where it left off.

    ``vacuum_keep`` adds the retention pass (operators.merge.vacuum):
    after each batch the newest N manifests stay time-travelable and
    everything older — compacted-away segments, their bloom sidecars,
    superseded commit JSONs — is reclaimed. With both knobs set, a
    stream that runs for a year holds ≤ max_segments live containers
    and ≤ vacuum_keep manifests of history, independent of how many
    micro-batches ever committed: storage AND metadata are bounded by
    policy, not by stream lifetime.

    ``dedup=True`` routes every batch through the ledger's bloom-gated
    key dedup (operators.shards.dedup_against_ledger) — the streaming
    case is exactly where it earns its keep: an at-least-once upstream
    feed (or a source whose files get rewritten in place) re-delivers
    documents, and the gate drops the already-committed keys at
    metadata-sized cost before packing. A batch that dedups to zero
    commits nothing (append_segment's empty guard), so re-delivery
    never mints empty segments.

    SINGLE WRITER REQUIRED once ``max_segments``/``vacuum_keep`` are
    set: vacuum deletes any staged generation no retained manifest
    references, so a concurrent writer's not-yet-committed staging can
    be reclaimed out from under it. One stream per ledger path is the
    contract (Structured Streaming's checkpoint lock enforces it for
    the stream itself; don't run side batch merges against the same
    path while the knobs are armed)."""

    def pack_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        try:
            append_segment(
                batch.sparkSession, path, batch, budget, dedup=dedup
            )
            if max_segments is not None:
                compact(batch.sparkSession, path, max_segments)
            if vacuum_keep is not None:
                vacuum(batch.sparkSession, path, keep_versions=vacuum_keep)
        finally:
            # the dedup gate persists its candidate set for the
            # flagged-container collect + verify join; release per
            # batch — a long stream must not accumulate pinned blocks
            # (measured: the r10 soak's batch wall doubled from block
            # churn before this release)
            release_caches()

    writer = stream.writeStream.foreachBatch(pack_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
