"""Incremental training-shard ledger: token-budget shard packing
(queries/assembly.q_token_shards' two-phase cumsum) composed with the
merge-manifest commit protocol (operators/merge.py), so NEW documents
extend the shard sequence as an atomically-committed SEGMENT without
re-packing — or even re-reading — the shards already published.

This is the training-resume case: a corpus refresh lands, the loader
must keep seeking into the shards it already has (byte-identical
files, identical doc→shard assignments), and the new documents must
continue the packing exactly where the last commit stopped (the first
new doc may legitimately top up the final partially-filled shard).

Layout — each append is one SEGMENT, stored as one `_kb` partition of
a merge-style manifest base:

    path/gen=<v>-<tok>/_kb=<segment>/part-*.parquet
    path/_commits/v%012d.json     {segment -> generation token}

Committed segments are WRITE-ONCE: an append stages its own uniquely-
named generation directory and publishes by the same rename-only
manifest commit as merge.py — a crashed append leaves an invisible
orphan (vacuum() reclaims), a racing append loses the rename and can
never have touched the winner's files, and `version=` time travel
replays the ledger as of any earlier append.

Packing continuity costs ONE bounded read: the running token total is
the max `cum` of the LAST segment only (one directory listed, one
scalar to the driver) — the packed history is never re-scanned. At
100 TB that means appending a 1 GB refresh touches ~1 GB, not 100 TB.

Reference parity: the reference's ingest appends objects to a Ceph
bucket and re-lists on read (s3vectors-app/pythonvectordbceph.py's
event loop); this supplies the equivalent append surface for the
shard artifact with exactly-once visibility.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import bloom_build, bloom_contains
from .merge import (
    _gen_token,
    _publish,
    _staged_write,
    current_manifest,
    read_buckets,
)
from .twophase import global_cumsum

SHARD_BUDGET_DEFAULT = 10_000
_SALT = ":7"  # the deterministic-shuffle salt shared with q_token_shards

# per-segment membership-bloom sidecar: k hash functions over m bit
# positions. m bounds the sidecar at 2^17 rows (≈1 MB parquet) per
# segment regardless of segment size; correctness never depends on
# these values (bloom positives are exactly verified, negatives are
# guaranteed absent), only the prune ratio does.
BLOOM_K = 7
BLOOM_M = 1 << 17


def _pack(docs: DataFrame, budget: int, offset) -> DataFrame:
    """Assign (doc_id, n_tokens) rows to token-budget shards starting
    at global token ``offset``: deterministic shuffle order within the
    batch (md5(id:salt), the q_shuffle_order deal), two-phase global
    cumsum (no corpus-sized window on one task), shard = the shard
    containing the doc's first token — docs never split."""
    t = docs.select(
        "doc_id",
        "n_tokens",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SALT))).alias(
            "_k"
        ),
    )
    c = global_cumsum(t, ["_k", "doc_id"], "n_tokens", cum_col="cum")
    return c.select(
        "doc_id",
        "n_tokens",
        (F.col("cum") + F.lit(offset)).alias("cum"),
        F.expr(f"(cum + {offset} - n_tokens) div {budget}").alias("shard_id"),
    )


def dedup_against_ledger(
    spark: SparkSession, path: str, docs: DataFrame
) -> DataFrame:
    """Drop incoming docs whose ``doc_id`` is already committed in the
    ledger — the dedup gate of an incremental corpus refresh — at
    bloom-pruned cost:

      1. union the per-segment bloom sidecars (≤ BLOOM_M rows each,
         written atomically with every segment since this feature) —
         kilobytes per segment however large the segments are;
      2. bloom-probe the incoming keys: definite-absent keys (the
         overwhelming majority of a refresh) pass WITHOUT touching the
         ledger data — no false negatives, so nothing committed can
         slip through;
      3. exactly verify only the maybe-present candidates with an
         anti-join against the ledger's key column (column-pruned
         scan; the candidate side is broadcast-small by construction).

    Segments committed before the sidecar existed have no bloom; the
    gate then falls back to the plain exact anti-join against the full
    key column. Returns ``docs`` filtered, schema unchanged."""
    version, live = current_manifest(spark, path)
    if version is None or not live:
        return docs
    sidecars = [f"{path}/gen={g}/_bloom" for g in live.values()]
    if all(os.path.isdir(p) for p in sidecars):
        bloom = spark.read.parquet(*sidecars).distinct()
        probe = bloom_contains(
            bloom, docs.select("doc_id"), "doc_id", BLOOM_K, BLOOM_M
        )
        candidates = probe.filter(F.col("maybe_present")).select("doc_id")
        committed = read_buckets(spark, path).select("doc_id")
        confirmed = candidates.join(committed, "doc_id", "left_semi")
        return docs.join(F.broadcast(confirmed), "doc_id", "left_anti")
    committed = read_buckets(spark, path).select("doc_id")
    return docs.join(committed, "doc_id", "left_anti")


def append_segment(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    budget: int = SHARD_BUDGET_DEFAULT,
    files_per_segment: int = 4,
    dedup: bool = False,
) -> int:
    """Append ``docs`` (doc_id, n_tokens) to the ledger at ``path`` as
    the next segment; creates the ledger on first call. Returns the
    committed segment id. The packing continues from the last
    committed token offset, so incremental appends produce the SAME
    doc→shard mapping as a one-shot pack over the segment-major
    concatenation (pytest-pinned).

    ``dedup=True`` routes the batch through
    :func:`dedup_against_ledger` first, so a refresh that re-delivers
    already-packed documents (at-least-once upstream feeds) appends
    only the genuinely new ones. Every append also stages a bloom
    sidecar of its own keys inside its generation directory — it
    publishes (and vacuums) atomically with the segment, which is what
    keeps the gate's step 1 a metadata-sized read."""
    version, live = current_manifest(spark, path)
    if version is None:
        v, seg, offset = 0, 0, 0
    else:
        v, seg = version + 1, (max(live) + 1 if live else 0)
        if live:
            # continuity state = ONE scalar off ONE directory: the max
            # cum of the last segment; the rest of the ledger is never
            # listed, read, or re-packed
            last = read_buckets(spark, path, buckets=[max(live)])
            offset = last.agg(F.max("cum")).collect()[0][0]
        else:
            offset = 0
    if dedup:
        docs = dedup_against_ledger(spark, path, docs)
    packed = _pack(docs, budget, offset).withColumn("_kb", F.lit(seg))
    gen = _gen_token(v)
    _staged_write(spark, path, packed, gen, 1, files_per_segment)
    # key bloom into the SAME staged (still-invisible) generation dir:
    # published by the rename below or orphaned with it on a crash
    bloom_build(
        packed.select("doc_id"), "doc_id", BLOOM_K, BLOOM_M
    ).write.mode("overwrite").parquet(f"{path}/gen={gen}/_bloom")
    new_map = dict(live)
    new_map[seg] = gen
    _publish(spark, path, v, new_map)
    spark.catalog.refreshByPath(path)
    return seg


def read_ledger(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The full doc→shard assignment (doc_id, n_tokens, cum, shard_id,
    segment), manifest-resolved; ``version=`` time-travels to the
    ledger as of an earlier append."""
    df = read_buckets(spark, path, version=version)
    if df is None:
        raise FileNotFoundError(f"no committed shard ledger under {path}")
    return df.withColumnRenamed("_kb", "segment")


def shard_manifest(ledger: DataFrame) -> DataFrame:
    """The per-shard rollup a loader consumes (q_shard_manifest's
    shape + segment span): one hash aggregate over the assignment.
    ``n_segments`` > 1 marks shards that straddle an append boundary
    (the topped-up final shard of an earlier segment)."""
    return (
        ledger.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.countDistinct("segment").alias("n_segments"),
        )
        .orderBy("shard_id")
    )
