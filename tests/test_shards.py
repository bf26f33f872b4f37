"""operators/shards.py — the incremental shard ledger must extend the
packing without touching committed segments: byte-identical old files,
identical old assignments, one coherent global token sequence, and
time travel to any earlier append."""

import json

import pytest
import os

from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.shards import (
    append_segment,
    read_ledger,
    shard_manifest,
)

BUDGET = 500


def _docs(spark, lo, n):
    # deterministic token counts, 1..100
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100)) + 1).alias("n_tokens"),
    )


def _segment_files(path):
    """segment dir -> sorted [(file, size, mtime)] via the manifest."""
    cdir = os.path.join(path, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        m = json.load(f)
    out = {}
    for seg, g in m["buckets"].items():
        full = os.path.join(path, f"gen={g}", f"_kb={seg}")
        out[seg] = sorted(
            (f, os.path.getsize(os.path.join(full, f)),
             os.path.getmtime(os.path.join(full, f)))
            for f in os.listdir(full) if f.endswith(".parquet")
        )
    return out


def test_incremental_append_extends_without_repacking(spark, tmp_path):
    path = str(tmp_path / "ledger")

    assert append_segment(spark, path, _docs(spark, 0, 200), BUDGET) == 0
    v0 = {
        r.doc_id: (r.shard_id, r.cum, r.segment)
        for r in read_ledger(spark, path).collect()
    }
    files_v0 = _segment_files(path)

    assert append_segment(spark, path, _docs(spark, 1000, 150), BUDGET) == 1
    after = {
        r.doc_id: (r.shard_id, r.cum, r.segment)
        for r in read_ledger(spark, path).collect()
    }

    # old assignments identical, old segment files byte-identical
    assert {d: v for d, v in after.items() if d in v0} == v0
    assert _segment_files(path)["0"] == files_v0["0"]

    # the union is ONE coherent packing sequence: cums are consecutive
    rows = sorted(after.values(), key=lambda t: t[1])
    ledger = read_ledger(spark, path).collect()
    by_cum = sorted(ledger, key=lambda r: r.cum)
    prev = 0
    for r in by_cum:
        assert r.cum == prev + r.n_tokens, (r.doc_id, r.cum, prev)
        assert r.shard_id == (r.cum - r.n_tokens) // BUDGET
        prev = r.cum

    # new docs continue AFTER the committed prefix: every segment-1
    # doc packs at or beyond the last segment-0 shard
    max0 = max(s for s, _, seg in after.values() if seg == 0)
    assert all(s >= max0 for s, _, seg in after.values() if seg == 1)
    assert rows, "non-empty"


def test_ledger_time_travel_and_manifest_rollup(spark, tmp_path):
    path = str(tmp_path / "ledger")
    append_segment(spark, path, _docs(spark, 0, 200), BUDGET)
    v0 = {
        r.doc_id: (r.shard_id, r.cum)
        for r in read_ledger(spark, path).collect()
    }
    append_segment(spark, path, _docs(spark, 1000, 150), BUDGET)

    # version 0 replays exactly the pre-append ledger
    spark.catalog.refreshByPath(path)
    tt = {
        r.doc_id: (r.shard_id, r.cum)
        for r in read_ledger(spark, path, version=0).collect()
    }
    assert tt == v0

    # rollup reflects BOTH generations: full shard coverage, exact
    # token accounting, and the topped-up boundary shard (if the old
    # tail shard was partial) spans two segments
    man = shard_manifest(read_ledger(spark, path)).collect()
    total = sum(r.n_tokens for r in man)
    assert total == sum(
        r.n_tokens for r in read_ledger(spark, path).collect()
    )
    assert sorted(r.shard_id for r in man) == list(
        range(len(man))
    ), "contiguous shard ids"
    segs = {r.shard_id: r.n_segments for r in man}
    old_tail_tokens = max(c for _, c in v0.values())
    if old_tail_tokens % BUDGET != 0:
        boundary = old_tail_tokens // BUDGET
        assert segs[boundary] == 2, "append tops up the partial tail shard"
    # every shard except the last closed at or past the budget
    for r in man[:-1]:
        assert r.n_tokens >= 1  # docs never split; budget closes shards


def test_streaming_append_equals_batch_appends(spark, tmp_path):
    """Draining a doc stream through the shard-ingest sink must produce
    EXACTLY the ledger of the equivalent batch append_segment calls:
    same segments, same doc->shard assignments, same cums."""
    from python_vectordbapp_ceph_spark.streaming.shard_ingest import (
        stream_append,
    )

    src = str(tmp_path / "src")
    batch1 = _docs(spark, 0, 120)
    batch1.coalesce(1).write.parquet(src)

    # batch reference ledger
    ref = str(tmp_path / "ref")
    append_segment(spark, ref, batch1, BUDGET)

    # streamed ledger: one availableNow drain = one micro-batch
    led = str(tmp_path / "led")
    q = stream_append(
        spark.readStream.schema("doc_id long, n_tokens long").parquet(src),
        led,
        str(tmp_path / "ckpt"),
        BUDGET,
    )
    q.awaitTermination(120)

    want = {
        (r.doc_id, r.n_tokens, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, ref).collect()
    }
    got = {
        (r.doc_id, r.n_tokens, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, led).collect()
    }
    assert got == want

    # a second drop continues the stream's ledger from its committed
    # offset, exactly like a second batch append on the reference
    batch2 = _docs(spark, 5000, 80)
    batch2.coalesce(1).write.mode("append").parquet(src)
    append_segment(spark, ref, batch2, BUDGET)
    q2 = stream_append(
        spark.readStream.schema("doc_id long, n_tokens long").parquet(src),
        led,
        str(tmp_path / "ckpt"),
        BUDGET,
    )
    q2.awaitTermination(120)
    spark.catalog.refreshByPath(led)
    spark.catalog.refreshByPath(ref)
    want2 = {
        (r.doc_id, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, ref).collect()
    }
    got2 = {
        (r.doc_id, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, led).collect()
    }
    assert got2 == want2


def test_dedup_append_skips_committed_keys(spark, tmp_path):
    """An overlapping refresh appended with dedup=True packs only the
    genuinely new docs; committed files and assignments untouched."""
    import shutil

    from python_vectordbapp_ceph_spark.operators.shards import (
        dedup_against_ledger,
    )

    path = str(tmp_path / "ledger")
    append_segment(spark, path, _docs(spark, 0, 200), BUDGET)
    v0 = {
        r.doc_id: (r.shard_id, r.cum)
        for r in read_ledger(spark, path).collect()
    }
    files_v0 = _segment_files(path)

    # gate alone: exact set arithmetic, no false negatives or positives
    refresh = _docs(spark, 100, 200)  # ids 100..299, half committed
    kept = sorted(
        r.doc_id for r in dedup_against_ledger(spark, path, refresh).collect()
    )
    assert kept == list(range(200, 300))

    append_segment(spark, path, refresh, BUDGET, dedup=True)
    after = read_ledger(spark, path).collect()
    ids = sorted(r.doc_id for r in after)
    assert ids == list(range(0, 300)), "each id exactly once"
    assert {
        r.doc_id: (r.shard_id, r.cum) for r in after if r.doc_id < 200
    } == v0
    assert _segment_files(path)["0"] == files_v0["0"]
    # segment 1 holds exactly the new half
    assert sorted(r.doc_id for r in after if r.segment == 1) == list(
        range(200, 300)
    )

    # bloom sidecar exists per live generation and is size-bounded
    import json
    import os

    from python_vectordbapp_ceph_spark.operators.shards import BLOOM_M

    cdir = os.path.join(path, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        m = json.load(f)
    for g in m["buckets"].values():
        side = os.path.join(path, f"gen={g}", "_bloom")
        assert os.path.isdir(side)
        assert spark.read.parquet(side).count() <= BLOOM_M


def test_dedup_exact_even_with_saturated_bloom(spark, tmp_path, monkeypatch):
    """Shrink the bloom until nearly every probe is a maybe — the
    exact-verify stage must still produce set-exact results (the
    sidecar only ever changes COST, never the answer)."""
    import python_vectordbapp_ceph_spark.operators.shards as sh

    monkeypatch.setattr(sh, "BLOOM_K", 2)
    monkeypatch.setattr(sh, "BLOOM_M", 16)
    monkeypatch.setattr(sh, "BLOOM_M_CAP", 16)  # pin the r10 auto-scaling too
    path = str(tmp_path / "ledger")
    sh.append_segment(spark, path, _docs(spark, 0, 150), BUDGET)
    kept = sorted(
        r.doc_id
        for r in sh.dedup_against_ledger(
            spark, path, _docs(spark, 100, 100)
        ).collect()
    )
    assert kept == list(range(150, 200))


def test_empty_append_commits_nothing_and_never_bricks(spark, tmp_path):
    """A batch that packs to zero rows (empty input, or dedup=True on a
    fully already-committed redelivery) must NOT publish: a committed
    segment with no data directory would make every later read raise
    PATH_NOT_FOUND. The append reports -1, the ledger stays readable,
    and the next real append gets the next segment id and continues
    the token sequence exactly."""
    path = str(tmp_path / "ledger")
    assert append_segment(spark, path, _docs(spark, 0, 100), BUDGET) == 0
    before = {
        (r.doc_id, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, path).collect()
    }

    # dedup=True on an exact redelivery: everything drops
    assert append_segment(
        spark, path, _docs(spark, 0, 100), BUDGET, dedup=True
    ) == -1
    # a literally empty batch, with and without dedup
    empty = _docs(spark, 0, 100).filter(F.lit(False))
    assert append_segment(spark, path, empty, BUDGET) == -1
    assert append_segment(spark, path, empty, BUDGET, dedup=True) == -1

    # ledger unchanged and fully readable after the no-op appends
    spark.catalog.refreshByPath(path)
    assert {
        (r.doc_id, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, path).collect()
    } == before

    # the next real append is segment 1 and the sequence is coherent
    assert append_segment(spark, path, _docs(spark, 500, 50), BUDGET) == 1
    by_cum = sorted(read_ledger(spark, path).collect(), key=lambda r: r.cum)
    prev = 0
    for r in by_cum:
        assert r.cum == prev + r.n_tokens
        prev = r.cum

    # an empty FIRST append creates no ledger at all
    fresh = str(tmp_path / "fresh")
    assert append_segment(spark, fresh, empty, BUDGET) == -1
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_ledger(spark, fresh)


def _ledger_rows(spark, path, version=None):
    return {
        (r.doc_id, r.n_tokens, r.cum, r.shard_id, r.segment)
        for r in read_ledger(spark, path, version=version).collect()
    }


def _live_layout(path):
    """current manifest -> (container ids, parquet file count, dir count)."""
    cdir = os.path.join(path, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        m = json.load(f)
    files, dirs = 0, 0
    for seg, g in m["buckets"].items():
        full = os.path.join(path, f"gen={g}", f"_kb={seg}")
        dirs += 1
        files += sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
    return sorted(int(s) for s in m["buckets"]), files, dirs


@pytest.mark.slow
def test_compaction_read_identical_and_fewer_files(spark, tmp_path):
    """compact() must change LAYOUT only: same rows (original segment
    ids preserved in the data), strictly fewer live directories and
    parquet files, manifest max key unchanged, appends continue the
    token sequence, and the dedup gate still prunes through the merged
    bloom."""
    from python_vectordbapp_ceph_spark.operators.shards import (
        compact,
        dedup_against_ledger,
    )

    path = str(tmp_path / "ledger")
    # on-disk BYTES strictly increase with id so the size-ordered
    # merge picks {0,1,2,3} deterministically: single-file segments
    # (no empty-split noise) with well-separated row counts — at KB
    # scale parquet footers dominate, so doc counts alone don't order
    append_segment(spark, path, _docs(spark, 0, 60), BUDGET,
                   files_per_segment=1)
    for i in range(1, 6):
        append_segment(spark, path, _docs(spark, i * 1000, 100 * (i + 1)),
                       BUDGET, files_per_segment=1)
    before = _ledger_rows(spark, path)
    segs_b, files_b, dirs_b = _live_layout(path)
    assert segs_b == [0, 1, 2, 3, 4, 5]

    # merge the 4 oldest into one: 6 containers -> 3
    assert compact(spark, path, max_segments=3, files_per_segment=1) == 4
    spark.catalog.refreshByPath(path)
    assert _ledger_rows(spark, path) == before, "content is untouched"
    segs_a, files_a, dirs_a = _live_layout(path)
    assert segs_a == [3, 4, 5], "merged container keyed by max merged id"
    assert dirs_a < dirs_b and files_a < files_b
    # the merged container coalesced to exactly files_per_segment files
    cdir = os.path.join(path, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        g3 = json.load(f)["buckets"]["3"]
    merged_dir = os.path.join(path, f"gen={g3}", "_kb=3")
    assert (
        sum(1 for f in os.listdir(merged_dir) if f.endswith(".parquet")) == 1
    )
    # within budget -> no-op
    assert compact(spark, path, max_segments=3) == 0

    # dedup gate prunes via the MERGED bloom sidecar (every live
    # generation has one) and stays exact
    kept = sorted(
        r.doc_id
        for r in dedup_against_ledger(
            spark, path, _docs(spark, 0, 100)
        ).collect()
    )
    assert kept == list(range(60, 100)), "committed 0..59 pruned exactly"
    # append continuity: next id = max(live)+1, token sequence coherent
    assert append_segment(spark, path, _docs(spark, 9000, 40), BUDGET) == 6
    by_cum = sorted(read_ledger(spark, path).collect(), key=lambda r: r.cum)
    prev = 0
    for r in by_cum:
        assert r.cum == prev + r.n_tokens
        prev = r.cum

    # re-compaction is transitive: original segment ids survive a
    # second merge that swallows the already-compacted container
    want = _ledger_rows(spark, path)
    assert compact(spark, path, max_segments=1, files_per_segment=1) == 4
    spark.catalog.refreshByPath(path)
    assert _ledger_rows(spark, path) == want
    assert _live_layout(path)[0] == [6]


def test_compaction_preserves_time_travel(spark, tmp_path):
    """Every pre-compaction version= read must replay unchanged —
    compaction retains superseded generations (vacuum owns cleanup)."""
    from python_vectordbapp_ceph_spark.operators.shards import compact

    path = str(tmp_path / "ledger")
    snaps = {}
    for i in range(5):
        append_segment(spark, path, _docs(spark, i * 1000, 50), BUDGET)
        snaps[i] = _ledger_rows(spark, path)
    assert compact(spark, path, max_segments=2) == 4
    spark.catalog.refreshByPath(path)
    for v, want in snaps.items():
        assert _ledger_rows(spark, path, version=v) == want, f"version {v}"
    # current read == last pre-compaction state
    assert _ledger_rows(spark, path) == snaps[4]


def test_compaction_racing_disjoint_append_rebases_and_lands(
    spark, tmp_path, monkeypatch
):
    """OPTIMISTIC concurrency (r13 verdict top ask): a compaction that
    staged against a manifest a concurrent APPEND has since superseded
    no longer fails — the append touched only its fresh segment id,
    disjoint from the already-committed ids the compaction merges, so
    the compaction REBASES onto the newer manifest and BOTH commits
    land. The ledger reads identically (compaction is layout-only) and
    the appended segment survives."""
    import python_vectordbapp_ceph_spark.operators.shards as sh
    from python_vectordbapp_ceph_spark.operators.merge import (
        _read_json as rj,
    )

    path = str(tmp_path / "ledger")
    for i in range(4):
        append_segment(spark, path, _docs(spark, i * 1000, 50), BUDGET)

    # freeze the compactor's view of the manifest, then let an append
    # win the next version before the compactor publishes
    stale = sh.current_manifest(spark, path)
    append_segment(spark, path, _docs(spark, 9000, 50), BUDGET)
    want = _ledger_rows(spark, path)

    monkeypatch.setattr(sh, "current_manifest", lambda *_a, **_k: stale)
    assert sh.compact(spark, path, max_segments=2) == 3
    monkeypatch.undo()

    spark.catalog.refreshByPath(path)
    v, live = sh.current_manifest(spark, path)
    assert v == 5, "appends v0..v4; the rebased compaction lands at v5"
    assert 4 in live and len(live) == 3, (
        "3 of the 4 stale-view containers merged; appended segment kept"
    )
    assert _ledger_rows(spark, path) == want, (
        "compaction must stay read-identical across the rebase"
    )
    # the rebased commit records what it touched for later writers
    rec = rj(spark, f"{path}/_commits/v{5:012d}.json")
    assert len(rec["touched"]) == 3 and set(rec["touched"]) <= {0, 1, 2, 3}
    # superseded generations reclaim as usual, reclaim changes nothing
    from python_vectordbapp_ceph_spark.operators.merge import vacuum

    assert vacuum(spark, path) >= 1
    spark.catalog.refreshByPath(path)
    assert _ledger_rows(spark, path) == want


def test_racing_appends_still_single_win(spark, tmp_path, monkeypatch):
    """Appends are ORDER-DEPENDENT (next segment id and token offset
    both derive from the previous tail), so two appends racing from
    the same read version must still single-win: the loser raises
    ConcurrentWriteConflictError, its staging is cleaned up eagerly,
    and a plain retry (fresh read) lands it after the winner."""
    import pytest

    import python_vectordbapp_ceph_spark.operators.shards as sh
    from python_vectordbapp_ceph_spark.operators.merge import (
        ConcurrentWriteConflictError,
    )

    path = str(tmp_path / "ledger")
    for i in range(2):
        append_segment(spark, path, _docs(spark, i * 1000, 50), BUDGET)

    stale = sh.current_manifest(spark, path)
    append_segment(spark, path, _docs(spark, 5000, 50), BUDGET)  # winner

    monkeypatch.setattr(sh, "current_manifest", lambda *_a, **_k: stale)
    with pytest.raises(ConcurrentWriteConflictError, match="overlapping"):
        append_segment(spark, path, _docs(spark, 9000, 50), BUDGET)
    monkeypatch.undo()

    # loser's staging was eagerly dropped (it KNOWS it lost) — no
    # unreferenced gen dirs wait for vacuum
    import os

    _, live = sh.current_manifest(spark, path)
    on_disk = {d.split("=", 1)[1] for d in os.listdir(path)
               if d.startswith("gen=")}
    assert on_disk == set(live.values())

    # plain retry from a fresh read lands as the next segment
    seg = append_segment(spark, path, _docs(spark, 9000, 50), BUDGET)
    assert seg == 3
    assert _ledger_rows(spark, path)


@pytest.mark.slow
def test_streaming_compaction_bounds_container_count(spark, tmp_path):
    """A drip-fed stream with max_segments= + vacuum_keep= keeps the
    live container count, the on-disk generation count, AND the commit
    listing bounded while reading back the exact batch-union ledger —
    storage and metadata bounded by policy, not stream lifetime."""
    from python_vectordbapp_ceph_spark.streaming.shard_ingest import (
        stream_append,
    )

    src = str(tmp_path / "src")
    led = str(tmp_path / "led")
    ckpt = str(tmp_path / "ckpt")
    total = set()
    for i in range(5):
        batch = _docs(spark, i * 1000, 40)
        total |= {(r.doc_id, r.n_tokens) for r in batch.collect()}
        batch.coalesce(1).write.mode("append").parquet(src)
        q = stream_append(
            spark.readStream.schema("doc_id long, n_tokens long").parquet(src),
            led,
            ckpt,
            BUDGET,
            max_segments=2,
            vacuum_keep=2,
        )
        q.awaitTermination(120)
        spark.catalog.refreshByPath(led)
        segs, _, dirs = _live_layout(led)
        assert len(segs) <= 2 and dirs <= 2, f"round {i}: {segs}"
        n_commits = len([n for n in os.listdir(os.path.join(led, "_commits"))
                         if n.endswith(".json")])
        assert n_commits <= 2, f"round {i}: {n_commits} commits"
        n_gens = len([n for n in os.listdir(led) if n.startswith("gen=")])
        assert n_gens <= 4, f"round {i}: {n_gens} generation dirs"
    got = {
        (r.doc_id, r.n_tokens)
        for r in read_ledger(spark, led).collect()
    }
    assert got == total
    # the packing stayed one coherent sequence across all compactions
    by_cum = sorted(read_ledger(spark, led).collect(), key=lambda r: r.cum)
    prev = 0
    for r in by_cum:
        assert r.cum == prev + r.n_tokens
        prev = r.cum


def test_streaming_dedup_drops_redelivered_keys(spark, tmp_path):
    """A stream with dedup=True over a partially re-delivering source:
    each doc packs exactly once, re-deliveries commit nothing (no
    empty segments), and the ledger equals the dedup-less union of the
    genuinely new docs."""
    from python_vectordbapp_ceph_spark.streaming.shard_ingest import (
        stream_append,
    )

    src = str(tmp_path / "src")
    led = str(tmp_path / "led")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = stream_append(
            spark.readStream.schema("doc_id long, n_tokens long").parquet(src),
            led, ckpt, BUDGET, dedup=True,
        )
        assert q.awaitTermination(120)
        spark.catalog.refreshByPath(led)

    _docs(spark, 0, 100).coalesce(1).write.mode("append").parquet(src)
    drain()
    # second drop: ids 50..149 — half re-delivered, half new
    _docs(spark, 50, 100).coalesce(1).write.mode("append").parquet(src)
    drain()
    # third drop: a FULL re-delivery — must commit nothing
    _docs(spark, 0, 150).coalesce(1).write.mode("append").parquet(src)
    segs_before, _, _ = _live_layout(led)
    drain()
    segs_after, _, _ = _live_layout(led)
    assert segs_after == segs_before, "full re-delivery minted a segment"

    rows = read_ledger(spark, led).collect()
    assert sorted(r.doc_id for r in rows) == list(range(150)), "each id once"
    by_cum = sorted(rows, key=lambda r: r.cum)
    prev = 0
    for r in by_cum:
        assert r.cum == prev + r.n_tokens
        prev = r.cum


@pytest.mark.slow
def test_retention_vacuum_keeps_window_and_bounds_metadata(spark, tmp_path):
    """vacuum(keep_versions=N): time travel keeps working inside the
    retention window after compaction, everything older is reclaimed
    (data dirs AND their bloom sidecars AND superseded commit JSONs),
    and the ledger's current read plus the dedup gate stay exact."""
    import pytest

    from python_vectordbapp_ceph_spark.operators.merge import vacuum
    from python_vectordbapp_ceph_spark.operators.shards import (
        compact,
        dedup_against_ledger,
    )

    path = str(tmp_path / "ledger")
    snaps = {}
    for i in range(5):
        append_segment(spark, path, _docs(spark, i * 1000, 50), BUDGET)
        snaps[i] = _ledger_rows(spark, path)
    compact(spark, path, max_segments=2)  # version 5
    spark.catalog.refreshByPath(path)
    snaps[5] = _ledger_rows(spark, path)
    assert snaps[5] == snaps[4]

    # keep the last two versions: 4 (pre-compaction, references ALL
    # original generations) and 5 (current). Nothing is reclaimable
    # yet — retention must NOT delete data a kept manifest references —
    # but the commit listing is already trimmed to the window.
    assert vacuum(spark, path, keep_versions=2) == 0
    spark.catalog.refreshByPath(path)
    assert _ledger_rows(spark, path) == snaps[5]
    assert _ledger_rows(spark, path, version=4) == snaps[4]
    for old in (0, 1, 2, 3):
        with pytest.raises(Exception):
            read_ledger(spark, path, version=old).collect()
    cdir = os.path.join(path, "_commits")
    assert sorted(n for n in os.listdir(cdir) if n.endswith(".json")) == [
        "v000000000004.json", "v000000000005.json",
    ]

    # shrink the window to the current version: the four compacted-away
    # pre-compaction generations (data + bloom sidecars) are reclaimed
    assert vacuum(spark, path, keep_versions=1) == 4
    spark.catalog.refreshByPath(path)
    assert _ledger_rows(spark, path) == snaps[5]
    with pytest.raises(Exception):
        read_ledger(spark, path, version=4).collect()
    assert sorted(n for n in os.listdir(cdir) if n.endswith(".json")) == [
        "v000000000005.json",
    ]
    with open(os.path.join(cdir, "v000000000005.json")) as f:
        live_gens = set(json.load(f)["buckets"].values())
    on_disk = {n.split("=", 1)[1] for n in os.listdir(path)
               if n.startswith("gen=")}
    assert on_disk == live_gens, "no orphaned generation or bloom dirs"

    # the gate still prunes through the surviving blooms, exactly
    kept = sorted(
        r.doc_id
        for r in dedup_against_ledger(spark, path, _docs(spark, 0, 60)).collect()
    )
    assert kept == list(range(50, 60))


def test_dedup_falls_back_without_sidecar(spark, tmp_path):
    """A ledger whose segments predate the bloom sidecar still dedups
    exactly via the full-key anti-join fallback."""
    import json
    import os
    import shutil

    from python_vectordbapp_ceph_spark.operators.shards import (
        dedup_against_ledger,
    )

    path = str(tmp_path / "ledger")
    append_segment(spark, path, _docs(spark, 0, 120), BUDGET)
    cdir = os.path.join(path, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        m = json.load(f)
    for g in m["buckets"].values():
        shutil.rmtree(os.path.join(path, f"gen={g}", "_bloom"))
    kept = sorted(
        r.doc_id
        for r in dedup_against_ledger(
            spark, path, _docs(spark, 60, 120)
        ).collect()
    )
    assert kept == list(range(120, 180))


@pytest.mark.slow
def test_ledger_soak_50_batches_bounded_and_constant_time(spark, tmp_path):
    """SOAK (r9 verdict ask #3): ONE streaming query drives 50+
    micro-batches (maxFilesPerTrigger=1 over 52 pre-staged files, ~30%
    of them re-deliveries) with dedup=True, max_segments=2 and
    vacuum_keep=2 all live. After the drain:

      - on-disk layout is bounded by policy (live containers ≤ 2,
        generation dirs ≤ 4, _commits JSONs ≤ 2, parquet data files
        ≤ live_containers × files_per_segment + bloom sidecars) —
        NOT by the 52 commits that ever happened;
      - every delivered doc packed exactly once (the bloom gate ate
        the re-deliveries), and the ledger reads back as ONE coherent
        token sequence with the one-shot-pack invariants
        (cum continuity; shard_id == (cum - n_tokens) div budget);
      - append stays constant-time: the continuity state is one
        scalar off one directory, so late batches must not slow down
        as commits accumulate — the last 10 batch walls stay within
        5× of the first 10's median (generous: catches O(n) metadata
        walks, tolerates CI jitter).
    """
    from python_vectordbapp_ceph_spark.streaming.shard_ingest import (
        stream_append,
    )

    src = str(tmp_path / "src")
    led = str(tmp_path / "led")
    delivered = set()
    n_files = 52
    for i in range(n_files):
        # stride 20 over 30-doc files → 10-doc overlap with the
        # previous file (re-delivery), plus every 7th file is a FULL
        # re-delivery of the one before it
        lo = (i - 1 if i % 7 == 3 else i) * 20
        batch = _docs(spark, lo, 30)
        delivered |= {(r.doc_id, r.n_tokens) for r in batch.collect()}
        batch.coalesce(1).write.mode("append").parquet(src)

    q = stream_append(
        spark.readStream.schema("doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        led,
        str(tmp_path / "ckpt"),
        BUDGET,
        max_segments=2,
        vacuum_keep=2,
        dedup=True,
    )
    assert q.awaitTermination(600), "soak stream did not drain in 600s"
    walls = [p["batchDuration"] for p in q.recentProgress
             if p.get("numInputRows", 0) > 0]
    assert len(walls) >= 50, f"expected ≥50 micro-batches, saw {len(walls)}"
    spark.catalog.refreshByPath(led)

    # --- bounded metadata + storage ---------------------------------
    segs, _, dirs = _live_layout(led)
    assert len(segs) <= 2 and dirs <= 2, f"live layout unbounded: {segs}"
    commits_dir = os.listdir(os.path.join(led, "_commits"))
    n_commits = len([n for n in commits_dir
                     if n.startswith("v") and n.endswith(".json")])
    assert n_commits <= 2, f"commit listing unbounded: {n_commits}"
    # the manifest checkpoint keeps the current + previous snapshot
    n_ckpts = len([n for n in commits_dir if n.startswith("_checkpoint.")])
    assert n_ckpts <= 2, f"checkpoint files unbounded: {n_ckpts}"
    n_gens = len([n for n in os.listdir(led) if n.startswith("gen=")])
    assert n_gens <= 4, f"generation dirs unbounded: {n_gens}"
    n_parquet = sum(
        len([f for f in files if f.endswith(".parquet")])
        for root, _, files in os.walk(led)
        if "_commits" not in root
    )
    # vacuum_keep=2 retains ≤ 2 manifests × ≤ 2 containers = ≤ 4
    # distinct generations: ≤ 4×4 data files + ≤ 4 bloom sidecars +
    # slack — the point is "bounded by POLICY", vs 52 commits × 5
    # files ≈ 260 unbounded
    assert n_parquet <= 24, f"file count unbounded: {n_parquet}"

    # --- exactly-once + one-shot-pack invariants --------------------
    rows = read_ledger(spark, led).collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        d for d, _ in delivered
    ), "dedup gate must pack each delivered doc exactly once"
    prev = 0
    for r in sorted(rows, key=lambda r: r.cum):
        assert r.cum == prev + r.n_tokens, "token sequence tore"
        assert r.shard_id == (r.cum - r.n_tokens) // BUDGET
        prev = r.cum

    # --- constant-time append ---------------------------------------
    head = sorted(walls[:10])[5]  # median of the first 10
    for w in walls[-10:]:
        assert w <= 5 * max(head, 500), (
            f"append slowed with ledger age: first-10 median {head}ms, "
            f"late batch {w}ms"
        )
    # pinned DRIFT CEILING (r11): the last-10 median must stay within
    # 2× of the first-10 median (+1s absolute slack for sub-second
    # batches where scheduler jitter dominates). The r10 sfx10 soak
    # measured 1.22× residual drift from redelivery-verify cost; the
    # sidecar zonemaps removed the verify work range-disjoint batches
    # never owed, and this assertion keeps the trend pinned.
    tail_med = sorted(walls[-10:])[5]
    assert tail_med <= 2 * head + 1000, (
        f"batch-wall drift above ceiling: first-10 median {head}ms, "
        f"last-10 median {tail_med}ms"
    )


def test_compaction_merges_smallest_not_oldest(spark, tmp_path):
    """LSM tiering: compaction must pick merge candidates by SIZE, not
    age — in steady state the oldest container is the ever-growing
    accumulated one, and re-rewriting it per micro-batch makes append
    cost O(total). With one big old container and small young
    segments, compact() must merge the small ones and leave the big
    container's generation directory untouched; read-back and
    continuity invariants hold unchanged."""
    import json as _json

    from python_vectordbapp_ceph_spark.operators.shards import compact

    led = str(tmp_path / "led")
    append_segment(spark, led, _docs(spark, 0, 400), BUDGET)       # seg 0: big
    append_segment(spark, led, _docs(spark, 10_000, 10), BUDGET)   # seg 1
    append_segment(spark, led, _docs(spark, 20_000, 10), BUDGET)   # seg 2
    append_segment(spark, led, _docs(spark, 30_000, 10), BUDGET)   # seg 3

    def manifest():
        cdir = os.path.join(led, "_commits")
        names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
        with open(os.path.join(cdir, names[-1])) as f:
            return _json.load(f)["buckets"]

    before = manifest()
    want = {(r.doc_id, r.n_tokens, r.cum, r.shard_id, r.segment)
            for r in read_ledger(spark, led).collect()}

    merged = compact(spark, led, max_segments=2)
    assert merged == 3, "3 smallest merge away, leaving 2 live"

    after = manifest()
    assert after["0"] == before["0"], (
        "the big container was rewritten — compaction must pick by size"
    )
    assert set(after) == {"0", "3"}, after  # target keys max merged id
    spark.catalog.refreshByPath(led)
    got = {(r.doc_id, r.n_tokens, r.cum, r.shard_id, r.segment)
           for r in read_ledger(spark, led).collect()}
    assert got == want, "compaction changed content"

    # continuity: the next append still chains off the global max cum
    append_segment(spark, led, _docs(spark, 40_000, 10), BUDGET)
    spark.catalog.refreshByPath(led)
    rows = sorted(read_ledger(spark, led).collect(), key=lambda r: r.cum)
    prev = 0
    for r in rows:
        assert r.cum == prev + r.n_tokens
        prev = r.cum


def test_bloom_sidecar_scales_with_merged_keys(spark, tmp_path):
    """Compaction must RESIZE the merged container's bloom to its key
    count (m recorded in the sidecar): a fixed-m sidecar saturates as
    containers grow and silently degrades the dedup gate to a
    full-ledger verify per batch. Mixed-m sidecars (a legacy m-less
    one included) must still probe exactly."""
    import python_vectordbapp_ceph_spark.operators.shards as sh

    path = str(tmp_path / "led")
    # ~40k keys >> BLOOM_M/16 (=8192) forces an m above the floor
    append_segment(spark, path, _docs(spark, 0, 30_000), BUDGET)
    append_segment(spark, path, _docs(spark, 100_000, 12_000), BUDGET)
    assert sh.compact(spark, path, max_segments=1) == 2
    spark.catalog.refreshByPath(path)

    cdir = os.path.join(path, "_commits")
    names = sorted(n for n in os.listdir(cdir) if n.endswith(".json"))
    with open(os.path.join(cdir, names[-1])) as f:
        g = list(json.load(f)["buckets"].values())[0]
    side = spark.read.parquet(os.path.join(path, f"gen={g}", "_bloom"))
    m_vals = {r.m for r in side.select("m").distinct().collect()}
    m_big = sh._bloom_m(42_000)
    assert m_vals == {m_big}, m_vals
    assert m_big >= 16 * 42_000, "≥16 bits per key"
    # bitset form: ≤ m/64 (word, bits) rows — the metadata-sized shape
    assert {"word", "bits", "m"} <= set(side.columns)
    assert side.count() <= m_big // 64

    # the resized filter keeps the prune sharp: nearly all genuinely
    # new keys must pass as definite-absent (FPR ≈ 0.1% at 16 bits/key)
    from python_vectordbapp_ceph_spark.operators.bloom import (
        bloom_contains_many,
    )

    fp = bloom_contains_many(
        [(0, side, m_big)],
        _docs(spark, 500_000, 5_000).select("doc_id"),
        "doc_id", sh.BLOOM_K,
    ).count()
    assert fp <= 50, f"saturated filter: {fp}/5000 false positives"

    # gate exactness over MIXED sidecar formats: replace the newest
    # segment's bitset sidecar with a pre-r10 one (position-set, no m
    # column) and dedup a half-overlap across both
    legacy_docs = _docs(spark, 300_000, 1_000)
    append_segment(spark, path, legacy_docs, BUDGET)
    with open(os.path.join(cdir, sorted(
        n for n in os.listdir(cdir) if n.endswith(".json"))[-1])) as f:
        live = json.load(f)["buckets"]
    g_new = live[str(max(int(k) for k in live))]
    bpath = os.path.join(path, f"gen={g_new}", "_bloom")
    import shutil

    from python_vectordbapp_ceph_spark.operators.bloom import bloom_build

    shutil.rmtree(bpath)
    bloom_build(
        legacy_docs.select("doc_id"), "doc_id", sh.BLOOM_K, sh.BLOOM_M
    ).coalesce(1).write.parquet(bpath)

    kept = sorted(
        r.doc_id for r in sh.dedup_against_ledger(
            spark, path, _docs(spark, 300_500, 1_000)
        ).collect()
    )
    assert kept == list(range(301_000, 301_500)), "mixed-format gate inexact"


@pytest.mark.slow
def test_stream_maintenance_cadence(spark, tmp_path):
    """maintenance_every=3 amortizes the in-line compact/vacuum passes:
    the live container count may overshoot max_segments by up to K-1
    between passes (and in a drained stream's unmaintained tail), the
    ledger CONTENT is identical to the every-batch cadence, and the
    next cadence hit restores the policy bound."""
    from python_vectordbapp_ceph_spark.streaming.shard_ingest import (
        stream_append,
    )

    rows = {}
    for name, every in (("k1", 1), ("k3", 3)):
        src = str(tmp_path / f"src_{name}")
        led = str(tmp_path / f"led_{name}")
        for i in range(7):
            _docs(spark, i * 1000, 30).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        q = stream_append(
            spark.readStream.schema("doc_id long, n_tokens long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            led,
            str(tmp_path / f"ckpt_{name}"),
            BUDGET,
            max_segments=2,
            vacuum_keep=2,
            maintenance_every=every,
        )
        assert q.awaitTermination(240)
        spark.catalog.refreshByPath(led)
        rows[name] = {
            (r.doc_id, r.n_tokens) for r in read_ledger(spark, led).collect()
        }
        segs, _, _ = _live_layout(led)
        # K=1: bound exact. K=3: 7 batches -> passes after #3 and #6,
        # batch 7 appends unmaintained -> at most 2 + (3-1)
        cap = 2 if every == 1 else 2 + (every - 1)
        assert len(segs) <= cap, f"{name}: {segs}"
    assert rows["k1"] == rows["k3"], "cadence changed ledger content"
