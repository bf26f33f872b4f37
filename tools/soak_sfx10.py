"""Ledger soak at sfx10 volume (r9 verdict ask #3's evidence row; r11
extends it to 150 batches per the r10 verdict): stream the sfx10
documents table (~600k docs) through stream_append in N micro-batches
with dedup / in-line compaction / retention vacuum all live, then
print one JSON line with the wall, the per-batch trend (first-10 vs
last-10 median and their DRIFT RATIO — the r11 pinned ceiling), and
the final on-disk counts.

Usage: python tools/soak_sfx10.py [sf_dir] [out_dir] [n_files]
       [--defaults] [--condput]

``--condput`` forces the conditional-put publish backend and the
fencing-token epoch lease for the whole run — the S3-protocol soak
twin.

``--defaults`` runs stream_append with DEFAULTS-ONLY knobs (plus
dedup=True, the scenario under test): max_segments stays at its r11
default of 64 and no retention vacuum — the r10 verdict ask #2's
evidence that an operator who tunes NOTHING still gets a bounded live
container count and bounded probe cost from the default compaction.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402
from python_vectordbapp_ceph_spark.operators.shards import read_ledger  # noqa: E402
from python_vectordbapp_ceph_spark.streaming.shard_ingest import (  # noqa: E402
    stream_append,
)

N_FILES = 150
BUDGET = 100_000


def main() -> None:
    global N_FILES
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_sfx10"
    if len(sys.argv) > 3 and not sys.argv[3].startswith("--"):
        N_FILES = int(sys.argv[3])
    defaults_only = "--defaults" in sys.argv
    condput = "--condput" in sys.argv
    maint_every = 1
    for a in sys.argv:
        if a.startswith("--maint-every="):
            maint_every = int(a.split("=", 1)[1])
    if condput:
        # force the conditional-put publish backend + epoch lease for
        # the whole run (the S3-protocol soak twin: every manifest
        # commit is a conditional create, every lease transition an
        # epoch create+verify+GC)
        from python_vectordbapp_ceph_spark.operators.publish import (
            force_publish_backend,
        )

        force_publish_backend("conditional-put")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    src, led, ckpt = f"{out}/src", f"{out}/led", f"{out}/ckpt"

    spark = get_spark(app_name="soak_sfx10")
    spark.sparkContext.setLogLevel("ERROR")
    # recentProgress keeps only the last 100 batches by default — at
    # 150 batches the first-10 walls would silently become batches
    # ~50-60 and the drift ratio would compare mid-run to end-run.
    # Sized from N_FILES (+compaction slack): the fixed 256 of r12
    # silently clipped the 300-batch run the same way.
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(N_FILES + 64)
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            (F.col("n_chars").cast("bigint") / F.lit(4)).cast("bigint")
            .alias("n_tokens"),
        )
        .withColumn("n_tokens", F.greatest(F.col("n_tokens"), F.lit(1)))
    )
    n = docs.count()
    per = n // N_FILES + 1
    # stage N_FILES drop files; every 7th is a full re-delivery of the
    # previous file so the bloom dedup gate does real work
    ordered = docs.withColumn(
        "_f",
        ((F.row_number().over(Window.orderBy("doc_id")) - 1) / per).cast("int"),
    )
    for i in range(N_FILES):
        j = i - 1 if i % 7 == 3 else i
        ordered.filter(F.col("_f") == j).drop("_f").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    knobs = (
        {"dedup": True}  # defaults-only: max_segments=64 (default), no vacuum
        if defaults_only
        else {"max_segments": 8, "vacuum_keep": 2, "dedup": True}
    )
    if maint_every != 1:
        knobs["maintenance_every"] = maint_every
    t0 = time.time()
    q = stream_append(
        spark.readStream.schema("doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        led,
        ckpt,
        BUDGET,
        **knobs,
    )
    ok = q.awaitTermination(3600)
    wall = round(time.time() - t0, 1)
    walls = [p["batchDuration"] for p in q.recentProgress
             if p.get("numInputRows", 0) > 0]

    spark.catalog.refreshByPath(led)
    rows = read_ledger(spark, led)
    n_ledger = rows.count()
    commit_names = sorted(x for x in os.listdir(f"{led}/_commits")
                          if x.startswith("v") and x.endswith(".json"))
    n_commits = len(commit_names)
    n_ckpts = len([x for x in os.listdir(f"{led}/_commits")
                   if x.startswith("_checkpoint.")])
    with open(f"{led}/_commits/{commit_names[-1]}") as f:
        n_live = len(json.load(f)["buckets"])
    # layout counts BEFORE the probes: the vacuum probe below mutates
    # the ledger (the r13 HEAD artifact counted post-vacuum gens while
    # its pre-checkpoint control counted pre-vacuum — disclosed there)
    n_gens = len([x for x in os.listdir(led) if x.startswith("gen=")])
    n_parquet = sum(
        len([f for f in files if f.endswith(".parquet")])
        for root, _, files in os.walk(led)
        if "_commits" not in root
    )

    # --- metadata-plane cost probes (r12 verdict ask #1's evidence):
    # on the SAME final ledger, time describe_history / hint-absent
    # recovery / retention vacuum twice — once through the manifest
    # checkpoint (one checkpoint read + bounded tail; the claim under
    # test is that this stays FLAT as commits grow) and once with the
    # checkpoint blinded (the legacy listing path, O(#commits) reads —
    # the growth curve the checkpoint removes). Vacuum mutates, so it
    # runs LAST and only via the checkpoint.
    from python_vectordbapp_ceph_spark.operators import merge as M

    reads = {"n": 0, "lists": 0}
    real_read_json = M._read_json
    real_list = M._list_commit_versions

    def counting_read(s, p):
        reads["n"] += 1
        return real_read_json(s, p)

    def counting_list(s, p):
        reads["lists"] += 1
        return real_list(s, p)

    def timed(fn):
        reads["n"], reads["lists"] = 0, 0
        t = time.time()
        fn()
        return round(time.time() - t, 3), reads["n"], reads["lists"]

    has_ckpt = hasattr(M, "_read_checkpoint")  # False on the pre-
    # checkpoint package when this tool runs as a worktree A/B control
    if has_ckpt:
        M._read_json = counting_read
        M._list_commit_versions = counting_list
        try:
            hist_ckpt = timed(
                lambda: M.describe_history(spark, led).collect()
            )
            real_ckpt = M._read_checkpoint
            M._read_checkpoint = lambda s, p: None
            hist_legacy = timed(
                lambda: M.describe_history(spark, led).collect()
            )
            M._read_checkpoint = real_ckpt
            hint = f"{led}/_commits/_latest"
            hint_bytes = open(hint, "rb").read()
            os.remove(hint)
            recov_ckpt = timed(lambda: M._current_version(spark, led))
            M._read_checkpoint = lambda s, p: None
            recov_legacy = timed(lambda: M._current_version(spark, led))
            M._read_checkpoint = real_ckpt
            with open(hint, "wb") as f:
                f.write(hint_bytes)
            vacuum_ckpt = timed(
                lambda: M.vacuum(spark, led, keep_versions=2)
            )
        finally:
            M._read_json = real_read_json
            M._list_commit_versions = real_list

        def _probe(t):
            return {"sec": t[0], "json_reads": t[1], "dir_listings": t[2]}

        meta_probes = {
            "n_commits_at_probe": n_commits,
            "history_ckpt": _probe(hist_ckpt),
            "history_legacy": _probe(hist_legacy),
            "recovery_ckpt": _probe(recov_ckpt),
            "recovery_legacy": _probe(recov_legacy),
            "vacuum_keep2_ckpt": _probe(vacuum_ckpt),
        }
    else:
        meta_probes = None
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    head, tail = med(walls[:10]), med(walls[-10:])
    # attribute the drift: batch i is a FULL REDELIVERY iff i % 7 == 3
    # (file order == batch order under maxFilesPerTrigger=1). Fresh
    # batches' key ranges are disjoint from all committed history, so
    # the r11 zonemap skips their bloom probe entirely — their trend
    # isolates the append+compact cost; redelivery batches owe the
    # verify against ever-larger compacted containers.
    fresh = [w for i, w in enumerate(walls) if i % 7 != 3]
    redel = [w for i, w in enumerate(walls) if i % 7 == 3]
    print(json.dumps({
        "drained": ok,
        "wall_sec": wall,
        "n_batches": len(walls),
        "docs_in": n,
        "docs_ledger": n_ledger,
        "first10_median_ms": head,
        "last10_median_ms": tail,
        "drift_ratio": round(tail / max(head, 1), 3),
        "fresh_first10_ms": med(fresh[:10]),
        "fresh_last10_ms": med(fresh[-10:]),
        "fresh_drift_ratio": round(
            med(fresh[-10:]) / max(med(fresh[:10]), 1), 3
        ),
        "redelivery_median_ms": med(redel) if redel else None,
        "n_commits": n_commits,
        "n_checkpoints": n_ckpts,
        "metadata_probes": meta_probes,
        "n_live_containers": n_live,
        "n_gens": n_gens,
        "n_parquet_files": n_parquet,
        "defaults_only": defaults_only,
        "condput": condput,
        "maintenance_every": maint_every,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
