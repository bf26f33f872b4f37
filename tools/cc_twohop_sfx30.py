"""r9 verdict ask #5: measure two-hop min-propagation vs the default
one-hop contraction over the sfx30 verified near-dup pair set (the
805M-directed-edge graph the r9 round measured at 402 s).

Materializes the exact-Jaccard pair funnel ONCE to parquet (the
funnel itself is the quadratic verification companion, ~17 min at
sfx30 — not what this experiment measures), then times both
contraction variants in the SAME session and checks label equality.

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
         python tools/cc_twohop_sfx30.py [sf_dir] [pairs_cache]

Protocol notes (what it took to run at this scale on one box):
reliable disk checkpoints (localCheckpoint pins the 805M-edge
symmetrized set in block-manager heap — OOMs even at 64g) and 256
shuffle partitions (32 partitions → 25M-edge unrolls per task).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402
from python_vectordbapp_ceph_spark.cache import release_caches  # noqa: E402
from python_vectordbapp_ceph_spark.operators.dedup import (  # noqa: E402
    dedup_components,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx30"
    cache = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cc_pairs_sfx30.parquet"
    spark = get_spark(app_name="cc_twohop", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(cache):
        from python_vectordbapp_ceph_spark.queries.curation import _cc_pairs

        t0 = time.time()
        _cc_pairs(spark, sf_dir).write.mode("overwrite").parquet(cache)
        release_caches()
        print(f"# funnel materialized in {time.time() - t0:.0f}s")

    pairs = spark.read.parquet(cache)
    n_pairs = pairs.count()

    results = {}
    sums = {}
    for name, flag in (("one_hop", False), ("two_hop", True)):
        ck = f"/tmp/cc_ckpt_{name}"
        import shutil

        shutil.rmtree(ck, ignore_errors=True)
        t0 = time.time()
        comp = dedup_components(pairs, two_hop=flag, checkpoint_dir=ck)
        # checksum forces full evaluation AND pins label equality
        row = comp.selectExpr(
            "count(*) AS n", "sum(comp) AS s", "count(distinct comp) AS d"
        ).collect()[0]
        results[name] = round(time.time() - t0, 1)
        sums[name] = (row.n, row.s, row.d)
        release_caches()
    print(json.dumps({
        "n_pairs": n_pairs,
        "wall_one_hop_sec": results["one_hop"],
        "wall_two_hop_sec": results["two_hop"],
        "labels_equal": sums["one_hop"] == sums["two_hop"],
        "checksum": list(sums["one_hop"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
