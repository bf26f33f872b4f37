"""Round-14 optimization profiling: per-query warm wall + Spark JOB
COUNT for the headline bench set (job count ≈ scheduling overhead —
a 2 s query made of 14 tiny jobs is loop/action-bound, not data-bound,
and the fix is fewer actions, not faster stages).

Usage: python tools/profile_r14.py [sf_dir] [query ...]
Writes JSON lines to stdout; one record per query:
  {"q": name, "cold": s, "warm": s, "jobs_warm": n}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402
from python_vectordbapp_ceph_spark.queries import QUERIES  # noqa: E402
from python_vectordbapp_ceph_spark.operators.dedup import release_caches  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        import bench

        names = bench.HEADLINE
    spark = get_spark(app_name="profile_r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup
    QUERIES["q_limit"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    QUERIES["q_tpch_q6"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = []
    for name in names:
        fn = QUERIES[name]
        runs, jobs = [], []
        for i in range(2):
            group = f"{name}#{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            jobs.append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
            release_caches()
        rec = {"q": name, "cold": runs[0], "warm": runs[1],
               "jobs_warm": jobs[1]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    total = round(sum(r["warm"] for r in out), 3)
    print(json.dumps({"warm_total": total, "n": len(out)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
