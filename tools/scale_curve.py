"""Scaling-behavior probe: time representative queries across the
three scale factors and report the growth exponent.

    python tools/scale_curve.py [q_agg_group q_dedup_exact ...]

For each query, prints per-SF wall time and alpha = log(t_hi/t_lo) /
log(sf_hi/sf_lo) over the sf0.01→sf0.1 step (the 0.001→0.01 step is
dominated by fixed overhead at these sizes). alpha ≈ 0 means
overhead-bound, ≈ 1 linear, ≈ 2 quadratic. Evidence for the
would-this-survive-100× question PLANS.md argues qualitatively.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_vectordbapp_ceph_spark.operators.dedup import release_caches  # noqa: E402
from python_vectordbapp_ceph_spark.queries import QUERIES  # noqa: E402
from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402

SFS = [("0.001", "/root/testdata/sf0.001"),
       ("0.01", "/root/testdata/sf0.01"),
       ("0.1", "/root/testdata/sf0.1")]
# extra scale points from tools/make_sf1.py, included when present
if os.path.isdir("/tmp/sfx10/lineitem.parquet"):
    SFS.append(("1(x10)", "/tmp/sfx10"))
if os.path.isdir("/tmp/sfx30/lineitem.parquet"):
    # second decade; NOTE the key-shift clone caveat for similarity-
    # family queries (tools/plans_appendix.md round-9 section)
    SFS.append(("3(x30)", "/tmp/sfx30"))

DEFAULT = [
    "q_agg_group",       # scan+agg: expect ~linear
    "q_join_inner",      # fact-dim join chain
    "q_dedup_exact",     # hash dedup
    "q_knn_topk",        # brute KNN
    "q_token_stats",     # per-row text expressions
    "q_doc_fingerprint", # Arrow kernel
    "q_window_rank",     # partitioned window
    "q_jaccard_pairs",   # blocked quadratic verify (expect alpha>1)
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + codegen on the smallest SF so sf0.001 numbers aren't
    # all session startup
    for n in names:
        QUERIES[n](spark, SFS[0][1]).write.format("noop").mode("overwrite").save()
        release_caches()

    print(
        f"{'query':24s} " + "".join(f"sf{s:<8s}" for s, _ in SFS)
        + f"alpha({SFS[-2][0]}→{SFS[-1][0]})"
    )
    for n in names:
        ts = []
        for _, d in SFS:
            t0 = time.time()
            QUERIES[n](spark, d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            release_caches()
        alpha = math.log(ts[-1] / ts[-2]) / math.log(10.0)
        print(f"{n:24s} " + "".join(f"{t:<10.2f}" for t in ts) + f"{alpha:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
