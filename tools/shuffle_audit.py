"""Measure, don't guess: per-query shuffle-write volume at sf0.1.

Runs each headline query end-to-end (noop sink) and attributes the
delta in total shuffle-write bytes / spill from Spark's status REST API
(/api/v1/applications/{app}/stages) to that query. Output is the
markdown table kept in tools/plans_appendix.md — the measured form of
the 'one shuffle, broadcast the rest' claims the plan dumps make.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

from python_vectordbapp_ceph_spark.queries import QUERIES  # noqa: E402
from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q_agg_group", "q_join_inner", "q_join_broadcast", "q_join_asof",
    "q_topk_global", "q_knn_topk", "q_dedup_exact", "q_dedup_near",
    "q_tpch_q3_shape", "q_tpch_q6", "q_tpch_q18", "q_tfidf_topk",
    "q_winsorize", "q_shuffle_order", "q_distinctive_terms",
    "q_gopher_rules", "q_doc_fingerprint", "q_hybrid_rrf",
    "q_join_asof_tolerance", "q_bm25_topk",
]


def _stage_totals(api: str, app_id: str) -> tuple[int, int, int]:
    url = f"{api}/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    names = [a for a in args if a.startswith("q_")] or DEFAULT
    spark = get_spark(
        app_name="shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit("Spark UI disabled — status API unavailable")
    api = spark.sparkContext.uiWebUrl + "/api/v1"
    app_id = spark.sparkContext.applicationId

    # warmup (file listings, codegen) outside the measurement
    QUERIES["q_limit"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    print("| query | shuffle write | spilled | shuffled rows |")
    print("|---|---|---|---|")
    for name in names:
        before = _stage_totals(api, app_id)
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        after = _stage_totals(api, app_id)
        dw, dsp, drec = (a - b for a, b in zip(after, before))

        def mb(x: int) -> str:
            return f"{x / 1048576:.1f} MiB" if x >= 1048576 else f"{x / 1024:.0f} KiB"

        print(f"| {name} | {mb(dw)} | {mb(dsp)} | {drec:,} |")


if __name__ == "__main__":
    main()
