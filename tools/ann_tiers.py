"""ANN compression-tier comparison: flat (exact) vs BQ vs SQ8 vs PQ.

For a fixed query sample, measures each tier's
  - recall@5 against exact brute force,
  - candidate-stage bytes (the per-row code footprint the first-pass
    scan reads — the column a 100 TB scan is actually bounded by),
  - mean per-query latency at this SF (overhead-dominated locally;
    the bytes column is the scale signal).

Usage: python tools/ann_tiers.py [sf_dir] [n_queries]
Prints a markdown table (paste into PLANS.md) + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from python_vectordbapp_ceph_spark.io import load_table  # noqa: E402
from python_vectordbapp_ceph_spark.operators.bq import (  # noqa: E402
    bq_encode,
    bq_search,
    fit_bq,
)
from python_vectordbapp_ceph_spark.operators.knn import knn_topk  # noqa: E402
from python_vectordbapp_ceph_spark.operators.pq import (  # noqa: E402
    fit_pq,
    pq_encode,
    pq_search,
)
from python_vectordbapp_ceph_spark.operators.sq import (  # noqa: E402
    fit_sq8,
    sq8_encode,
    sq8_search,
)
from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402

K = 5
DIM = 64


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark(app_name="ann-tiers")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_rows = emb.count()

    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]

    bq_params = fit_bq(emb, "embedding", DIM)
    bq_enc = bq_encode(emb, "embedding", bq_params).cache()
    bq_enc.count()
    sq_params = fit_sq8(emb, "embedding", DIM)
    sq_enc = sq8_encode(emb, sq_params, "embedding").cache()
    sq_enc.count()
    books = fit_pq(emb, "embedding", DIM, m=8, k=16)
    pq_enc = pq_encode(emb, books, "embedding").cache()
    pq_enc.count()

    # per-row candidate-scan footprint in bytes
    footprint = {
        "flat": DIM * 4,              # float32 vector
        "bq": (DIM // 64) * 8,        # packed sign bits
        "sq8": DIM,                   # one byte per dim
        "pq": 8,                      # m=8 subspace codes
    }

    def run(tier, one_query):
        hits, t_total = 0, 0.0
        for qid, qv in queries:
            t0 = time.time()
            got = [r["vec_id"] for r in one_query(qv).collect()]
            t_total += time.time() - t0
            exact = [r["vec_id"] for r in knn_topk(emb, qv, K).collect()]
            hits += len(set(got) & set(exact))
        return hits / (K * len(queries)), t_total / len(queries)

    tiers = {
        "flat": lambda qv: knn_topk(emb, qv, K),
        "bq": lambda qv: bq_search(bq_enc, qv, bq_params, k=K, refine_factor=8),
        "sq8": lambda qv: sq8_search(sq_enc, emb, sq_params, qv, K, refine_factor=4),
        "pq": lambda qv: pq_search(pq_enc, emb, books, qv, K, refine_factor=8),
    }

    print(f"rows={n_rows} dim={DIM} k={K} queries={n_queries} sf_dir={sf_dir}\n")
    print("| tier | recall@5 | mean latency (s) | bytes/row (scan) | vs flat |")
    print("|---|---|---|---|---|")
    out = {}
    for name, fn in tiers.items():
        rec, lat = run(name, fn)
        bytes_row = footprint[name]
        out[name] = {"recall": round(rec, 3), "latency_s": round(lat, 3),
                     "bytes_row": bytes_row}
        print(
            f"| {name} | {rec:.3f} | {lat:.3f} | {bytes_row} |"
            f" {footprint['flat'] / bytes_row:.0f}× smaller |"
        )
    print()
    print(json.dumps({"metric": "ann_tiers", "sf_dir": sf_dir, "tiers": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
