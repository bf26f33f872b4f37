"""IVF recall/latency curve — the reference's actual tuning knob
(milvus-app/pythonvectordbceph_milvus.py:101 sets nlist=16384; clients
trade recall for latency via nprobe).

Builds the partitioned on-disk IVF layout at the given SF, then for
nprobe ∈ {1,2,4,8} measures, over a fixed query sample:
  - recall@5 against the exact brute-force top-k,
  - mean probe latency (fresh scan per query, cold-plan shape),
  - bytes read from disk vs the full index (partition pruning ratio).

Usage: python tools/ivf_curve.py [sf_dir] [nlist]
Prints a markdown table (paste into PLANS.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from python_vectordbapp_ceph_spark.io import load_table  # noqa: E402
from python_vectordbapp_ceph_spark.operators.ivf import (  # noqa: E402
    IVFIndex,
    build_ivf,
    write_partitioned,
)
from python_vectordbapp_ceph_spark.operators.knn import knn_topk  # noqa: E402
from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k, n_queries = 5, 20

    spark = get_spark(app_name="ivf-curve")
    emb = load_table(spark, sf_dir, "embeddings")

    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]

    index = build_ivf(emb, nlist=nlist)
    path = "/tmp/ivf_curve_index"
    write_partitioned(index, path)
    total_bytes = dir_bytes(path)
    on_disk = IVFIndex(
        assigned=spark.read.parquet(path),
        centroids=index.centroids,
        vec_col="embedding",
        id_col="vec_id",
    )

    # exact ground truth per query (brute force, excluding nothing)
    truth = {}
    for qid, qv in queries:
        truth[qid] = {
            r["vec_id"] for r in knn_topk(emb, qv, k=k).collect()
        }

    print(f"IVF curve: sf={sf_dir} nlist={nlist} k={k} queries={n_queries} "
          f"index={total_bytes/1e6:.1f} MB")
    print("| nprobe | recall@5 | mean latency (s) | bytes read | % of index |")
    print("|---|---|---|---|---|")
    results = {}
    for nprobe in (1, 2, 4, 8):
        hits = 0
        read_bytes = 0
        t0 = time.time()
        for qid, qv in queries:
            probes = on_disk.probe_clusters(qv, nprobe)
            got = {r["vec_id"] for r in on_disk.search(qv, k=k, nprobe=nprobe).collect()}
            hits += len(got & truth[qid])
            read_bytes += sum(
                dir_bytes(os.path.join(path, f"cluster_id={c}")) for c in probes
            )
        dt = (time.time() - t0) / n_queries
        recall = hits / (k * n_queries)
        frac = read_bytes / (total_bytes * n_queries)
        results[nprobe] = {
            "recall_at_5": round(recall, 4),
            "mean_latency_s": round(dt, 3),
            "scan_fraction": round(frac, 4),
        }
        print(f"| {nprobe} | {recall:.3f} | {dt:.3f} | "
              f"{read_bytes/n_queries/1e6:.2f} MB/query | {frac*100:.1f}% |")

    print(json.dumps({"sf_dir": sf_dir, "nlist": nlist, "curve": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
