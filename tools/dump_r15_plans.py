"""Dump `.explain("formatted")` for the round-15 touched queries to
plans/r15/<q>_<suffix>.txt.

Usage: python tools/dump_r15_plans.py <suffix> [outdir] [query ...]
Run from the repo (or worktree) whose plans you want; pass the repo
root whose plans/r15/ should receive the files as outdir.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402
from python_vectordbapp_ceph_spark.queries import QUERIES  # noqa: E402

TOUCHED = [
    # twophase small-plan gate consumers
    "q_rfm_segments", "q_lorenz_deciles", "q_curriculum_order",
    "q_epoch_shuffle", "q_token_shards", "q_mixture_shards",
    "q_shuffle_order", "q_pad_waste", "q_weighted_quantiles",
    "q_auc", "q_quantile_normalize",
    # graph gate single-collect
    "q_graph_components", "q_pagerank", "q_kcore",
    # LSH shared shingles
    "q_lsh_recall", "q_lsh_precision",
    # incremental/merge
    "q_incremental_view", "q_merge_into", "q_merge_time_travel",
    # r15 batch 3+: join/pass eliminations and the Arrow sink
    "q_ngram_novelty", "q_doc_fluency", "q_bigram_lift",
    "q_bm25_topk", "q_hybrid_rrf", "q_hybrid_weighted",
    "q_vector_sink_roundtrip", "q_ivf_batch_search",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "plans", "r15")
    names = sys.argv[3:] or TOUCHED
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans_r15_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "done", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
