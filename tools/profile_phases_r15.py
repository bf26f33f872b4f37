"""Round-15 phase profiler for the two r14 wall regressions
(q_incremental_view, q_kcore): time each protocol phase separately so
the fix targets the phase that actually moved, not the job count.

Usage: python tools/profile_phases_r15.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402
from python_vectordbapp_ceph_spark.queries import QUERIES  # noqa: E402
from python_vectordbapp_ceph_spark.queries._common import T  # noqa: E402
from python_vectordbapp_ceph_spark.operators.dedup import release_caches  # noqa: E402


def t(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def profile_incremental(spark, sf_dir: str) -> dict:
    from python_vectordbapp_ceph_spark.operators.incremental import (
        apply_delta, init_agg_view, read_view,
    )

    o = T(spark, sf_dir, "orders")
    path = os.path.join(
        tempfile.gettempdir(), f"ivm_prof_{os.getpid()}_{time.time_ns()}", "view"
    )
    rec = {}
    rec["init"], _ = t(lambda: init_agg_view(
        o.select(F.col("o_custkey").alias("custkey"), "o_totalprice"),
        ["custkey"], "o_totalprice", path, n_buckets=16,
    ))
    inserts = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_custkey").alias("custkey"), "o_totalprice",
        F.lit(1).alias("sign"),
    )
    deletes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_custkey").alias("custkey"), "o_totalprice",
        F.lit(-1).alias("sign"),
    )
    rec["delta1"], _ = t(lambda: apply_delta(
        spark, path, inserts, ["custkey"], "o_totalprice", n_buckets=16))
    rec["delta2"], _ = t(lambda: apply_delta(
        spark, path, deletes, ["custkey"], "o_totalprice", n_buckets=16))
    rec["read_noop"], _ = t(lambda: read_view(spark, path)
                            .write.format("noop").mode("overwrite").save())
    rec["total"] = round(sum(rec.values()), 3)
    release_caches()
    return rec


def profile_kcore(spark, sf_dir: str) -> dict:
    from python_vectordbapp_ceph_spark.cache import materialize
    from python_vectordbapp_ceph_spark.operators.graph import (
        _symmetrize_driver,
    )

    li = T(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"),
                 F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    rec = {}
    p0 = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    rec["materialize"], p0 = t(lambda: materialize(p0, None))
    rec["count"], n = t(lambda: p0.count())
    rec["n_pairs"] = n
    rec["toPandas"], pdf = t(lambda: p0.toPandas())
    rec["symmetrize"], tri = t(lambda: _symmetrize_driver(pdf))
    ids, si, di = tri

    def peel():
        import numpy as np
        k = 3
        while True:
            if len(si2[0]) == 0:
                return None
            deg = np.bincount(si2[0], minlength=len(ids))
            weak = (deg > 0) & (deg < k)
            if not weak.any():
                return None
            bad = weak[si2[0]] | weak[si2[1]]
            si2[0], si2[1] = si2[0][~bad], si2[1][~bad]

    si2 = [si, di]
    rec["peel"], _ = t(peel)
    import numpy as np
    survivors = ids[np.flatnonzero(np.bincount(si2[0], minlength=len(ids)))]
    rec["n_survivors"] = int(len(survivors))
    import pandas as pd
    rec["createDF_noop"], _ = t(
        lambda: spark.createDataFrame(
            pd.DataFrame({"id": survivors}), "id bigint"
        ).orderBy("id").write.format("noop").mode("overwrite").save()
    )
    rec["total"] = round(sum(v for k, v in rec.items()
                             if not k.startswith("n_")), 3)
    release_caches()
    return rec


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 2
    spark = get_spark(app_name="profile_phases_r15")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_limit"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    QUERIES["q_tpch_q6"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for i in range(reps):
        print(json.dumps({"q": "q_incremental_view", "rep": i,
                          **profile_incremental(spark, sf_dir)}), flush=True)
    for i in range(reps):
        print(json.dumps({"q": "q_kcore", "rep": i,
                          **profile_kcore(spark, sf_dir)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
