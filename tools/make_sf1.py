"""Materialize a ~sf1 scale point: 10 key-shifted copies of the sf0.1
tables, written to /tmp/sfx10 (the driver's testdata tree is
read-only). Dimension tables (region/nation/supplier/part) copy
through unchanged; fact/entity tables get per-copy key offsets so
joins and dedup behave like genuinely bigger data, not 10 identical
shards of the same keys.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from python_vectordbapp_ceph_spark.io import TABLES, load_table  # noqa: E402
from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402

# key columns to shift per copy (offset = copy_index * OFFSET)
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFFSET = 100_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, src, t)
        if t in SHIFT:
            copies = []
            for i in range(n):
                c = df
                for k in SHIFT[t]:
                    c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
                copies.append(c)
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
        else:
            big = df
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
