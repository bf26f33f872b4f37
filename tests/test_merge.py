"""Partition-pruned MERGE: correctness + on-disk footprint (only
affected buckets rewritten; all-deleted buckets removed)."""

import os

from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.merge import (
    merge_into,
    read_base,
    write_bucketed_base,
)

N_BUCKETS = 8


def _base_rows(spark):
    return spark.createDataFrame(
        [(f"k{i}", i * 10, 0) for i in range(40)], "key string, val long, ts long"
    )


def _list_partition_files(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("_kb="):
            full = os.path.join(path, d)
            out[d] = sorted(os.listdir(full))
    return out


def test_merge_correctness_and_footprint(spark, tmp_path):
    path = str(tmp_path / "base")
    write_bucketed_base(_base_rows(spark), path, "key", N_BUCKETS)
    before = _list_partition_files(path)

    changes = spark.createDataFrame(
        [("k1", 111, 1, "upsert"),     # update
         ("k2", 0, 1, "delete"),       # delete
         ("new1", 999, 1, "upsert")],  # insert
        "key string, val long, ts long, op string",
    )
    touched = merge_into(spark, path, changes, key_col="key", ts_col="ts",
                         n_buckets=N_BUCKETS)
    assert 0 < len(touched) <= 3

    after = _list_partition_files(path)
    untouched = [d for d in before
                 if int(d.split("=")[1]) not in touched]
    assert untouched, "expected some buckets untouched"
    for d in untouched:  # identical files on disk
        assert before[d] == after[d]

    got = {(r.key, r.val) for r in read_base(spark, path).collect()}
    want = {(f"k{i}", i * 10) for i in range(40) if i not in (1, 2)}
    want |= {("k1", 111), ("new1", 999)}
    assert got == want


def test_merge_change_beats_base_on_ts_tie(spark, tmp_path):
    path = str(tmp_path / "base")
    spark_df = spark.createDataFrame([("a", 1, 5)], "key string, val long, ts long")
    write_bucketed_base(spark_df, path, "key", N_BUCKETS)
    changes = spark.createDataFrame(
        [("a", 2, 5, "upsert")], "key string, val long, ts long, op string"
    )
    merge_into(spark, path, changes, key_col="key", ts_col="ts", n_buckets=N_BUCKETS)
    assert [(r.key, r.val) for r in read_base(spark, path).collect()] == [("a", 2)]


def test_merge_empties_fully_deleted_bucket(spark, tmp_path):
    path = str(tmp_path / "base")
    one = spark.createDataFrame([("solo", 7, 0)], "key string, val long, ts long")
    write_bucketed_base(one, path, "key", N_BUCKETS)
    changes = spark.createDataFrame(
        [("solo", 0, 1, "delete")], "key string, val long, ts long, op string"
    )
    merge_into(spark, path, changes, key_col="key", ts_col="ts", n_buckets=N_BUCKETS)
    assert not any(d.startswith("_kb=") for d in os.listdir(path))
    empty = read_base(spark, path, schema="key string, val long, ts long, _kb int")
    assert empty.count() == 0
