"""Custom DataSource writer (sources/vector_sink.py): two-phase
commit contract — staged files, manifest visibility, abort cleanup."""

import json
import os

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.sources.vector_sink import (
    read_manifest,
    register_vector_sink,
)


def test_vector_put_sink_commit(spark, tmp_path):
    register_vector_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.array(F.lit(0.1), F.lit(0.2)).alias("data"),
        F.create_map(F.lit("bucket"), F.lit("docs")).alias("metadata"),
    )
    df.write.format("vector_put").option("path", out).mode("append").save()

    manifest = read_manifest(out)
    assert manifest["rows"] == 100
    files = [f for f in os.listdir(out) if f.startswith("part_")]
    assert sorted(files) == manifest["files"]
    assert not any(f.startswith("_tmp_") for f in os.listdir(out))

    # rows round-trip with the reference's put_vectors shape
    recs = []
    for fn in files:
        with open(os.path.join(out, fn)) as f:
            recs += [json.loads(line) for line in f]
    assert len(recs) == 100
    assert {r["key"] for r in recs} == {f"k{i}" for i in range(100)}
    assert recs[0]["metadata"] == {"bucket": "docs"}


def test_vector_put_sink_task_failure_stages_no_visible_rows(spark, tmp_path):
    """A failing write job must not leave a manifest (the visibility
    point) behind; staged temp files are aborted."""
    register_vector_sink(spark)
    out = str(tmp_path / "sink_fail")

    @F.udf("string")
    def boom(key):
        raise RuntimeError("injected task failure")

    df = spark.range(10).select(boom(F.col("id").cast("string")).alias("key"))
    with pytest.raises(Exception):
        df.write.format("vector_put").option("path", out).mode("append").save()
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))
    if os.path.exists(out):
        assert not [f for f in os.listdir(out) if f.startswith("part_")]


def test_vector_put_sink_requires_path(spark):
    register_vector_sink(spark)
    with pytest.raises(Exception):
        spark.range(1).write.format("vector_put").mode("append").save()
