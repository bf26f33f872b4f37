"""Source connectors (A1/A2/A4/C1): JSON events, CSV, whole-text,
binary files — write a fixture, read through the connector, check."""

import json

import pytest

from pyspark.sql import types as T

from python_vectordbapp_ceph_spark.sources.readers import (
    read_binary_files,
    read_csv,
    read_json_events,
    read_text_objects,
)


def test_read_json_events(spark, tmp_path):
    p = tmp_path / "events.json"
    p.write_text("\n".join(json.dumps({"k": k, "n": i}) for i, k in enumerate("abc")))
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("n", T.LongType())])
    df = read_json_events(spark, str(p), schema)
    assert {(r.k, r.n) for r in df.collect()} == {("a", 0), ("b", 1), ("c", 2)}


def test_read_csv(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert {(r.a, r.b) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_read_text_objects_whole(spark, tmp_path):
    """One row per object — the reference's UTF-8 decode of a fetched
    object body (pythonvectordbceph.py:160)."""
    d = tmp_path / "objs"
    d.mkdir()
    (d / "o1.txt").write_text("hello\nworld")
    (d / "o2.txt").write_text("zweite datei")
    df = read_text_objects(spark, str(d), whole=True)
    vals = {r.value for r in df.collect()}
    assert vals == {"hello\nworld", "zweite datei"}


def test_stream_json_events(spark, tmp_path):
    """Streaming file-arrival source over notification JSON (A1)."""
    import json as _json

    from python_vectordbapp_ceph_spark.sources.readers import stream_json_events

    d = tmp_path / "stream_events"
    d.mkdir()
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("n", T.LongType())])
    (d / "a.json").write_text("\n".join(
        _json.dumps({"k": k, "n": i}) for i, k in enumerate("abc")))
    stream = stream_json_events(spark, str(d), schema)
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("json_stream_test")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300), "stream did not finish in 300s"
    assert spark.sql("SELECT count(*) AS n FROM json_stream_test").first().n == 3


def test_media_table_from_binary_files(spark, tmp_path):
    from python_vectordbapp_ceph_spark.multimodal.binary import (
        media_table_from_binary_files,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "x.img").write_bytes(b"\x01\x02")
    media = media_table_from_binary_files(spark, str(d), modality="image")
    rows = media.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.modality == "image" and bytes(r.content) == b"\x01\x02"
    assert r.media_id.endswith("x.img") and r.tags == {}


def test_s3events_python_datasource(spark):
    """Spark 4 Python DataSource: partition-parallel, deterministic,
    schema-stable custom connector for the notification feed."""
    from python_vectordbapp_ceph_spark.sources.event_source import register

    register(spark)
    df = spark.read.format("s3events").option("n", 120).option("numPartitions", 3).load()
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 120
    assert set(df.columns) == {"bucket", "key", "event_name", "event_ts", "tags"}
    ops = {r.event_name for r in df.select("event_name").distinct().collect()}
    assert ops <= {"ObjectCreated:Put", "ObjectCreated:Copy", "ObjectRemoved:Delete"}
    again = spark.read.format("s3events").option("n", 120).option("numPartitions", 3).load()
    assert sorted(map(str, df.collect())) == sorted(map(str, again.collect()))


def test_orc_roundtrip(spark, tmp_path):
    from python_vectordbapp_ceph_spark.io import load_table
    from python_vectordbapp_ceph_spark.sources.readers import read_orc

    from conftest import SF_DIR

    nation = load_table(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_orc")
    nation.write.orc(p)
    back = read_orc(spark, p)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_read_binary_files_with_glob(spark, tmp_path):
    d = tmp_path / "bin"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x01\x02\x03")
    (d / "b.txt").write_bytes(b"nope")
    df = read_binary_files(spark, str(d), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"\x01\x02\x03"
    assert rows[0].length == 3


@pytest.mark.slow
def test_s3events_streaming_reader_drains_and_matches_batch(spark, tmp_path):
    """readStream over the same DataSource: the stream drains the
    capped feed in batchSize chunks with checkpointed offsets, and the
    union of micro-batches equals the batch read exactly (no loss, no
    duplication). A restart from the same checkpoint emits nothing new."""
    import time

    from python_vectordbapp_ceph_spark.sources.event_source import register

    register(spark)
    opts = {"n": "40", "batchSize": "16", "seed": "7"}
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start():
        reader = spark.readStream.format("s3events")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def n_out():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0  # sink dir empty until the first batch commits

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and n_out() < 40:
        time.sleep(0.5)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 40

    batch = spark.read.format("s3events").options(**opts).load()
    assert set(map(tuple, got.drop("tags").collect())) == set(
        map(tuple, batch.drop("tags").collect())
    )

    # restart from the committed checkpoint: feed is drained — the
    # file-sink log must show no new rows (exactly-once, no replay)
    q2 = start()
    time.sleep(5)
    q2.stop()
    assert spark.read.parquet(out).count() == 40


def test_schema_evolution_merge_read(spark, tmp_path):
    """Long-lived datasets evolve: files written before a column was
    added must read as null under mergeSchema, and filters on the new
    column must not resurrect or drop old rows incorrectly."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, "c", 1.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 1.5}
    # predicate on the evolved column: old files contribute no matches
    # but survive an IS NULL scan
    assert merged.filter("score > 1").count() == 1
    assert merged.filter("score is null").count() == 2

