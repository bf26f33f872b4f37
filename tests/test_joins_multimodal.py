"""As-of join semantics, multimodal plumbing, plan hygiene."""

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.io import load_table
from python_vectordbapp_ceph_spark.operators.joins import asof_join

from conftest import SF_DIR


def test_asof_join_small_case(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 50), (4, 20, 100)],
        "eid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 200, "b"), (20, 150, "c"), (10, 100, "z")],
        "k long, t long, payload string",
    )
    out = asof_join(
        left, right,
        left_key="k", right_key="k", left_ts="t", right_ts="t",
        payload_cols=["payload"], payload_order="payload",
    )
    got = {r.eid: r.payload for r in out.collect()}
    # eid=1: t=100 → right rows at t<=100 are a/z; tie on t breaks by
    # max payload_order → z. eid=2: t=205 → latest is b.
    # eid=3: t=50 → no match. eid=4: k=20 t=100 < 150 → no match.
    assert got == {1: "z", 2: "b", 3: None, 4: None}


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 60), (3, 10, 300), (4, 99, 100)],
        "eid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 90, "early"), (10, 110, "late")],
        "k long, t long, payload string",
    )
    out = asof_join(
        left, right,
        left_key="k", right_key="k", left_ts="t", right_ts="t",
        payload_cols=["payload"], payload_order="payload",
        direction="nearest",
    )
    got = {r.eid: r.payload for r in out.collect()}
    # eid=1: |100-90| == |110-100| -> tie -> backward match wins.
    # eid=2: only forward candidates -> early. eid=3: only backward -> late.
    # eid=4: no key match at all -> null.
    assert got == {1: "early", 2: "early", 3: "late", 4: None}


def test_date_partitioned_scan_prunes(spark, tmp_path):
    """Year-partitioned layout: a year filter becomes PartitionFilters
    — the scan never opens the other years' files."""
    from python_vectordbapp_ceph_spark.io import load_table
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str

    o = load_table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    o.write.partitionBy("o_year").parquet(path)
    table = spark.read.parquet(path)
    pruned = table.filter(F.col("o_year") == 1996)
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan and "o_year" in plan
    want = o.filter(F.col("o_year") == 1996).count()
    assert pruned.count() == want > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-shuffles at WRITE time:
    the join plan shows no Exchange — at 100 TB this converts every
    recurring join into a local zip of co-located buckets."""
    from python_vectordbapp_ceph_spark.io import load_table
    from python_vectordbapp_ceph_spark.plans.inspect import explain_str

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        o.write.bucketBy(4, "o_custkey").sortBy("o_custkey").mode(
            "overwrite"
        ).saveAsTable("orders_bkt")
        c.write.bucketBy(4, "c_custkey").sortBy("c_custkey").mode(
            "overwrite"
        ).saveAsTable("customer_bkt")
        joined = spark.table("orders_bkt").join(
            spark.table("customer_bkt"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = explain_str(joined, "simple")
        assert "Exchange" not in plan
        assert joined.count() == o.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_salted_join_equals_plain_join(spark):
    """Salting spreads hot keys without changing the result."""
    from python_vectordbapp_ceph_spark.operators.skew import salted_join
    from python_vectordbapp_ceph_spark.io import load_table

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = {(r.o_orderkey, r.c_name) for r in o.join(c, "o_custkey").collect()}
    salted = {(r.o_orderkey, r.c_name)
              for r in salted_join(o, c, on="o_custkey", salt=4).collect()}
    assert salted == plain

    left_plain = o.join(c, "o_custkey", "left").count()
    left_salted = salted_join(o, c, on="o_custkey", how="left", salt=4).count()
    assert left_salted == left_plain


def test_multimodal_fake_decode_and_frames(spark):
    from python_vectordbapp_ceph_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_image_batch,
        extract_image_features,
        frame_sample,
    )

    rows = [
        ("m1", "image", bytearray(b"\x01\x02"), None, None, None, None, {}),
        ("m2", "video", bytearray(b"\x03"), None, None, None, 3500, {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    decoded = decode_image_batch(media, deterministic_fake=True).collect()
    assert {(r.media_id, r.height, r.width, r.channels) for r in decoded} == {
        ("m1", 32, 32, 3), ("m2", 32, 32, 3)
    }
    # deterministic: same content → same checksum across runs
    again = decode_image_batch(media, deterministic_fake=True).collect()
    assert {r.pixel_sum for r in decoded} == {r.pixel_sum for r in again}

    frames = frame_sample(
        media.filter(F.col("modality") == "video"),
        every_ms=1000, deterministic_fake=True,
    ).collect()
    assert len(frames) == 3  # 3500ms // 1000ms
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 1, 2]

    feats = extract_image_features(media).select("media_id", "features").collect()
    assert all(len(r.features) == 512 for r in feats)


def test_stub_decode_raises_without_fake_flag(spark):
    from python_vectordbapp_ceph_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_image_batch,
    )

    media = spark.createDataFrame(
        [("m1", "image", bytearray(b"\x01"), None, None, None, None, {})],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="PIL|NotImplementedError"):
        decode_image_batch(media, deterministic_fake=False).collect()


def test_filter_pushdown_reaches_scan(spark):
    from python_vectordbapp_ceph_spark.plans.inspect import pushed_filters

    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    pushed = pushed_filters(q)
    assert any("l_quantity" in p for p in pushed)


def test_broadcast_join_in_plan(spark):
    from python_vectordbapp_ceph_spark.plans.inspect import has_broadcast_join
    from python_vectordbapp_ceph_spark.queries.relational import q_join_broadcast

    assert has_broadcast_join(q_join_broadcast(spark, SF_DIR))


def test_whole_stage_codegen_detected(spark):
    from python_vectordbapp_ceph_spark.plans.inspect import has_whole_stage_codegen
    from python_vectordbapp_ceph_spark.queries.relational import q_project

    assert has_whole_stage_codegen(q_project(spark, SF_DIR))


def test_route_modalities_dispatch(spark):
    """A3 type dispatch: each row goes through exactly one tower;
    unknown modalities surface as unsupported, not a crash."""
    from python_vectordbapp_ceph_spark.operators.dispatch import route_modalities

    df = spark.createDataFrame(
        [
            ("t1", "text", "hello", bytearray(b"")),
            ("i1", "image", None, bytearray(b"\x01\x02")),
            ("a1", "audio", None, bytearray(b"\x03")),
        ],
        "id string, modality string, text string, content binary",
    )
    out = {r.id: r for r in route_modalities(df).collect()}
    assert len(out["t1"].embedding) == 384 and out["t1"].status == "ok"
    assert len(out["i1"].embedding) == 512 and out["i1"].status == "ok"
    assert out["a1"].embedding is None and out["a1"].status == "unsupported_type"


def test_route_modalities_null_modality_not_dropped(spark):
    """Regression: a NULL modality failed every filter (three-valued
    logic) and the row vanished from the union."""
    from python_vectordbapp_ceph_spark.operators.dispatch import route_modalities

    df = spark.createDataFrame(
        [("n1", None, "text here", bytearray(b""))],
        "id string, modality string, text string, content binary",
    )
    out = route_modalities(df).collect()
    assert len(out) == 1 and out[0].status == "unsupported_type"


def test_catalog_ops(spark, tmp_path):
    from python_vectordbapp_ceph_spark import catalog

    names = catalog.register_table_views(spark, SF_DIR)
    assert "lineitem" in names and catalog.has_table(spark, "lineitem")
    assert "lineitem" in catalog.list_tables(spark)
    desc = {r.col_name: r.data_type
            for r in catalog.describe_table(spark, "embeddings").collect()}
    assert desc["embedding"] == "array<float>"
    catalog.create_collection_table(
        spark, "coll_ddl_test", dim=4, path=str(tmp_path / "ddl")
    )
    assert catalog.has_table(spark, "coll_ddl_test")
    spark.sql("DROP TABLE coll_ddl_test")


def test_embed_text_batch_shape(spark):
    from python_vectordbapp_ceph_spark.embed.embedders import text_embed_udf

    df = spark.createDataFrame([("hello",), ("world",)], "text string")
    out = df.select(text_embed_udf("text").alias("e")).collect()
    assert all(len(r.e) == 384 for r in out)
    # deterministic stub: same text → same vector
    out2 = df.select(text_embed_udf("text").alias("e")).collect()
    assert out[0].e == out2[0].e


def test_asof_tolerance_all_directions(spark):
    """merge_asof tolerance parity: matches farther than the bound are
    nulled in backward, forward (via the negated-micros inner path),
    and nearest (per side, before the nearest pick)."""
    from datetime import datetime

    def ts(day, hour=0):
        return datetime(2024, 1, day, hour)

    left = spark.createDataFrame(
        [(1, ts(10)), (2, ts(20))], "eid long, t timestamp"
    )
    right = spark.createDataFrame(
        [(ts(9), "near_b"), (ts(1), "far_b"), (ts(11), "near_f"),
         (ts(28), "far_f")],
        "t timestamp, payload string",
    ).withColumn("k", F.lit(1))
    left = left.withColumn("k", F.lit(1))

    def run(direction, tol):
        out = asof_join(
            left, right, left_key="k", right_key="k",
            left_ts="t", right_ts="t",
            payload_cols=["payload"], payload_order="payload",
            direction=direction, tolerance_s=tol,
        )
        return {r.eid: r.payload for r in out.collect()}

    day = 86400.0
    # backward: eid=1 latest-before is near_b (1 day); eid=2's latest
    # before Jan-20 is near_f at Jan-11 (9 days) — outside 2 days
    assert run("backward", 2 * day) == {1: "near_b", 2: None}
    assert run("backward", 10 * day) == {1: "near_b", 2: "near_f"}
    # forward: eid=1 next-after is near_f (+1 day); eid=2 next is
    # far_f at Jan-28 (+8 days) — outside 2 days
    assert run("forward", 2 * day) == {1: "near_f", 2: None}
    assert run("forward", 9 * day) == {1: "near_f", 2: "far_f"}
    # nearest with 2-day bound: eid=1 ties broken backward among the
    # two 1-day candidates; everything near eid=2 is out of bounds
    assert run("nearest", 2 * day) == {1: "near_b", 2: None}

    # numeric ts columns reject the seconds-based tolerance
    lnum = spark.createDataFrame([(1, 1, 100)], "eid long, k long, t long")
    rnum = spark.createDataFrame([(1, 90, "p")], "k long, t long, payload string")
    with pytest.raises(ValueError, match="timestamp"):
        asof_join(
            lnum, rnum, left_key="k", right_key="k", left_ts="t",
            right_ts="t", payload_cols=["payload"],
            payload_order="payload", tolerance_s=5.0,
        )
