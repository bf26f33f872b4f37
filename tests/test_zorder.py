"""Z-order layout: the Morton-clustered rewrite must tighten per-file
min/max footer stats so a 2-D range predicate prunes files that a
1-D sorted layout cannot."""

from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators.zorder import (
    file_stats_pruning,
    zorder_key,
    zorder_write,
)

from conftest import SF_DIR


def test_zorder_key_is_morton_interleave(spark):
    # (x=0b10, y=0b01) with 2 bits -> bits: y1 x1 y0 x0 = 0b0110 = 6
    row = (
        spark.range(1)
        .select(
            zorder_key([F.lit(2).cast("long"), F.lit(1).cast("long")], 2).alias("z")
        )
        .collect()[0]
    )
    assert row.z == 6


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """Same data, two layouts: sorted by event_id (1-D) vs z-ordered on
    (event_id, user_id). A selective predicate on user_id — the
    non-sort column — must stats-prune files under the z-order layout
    and nothing under the 1-D layout; a predicate on event_id must
    still prune under z-order (no dimension sacrificed)."""
    from python_vectordbapp_ceph_spark.io import load_table

    e = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    n_files = 8

    linear = str(tmp_path / "linear")
    (
        e.repartitionByRange(n_files, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(e, ["event_id", "user_id"], zpath, bits=10, num_files=n_files)

    # same rows either way
    assert spark.read.parquet(zpath).count() == e.count()

    uid_max = e.agg(F.max("user_id")).collect()[0][0]
    narrow_uid = {"user_id": (0, max(0, uid_max // 8))}
    total_l, match_l = file_stats_pruning(linear, narrow_uid)
    total_z, match_z = file_stats_pruning(zpath, narrow_uid)
    assert total_l == total_z == n_files
    # 1-D layout: user_id spans every file -> no pruning possible
    assert match_l == n_files
    # z-order: the same predicate skips at least half the files
    assert match_z <= n_files // 2, f"z-order pruned only to {match_z}/{n_files}"

    eid_max = e.agg(F.max("event_id")).collect()[0][0]
    narrow_eid = {"event_id": (0, eid_max // 8)}
    _, match_z_eid = file_stats_pruning(zpath, narrow_eid)
    assert match_z_eid <= n_files // 2, "z-order lost event_id pruning"


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A date-partitioned fact joined to a filtered dim triggers DPP:
    the fact scan carries a dynamicpruning subquery on the partition
    column, so only the dim-selected day directories are read — the
    runtime analog of static partition pruning, and the reason
    fact-table layouts partition by join/filter keys at 100 TB."""
    from pyspark.sql import functions as F
    from python_vectordbapp_ceph_spark.io import load_table
    from conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    fact = str(tmp_path / "events_by_day")
    e.write.partitionBy("day").parquet(fact)

    # dim table on disk with a selective predicate column: DPP requires
    # a FILTER on the dim side (a limit/distinct alone won't inject the
    # pruning subquery into the fact scan)
    keep_days = [r.day for r in e.select("day").distinct().orderBy("day").limit(2).collect()]
    dim_path = str(tmp_path / "day_dim")
    (
        e.select("day").distinct()
        .withColumn(
            "tag",
            F.when(F.col("day").isin(keep_days), "keep").otherwise("drop"),
        )
        .write.parquet(dim_path)
    )

    f = spark.read.parquet(fact)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "keep")
    joined = f.join(dim, "day").groupBy("tag").agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # and the result is correct: only rows from the two kept days
    want = e.filter(F.col("day").isin(keep_days)).count()
    got = joined.collect()[0].n
    assert got == want
