"""`_commits/_latest` pointer — O(1)-in-history version resolution
(r11 verdict next-round #3: every append listed `_commits/` to find
the current version, O(#commits-ever) per batch on a defaults-only
stream; the measured fresh drift was 1.48× at 194 commits vs 1.04×
with retention armed).

The pointer is a HINT, never an authority: these tests pin that every
failure mode — absent, torn, stale-behind (crash between publish and
hint refresh), pointing at a vacuumed commit — resolves to exactly
what the listing would have said.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.operators import merge as M
from python_vectordbapp_ceph_spark.operators import shards as S


def _mk_base(spark, path, n_commits):
    df = spark.range(20).select(
        F.col("id").alias("key"),
        F.lit(0).alias("v"),
        F.lit(0).cast("timestamp").alias("ts"),
    )
    M.write_bucketed_base(df, path, "key", n_buckets=2)
    for i in range(1, n_commits):
        ch = spark.range(5).select(
            F.col("id").alias("key"),
            F.lit(i).alias("v"),
            F.lit(i).cast("timestamp").alias("ts"),
            F.lit("upsert").alias("op"),
        )
        M.merge_into(spark, path, ch, "key", "ts", n_buckets=2)


def _listing_version(spark, path):
    listed = M._list_commit_versions(spark, path)
    return listed[-1][0] if listed else None


def _latest_file(path):
    return f"{path}/{M._COMMITS}/{M._LATEST}"


def test_pointer_matches_listing_after_each_commit(spark, tmp_path):
    path = str(tmp_path / "base")
    _mk_base(spark, path, 4)
    assert _listing_version(spark, path) == 3
    assert M._current_version(spark, path) == 3
    hint = json.loads(open(_latest_file(path)).read())
    assert hint["version"] == 3


def test_absent_pointer_falls_back_to_listing(spark, tmp_path):
    path = str(tmp_path / "base")
    _mk_base(spark, path, 3)
    os.remove(_latest_file(path))
    for p in (f"{path}/{M._COMMITS}/.{M._LATEST}.crc",):
        if os.path.exists(p):
            os.remove(p)
    assert M._current_version(spark, path) == _listing_version(spark, path) == 2


def test_torn_pointer_falls_back_to_listing(spark, tmp_path):
    path = str(tmp_path / "base")
    _mk_base(spark, path, 3)
    with open(_latest_file(path), "w") as f:
        f.write('{"version"')  # torn mid-write
    crc = f"{path}/{M._COMMITS}/.{M._LATEST}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    assert M._current_version(spark, path) == 2


def test_stale_behind_pointer_forward_probes(spark, tmp_path):
    """Crash between publish and hint refresh: the hint lags the
    commits. Resolution must forward-probe to the true head — this is
    the crash-recovery case, O(lag) existence checks, no listing."""
    path = str(tmp_path / "base")
    _mk_base(spark, path, 5)
    with open(_latest_file(path), "w") as f:
        json.dump({"version": 1}, f)
    crc = f"{path}/{M._COMMITS}/.{M._LATEST}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    assert M._current_version(spark, path) == 4
    v, live = M.current_manifest(spark, path)
    assert v == 4 and live


def test_pointer_at_vacuumed_commit_falls_back(spark, tmp_path):
    """A pointer left behind by a crashed writer may reference a
    commit the retention window has since reclaimed — resolution must
    fall back to the listing, never raise or resolve stale."""
    path = str(tmp_path / "base")
    _mk_base(spark, path, 5)
    with open(_latest_file(path), "w") as f:
        json.dump({"version": 0}, f)
    crc = f"{path}/{M._COMMITS}/.{M._LATEST}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    M.vacuum(spark, path, keep_versions=2)  # reclaims v0..v2
    assert not os.path.exists(f"{path}/{M._COMMITS}/{M._commit_file(0)}")
    assert M._current_version(spark, path) == 4


def test_append_segment_uses_pointer_not_listing(spark, tmp_path, monkeypatch):
    """The append hot path must resolve through the hint: with a fresh
    pointer present, no `_commits/` listing runs."""
    path = str(tmp_path / "ledger")
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    S.append_segment(spark, path, docs, budget=50)
    calls = []
    orig = M._list_commit_versions
    monkeypatch.setattr(
        M, "_list_commit_versions",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    more = spark.range(10, 20).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    assert S.append_segment(spark, path, more, budget=50) == 1
    assert calls == [], "append listed _commits/ despite a fresh pointer"
    # and the ledger content is exact either way
    assert S.read_ledger(spark, path).count() == 20


def test_time_travel_and_history_unaffected(spark, tmp_path):
    path = str(tmp_path / "base")
    df = spark.range(10).select(
        F.col("id").alias("key"), F.lit(0).alias("v"),
        F.lit(0).cast("timestamp").alias("ts"),
    )
    M.write_bucketed_base(df, path, "key", n_buckets=2)
    ch = spark.range(3).select(
        F.col("id").alias("key"), F.lit(1).alias("v"),
        F.lit(1).cast("timestamp").alias("ts"), F.lit("upsert").alias("op"),
    )
    M.merge_into(spark, path, ch, "key", "ts", n_buckets=2, keep_history=True)
    old = M.read_base(spark, path, version=0)
    assert old.filter(F.col("v") == 1).count() == 0
    hist = M.describe_history(spark, path)
    assert [r.version for r in hist.collect()] == [0, 1]
