"""Regression pins for the round-10 ADVICE fixes (r11).

- bloom_contains_many fails loudly (ValueError, not IndexError) on an
  empty filter list.
- bench_compare._load salvages a two-record artifact whose warm line
  is missing or sheared by falling back to the cold diagnostics dict.
- dedup._spread does not shuffle an already-parallel non-file source
  (createDataFrame / micro-batch frames have no inputFiles index).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from python_vectordbapp_ceph_spark.operators.bloom import bloom_contains_many
from python_vectordbapp_ceph_spark.operators.dedup import _spread

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def test_bloom_contains_many_empty_filter_list_raises(spark):
    probes = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="no filters given"):
        bloom_contains_many([], probes, "doc_id")


def test_spread_keeps_parallel_nonfile_source(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(64)], "doc_id long, text string"
    ).repartition(max(target, 4), "doc_id")
    out = _spread(df, "doc_id")
    # already >= target partitions → identity, no forced shuffle
    assert out is df

    small = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    out2 = _spread(small, "doc_id")
    assert out2.rdd.getNumPartitions() == target


def _run_compare(tmp_path, a_text, b_text):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(a_text)
    b.write_text(b_text)
    return subprocess.run(
        [sys.executable, str(TOOLS / "bench_compare.py"), str(a), str(b)],
        capture_output=True, text=True,
    )


def test_bench_compare_falls_back_to_cold_dict(tmp_path):
    cold = json.dumps({
        "metric": "headline_queries_cold_diagnostics", "unit": "sec",
        "sf": 0.1, "queries_cold": {"q_a": 1.0, "q_b": 2.0},
        "cold_total": 3.0,
    })
    warm = json.dumps({
        "metric": "headline_queries_total", "unit": "sec", "sf": 0.1,
        "queries": {"q_a": 0.5, "q_b": 1.5}, "value": 2.0,
    })
    # warm line sheared mid-record: salvaged via the cold dict, and the
    # sheared line must not abort the whole load
    res = _run_compare(tmp_path, cold + "\n" + warm[: len(warm) // 2],
                       cold + "\n" + warm)
    assert res.returncode == 0, res.stderr
    assert "using its cold-run dict" in res.stdout
    assert "common queries: 2" in res.stdout

    # both records intact → warm wins on both sides, no fallback note
    res2 = _run_compare(tmp_path, cold + "\n" + warm, cold + "\n" + warm)
    assert res2.returncode == 0, res2.stderr
    assert "using its cold-run dict" not in res2.stdout
    assert "totals 2.0s -> 2.0s" in res2.stdout
