"""Planted-scenario tests for the Gopher rule gauntlet and the zlib
compressibility signal (q_gopher_rules / q_compression_ratio)."""

import zlib

import pytest

from python_vectordbapp_ceph_spark.functions.text import (
    GOPHER_STOPS,
    _compression_ratio_one,
    compression_ratio,
    gopher_rules,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs off to find "
    "more of that good food with plenty of words to have here today "
    "because long enough documents must clear the minimum word count"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_keeps_normal_prose(spark):
    out = gopher_rules(_df(spark, [(1, GOOD)])).collect()[0]
    assert out.keep == 1
    assert out.n_words >= 20
    assert 3.0 <= out.mean_wlen <= 10.0
    assert out.alpha_frac == 1.0
    assert out.n_stop >= 2


def test_gopher_rejects_each_rule_independently(spark):
    rows = [
        # too short (< 20 words)
        (1, "the of and that short"),
        # no Gopher stopwords at all, padded past the length gate
        (2, " ".join(f"w{i:03d}xx" for i in range(30))),
        # symbol soup: each word trails '...', ratio 1.0 > 0.1
        (3, " ".join(["the of and that have word..."] * 8)),
        # numeric tokens: alpha fraction 0 < 0.8
        (4, "the of " + " ".join(str(i) for i in range(28))),
    ]
    out = {r.doc_id: r for r in gopher_rules(_df(spark, rows)).collect()}
    assert out[1].keep == 0 and out[1].n_words < 20
    assert out[2].keep == 0 and out[2].n_stop == 0
    assert out[3].keep == 0 and out[3].symbol_ratio > 0.1
    assert out[4].keep == 0 and out[4].alpha_frac < 0.8
    # diagnostics still populated on rejected docs
    assert all(r.mean_wlen > 0 for r in out.values())


def test_gopher_empty_text(spark):
    out = gopher_rules(_df(spark, [(1, "")])).collect()[0]
    assert out.keep == 0
    assert out.n_words == 0
    assert out.mean_wlen == 0.0 and out.alpha_frac == 0.0


def test_gopher_stop_set_is_the_published_one():
    assert set(GOPHER_STOPS) == {
        "the", "be", "to", "of", "and", "that", "have", "with",
    }


def test_compression_ratio_matches_inprocess_zlib(spark):
    texts = [GOOD, "a" * 400, "", "xyz"]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r.doc_id: r.ratio
        for r in _df(spark, rows)
        .select("doc_id", compression_ratio("text").alias("ratio"))
        .collect()
    }
    for i, t in enumerate(texts):
        want = _compression_ratio_one(t)
        assert got[i] == pytest.approx(want, abs=0), (i, got[i], want)
    # sanity: repetitive text compresses far below prose; empty is 0
    assert got[1] < 0.1 < got[0]
    assert got[2] == 0.0


def test_compression_ratio_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert (
        df.select(compression_ratio("text").alias("r")).collect()[0].r is None
    )


def test_compression_ratio_is_deterministic_level6():
    b = GOOD.encode("utf-8")
    assert _compression_ratio_one(GOOD) == round(
        len(zlib.compress(b, 6)) / len(b), 6
    )


def test_ewma_matches_pandas_for_short_series(spark):
    """For series shorter than the lag depth the truncated adjusted
    EWMA is EXACTLY pandas ewm(alpha=0.5, adjust=True).mean()."""
    import pandas as pd
    from datetime import datetime

    from python_vectordbapp_ceph_spark.queries.windows import q_ewma  # noqa: F401
    from python_vectordbapp_ceph_spark.queries import QUERIES

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    rows = [
        (k, datetime(2024, 1, 1, 0, k), 7, "t", v, None)
        for k, v in enumerate(vals)
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        got = (
            QUERIES["q_ewma"](spark, d)
            .orderBy("event_id")
            .toPandas()["ewma"]
            .tolist()
        )
    want = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean().round(6).tolist()
    assert got == want


def test_gopher_rules_streaming_equals_batch(spark, tmp_path):
    """Batch/stream unification: the SAME gopher_rules projection runs
    unchanged on a streaming DataFrame (it is stateless — no window,
    no shuffle), and the streamed result equals the batch result.
    This is the shape a continuous ingest-time quality gate takes."""
    rows = [(1, GOOD), (2, "the of and that short"), (3, "")]
    src = tmp_path / "src"
    src.mkdir()
    import json

    (src / "a.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
    )
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = (
        gopher_rules(stream)
        .writeStream.format("memory")
        .queryName("gopher_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.keep, r.n_words, r.mean_wlen)
        for r in spark.table("gopher_stream").collect()
    }
    want = {
        r.doc_id: (r.keep, r.n_words, r.mean_wlen)
        for r in gopher_rules(_df(spark, rows)).collect()
    }
    assert got == want and len(got) == 3
