"""Round-15 OPTIMIZATION pins — operator internals this round rewrote
for fewer passes/jobs must stay exactly equal to what they replaced.

- dedup: the pre-computed-shingles path (shingle_col) must yield
  byte-identical pair sets / signatures to the tokenize-inside path.
- build_ivf: dirty input (NULL / wrong-dim vectors) fails LOUDLY in
  both the fit sample and the assign pass (r14 advice — the silent
  NULL-assignment path lost rows from every probe).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.cache import release_caches


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _docs(spark):
    rows = [
        (i, f"s{i % 3}", " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
        for i in range(60)
    ]
    # plant near-dups: pairs of docs sharing most words
    rows += [(100 + i, "s0", rows[i][2] + " extra") for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_shared_shingles_equal_tokenize_inside(spark):
    from python_vectordbapp_ceph_spark.operators.dedup import (
        jaccard_pairs, minhash_signatures, shingles,
    )

    d = _docs(spark)
    sh_tab = d.select("doc_id", "source", shingles("text", 1).alias("_sh"))

    jp_text = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(
            d, block_col="source", shingle_n=1, threshold=0.5
        ).collect()
    }
    jp_shared = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(
            sh_tab, block_col="source", threshold=0.5, shingle_col="_sh"
        ).collect()
    }
    assert jp_shared == jp_text and jp_text  # non-empty: dups planted

    sig_text = {
        (r.doc_id, tuple(r.signature))
        for r in minhash_signatures(d, num_hashes=8, shingle_n=1).collect()
    }
    sig_shared = {
        (r.doc_id, tuple(r.signature))
        for r in minhash_signatures(
            sh_tab, num_hashes=8, shingle_col="_sh"
        ).collect()
    }
    assert sig_shared == sig_text


def test_build_ivf_raises_on_dirty_vectors(spark):
    from python_vectordbapp_ceph_spark.operators.ivf import build_ivf

    good = [(i, [float(i), float(i + 1)]) for i in range(40)]
    # NULL vector: assign pass (or fit, if sampled) must fail loudly
    df = spark.createDataFrame(
        good + [(99, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL|wrong-dimension|no valid"):
        build_ivf(df, nlist=2).assigned.collect()
    # wrong dimension likewise
    df2 = spark.createDataFrame(
        good + [(98, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="wrong-dimension|NULL|no valid"):
        build_ivf(df2, nlist=2).assigned.collect()
    # all-invalid fit sample: the descriptive message, not np.stack's
    df3 = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL|nothing to fit"):
        build_ivf(df3, nlist=2)
