"""Evaluation & drift tier (round 6, continued): the queries a
training-data pipeline runs to JUDGE its artifacts — classifier /
embedding quality (exact ROC AUC, label-MRR retrieval eval),
distribution drift between corpus slices (two-sample KS), and
cluster-based semantic dedup (SemDeDup).

Same determinism discipline as the mining/curation tiers: integer or
decimal arithmetic through every unbounded reduction, one final divide
rounded to 6 (or integer ppm), total-order tiebreaks on every window.
No logarithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register
from ._common import T, widen


# --- exact ROC AUC, one-vs-rest per label ----------------------------------

@register(
    "q_auc",
    oracle="""
    WITH s AS (SELECT label,
                      round(CAST(embedding[1] AS DOUBLE), 6) AS score
               FROM embeddings),
    h AS (SELECT score, COUNT(*) AS c FROM s GROUP BY score),
    hc AS (SELECT score, c,
                  COALESCE(SUM(c) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
           FROM h),
    p AS (SELECT label, score, COUNT(*) AS pc FROM s GROUP BY label, score),
    r AS (SELECT p.label,
                 SUM(p.pc * (2 * hc.cum_before + hc.c + 1)) AS r2,
                 SUM(p.pc) AS npos
          FROM p JOIN hc ON p.score = hc.score
          GROUP BY p.label),
    n AS (SELECT COUNT(*) AS total FROM s)
    SELECT label, npos, total - npos AS nneg,
           round(CAST(r2 - npos * (npos + 1) AS DOUBLE)
                 / CAST(2 * npos * (total - npos) AS DOUBLE), 6) AS auc
    FROM r CROSS JOIN n
    ORDER BY label
    """,
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC AUC, one-vs-rest per label, scored by the
    first embedding component — the Mann-Whitney identity
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with R_pos the
    sum of AVERAGE ranks of the positives (ties averaged). Doubling
    the rank sum keeps every intermediate an integer: a row whose
    score has `cum_before` smaller values and `c` ties contributes
    2*avg_rank = 2*cum_before + c + 1.

    Scale shape: the global cumulative count runs over the DISTINCT
    -score histogram (groupBy score first), not over rows — the
    standard histogram AUC — and is TWO-PHASED
    (operators/twophase.py): range-partitioned per-partition cumsums
    plus broadcast prefix offsets, so even an adversarially
    heavy-tailed score column whose rounded-6 histogram reaches 10⁸
    rows never funnels through one task. All per-label math is a hash
    aggregate joined to the histogram on score (a shuffle equi-join,
    never a collect). One final double divide, rounded to 6."""
    from ..operators.twophase import global_cumsum

    s = T(spark, sf_dir, "embeddings").select(
        "label",
        F.round(F.col("embedding")[0].cast("double"), 6).alias("score"),
    )
    h = s.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    hc = global_cumsum(
        h, ["score"], "c", cum_col=None, before_col="cum_before"
    ).select("score", "c", "cum_before")
    p = s.groupBy("label", "score").agg(F.count(F.lit(1)).alias("pc"))
    r = (
        p.join(hc, "score")
        .groupBy("label")
        .agg(
            F.sum(
                F.col("pc")
                * (2 * F.col("cum_before") + F.col("c") + 1)
            ).alias("r2"),
            F.sum("pc").alias("npos"),
        )
    )
    n = s.agg(F.count(F.lit(1)).alias("total"))
    return (
        r.crossJoin(F.broadcast(n))
        .select(
            "label",
            "npos",
            (F.col("total") - F.col("npos")).alias("nneg"),
            F.round(
                (F.col("r2") - F.col("npos") * (F.col("npos") + 1)).cast(
                    "double"
                )
                / (2 * F.col("npos") * (F.col("total") - F.col("npos"))).cast(
                    "double"
                ),
                6,
            ).alias("auc"),
        )
        .orderBy("label")
    )


# --- two-sample Kolmogorov-Smirnov drift between sources --------------------

@register(
    "q_ks_drift",
    oracle="""
    WITH c AS (SELECT source, n_chars, COUNT(*) AS c
               FROM documents GROUP BY source, n_chars),
    grid AS (SELECT s.source, v.n_chars
             FROM (SELECT DISTINCT source FROM documents) s
             CROSS JOIN (SELECT DISTINCT n_chars FROM documents) v),
    cum AS (SELECT g.source, g.n_chars,
                   SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.source
                       ORDER BY g.n_chars) AS cum
            FROM grid g LEFT JOIN c
              ON g.source = c.source AND g.n_chars = c.n_chars),
    tot AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           ta.n AS n_a, tb.n AS n_b,
           MAX(abs(a.cum * tb.n - b.cum * ta.n)) * 1000000
               // (ta.n * tb.n) AS ks_ppm
    FROM cum a
    JOIN cum b ON a.n_chars = b.n_chars AND a.source < b.source
    JOIN tot ta ON ta.source = a.source
    JOIN tot tb ON tb.source = b.source
    GROUP BY a.source, b.source, ta.n, tb.n
    ORDER BY source_a, source_b
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between every pair of
    sources over the doc-length distribution — the continuous-drift
    monitor complementing q_dist_shift's categorical TVD. The KS sup
    is evaluated exactly on the pooled support:
    D = max |cdf_a - cdf_b|, integerized as
    max |cum_a*n_b - cum_b*n_a| so the comparison is exact; reported
    as integer ppm (floor div) — no float accumulation anywhere.

    Scale shape: counts collapse rows to (source × distinct length)
    first; the cumulative window is PARTITIONED per source (never a
    single global partition); the pair join runs on the length key
    with source<source dedup. Source count is small (it's a corpus
    slice label), so the pair blow-up is quadratic only in #slices."""
    d = T(spark, sf_dir, "documents")
    # NOT rewritten onto a persisted-histogram rollup (r15 measured
    # rejection): deriving grid/totals from a tracked_persist of the
    # (source, n_chars) histogram nearly DOUBLED the Spark job count
    # (15 → 29; the four consumers of the cached aggregate each spawn
    # their own cache-read + broadcast stages under AQE) with no wall
    # win — the plain scans below share the parquet read and stay
    # cheaper end-to-end.
    c = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        d.select("source").distinct()
        .crossJoin(d.select("n_chars").distinct())
    )
    cum = (
        grid.join(c, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .select(
            "source",
            "n_chars",
            F.sum("c")
            .over(Window.partitionBy("source").orderBy("n_chars"))
            .alias("cum"),
        )
    )
    tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = cum.select(
        F.col("source").alias("source_a"),
        "n_chars",
        F.col("cum").alias("cum_a"),
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        F.col("n_chars").alias("n_chars_b"),
        F.col("cum").alias("cum_b"),
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    # Cross-products promoted to decimal(38,0) BEFORE multiplying: _d can
    # reach n_a·n_b, so _d·10⁶ overflows int64 once n_a·n_b > ~9.2e12
    # (~3M docs per source — well inside the 100 TB regime). Same
    # discipline as streaming/drift.py::batch_tvd_ppm; DuckDB's oracle
    # auto-promotes to HUGEINT so exact parity holds at any volume.
    d38 = "decimal(38,0)"
    return (
        a.join(b, (a["n_chars"] == b["n_chars_b"]) & (a["source_a"] < b["source_b"]))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a").cast(d38) * F.col("n_b")
                    - F.col("cum_b").cast(d38) * F.col("n_a")
                )
            ).alias("_d")
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            # integral div = exact floor; decimal `/` rounds HALF_UP
            # at scale 6 before a truncating cast (off-by-one risk)
            F.expr(
                "CAST((_d * 1000000) div"
                " (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("ks_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


# --- label-MRR retrieval evaluation ----------------------------------------

@register(
    "q_mrr_label",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
          FROM e WHERE vec_id < 8),
    d AS (SELECT q.q_id, q.q_label, e.vec_id, e.label,
                 round(sqrt(list_sum(list_transform(range(64),
                     i -> (e.v[i+1] - q.qv[i+1])
                        * (e.v[i+1] - q.qv[i+1])))), 6) AS dist
          FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
    r AS (SELECT q_id, q_label, label,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY dist, vec_id) AS rnk
          FROM d),
    f AS (SELECT q_id, q_label, MIN(rnk) AS first_hit
          FROM r WHERE label = q_label GROUP BY q_id, q_label)
    SELECT q.q_id, q.q_label,
           COALESCE(f.first_hit, 0) AS first_hit,
           COALESCE(1000000 // f.first_hit, 0) AS rr_ppm
    FROM q LEFT JOIN f ON q.q_id = f.q_id
    ORDER BY q.q_id
    """,
)
def q_mrr_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval of the embedding space itself: for each
    probe vector, the rank of the first SAME-LABEL neighbor under
    exact L2 — reciprocal rank in integer ppm (1e6 // rank, exact; no
    float mean of reciprocals). The mean over probes is left to the
    caller so the per-probe evidence stays inspectable; a degenerate
    probe with no same-label neighbor reports 0.

    Plan family = batch exact KNN: broadcast the probe set across the
    base scan, per-probe rank window (partitioned by q_id — never
    global), min-rank filter on the label match. At 100 TB the base
    side swaps for the IVF tier (operators/ivf.search_batch) exactly
    like q_filtered_knn; the eval harness shape is unchanged."""
    from ..functions import vector as V

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    d = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(V.l2_distance("v", "qv"), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("dist", "vec_id")
    r = d.select("q_id", "q_label", "label", F.row_number().over(w).alias("rnk"))
    f = (
        r.filter(F.col("label") == F.col("q_label"))
        .groupBy("q_id", "q_label")
        .agg(F.min("rnk").alias("first_hit"))
    )
    return (
        q.select("q_id", "q_label")
        .join(f.select("q_id", "first_hit"), "q_id", "left")
        .select(
            "q_id",
            "q_label",
            F.coalesce(F.col("first_hit"), F.lit(0)).alias("first_hit"),
            # guard BEFORE the divide: `div 0` raises under the hostile
            # gate's ANSI mode, so a no-same-label probe must shortcut
            F.when(
                F.col("first_hit").isNotNull(),
                F.expr("1000000 div first_hit"),
            )
            .otherwise(F.lit(0))
            .alias("rr_ppm"),
        )
        .orderBy("q_id")
    )


# --- SemDeDup: cluster-based semantic dedup ---------------------------------

@register("q_semantic_dedup")  # rows-only: KMeans assignment is model-seeded
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space
    coarsely, then mark near-duplicate members WITHIN each cluster by
    cosine similarity, keeping one survivor per dup group. Returns
    (vec_id, cluster_id, keep) for every vector.

    Spark shape: the KMeans fit + assignment reuses the IVF coarse
    quantizer (operators/ivf.build_ivf — sampled fit, broadcast
    centroids, one scan to assign); the quadratic cosine check then
    runs per cluster inside applyInPandas with a numpy gram matrix —
    bounded by the cluster size, which nlist controls (at 100 TB:
    raise nlist so E[cluster] stays ~10k rows → 100M-float gram max,
    and the per-cluster tasks are embarrassingly parallel). This is
    the published SemDeDup recipe and the reason it scales where
    all-pairs cosine cannot. rows-only by design (cluster ids are
    seed-stable but not SQL-expressible); the pytest plants exact
    duplicates and asserts one survivor per dup group."""
    import numpy as np
    import pandas as pd

    from ..operators.ivf import build_ivf

    e = T(spark, sf_dir, "embeddings")
    idx = build_ivf(e, vec_col="embedding", id_col="vec_id", nlist=16, seed=42)
    assigned = idx.assigned.select(
        "vec_id", "cluster_id", F.col("embedding").cast("array<double>").alias("v")
    )

    out_schema = "vec_id long, cluster_id int, keep boolean"

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)  # deterministic survivor choice: min id
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
            {
                "vec_id": ids,
                "cluster_id": pdf["cluster_id"].iloc[0],
                "keep": keep,
            }
        )

    return (
        assigned.groupBy("cluster_id")
        .applyInPandas(dedup_cluster, out_schema)
        .orderBy("vec_id")
    )


# --- calibration bins (reliability diagram) ---------------------------------

@register(
    "q_calibration",
    oracle="""
    WITH s AS (SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
                      round(CAST(embedding[1] AS DOUBLE), 6) AS score
               FROM embeddings),
    mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM s),
    b AS (SELECT y,
                 CASE WHEN hi = lo THEN 0
                      ELSE LEAST(CAST(floor((score - lo) / (hi - lo) * 10)
                                 AS BIGINT), 9) END AS bin
          FROM s CROSS JOIN mm)
    SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos,
           SUM(y) * 1000000 // COUNT(*) AS pos_ppm
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a scored binary outcome (here:
    score = first embedding component, outcome = label 0 one-vs-rest):
    10 equal-width score bins, each with its exact positive rate in
    integer ppm. The drift/calibration readout every model-scored
    filter (quality classifier, toxicity scorer) gets audited with
    before its threshold is trusted. Min/max are a broadcast scalar
    agg; binning is a per-row map; the rest is one hash aggregate —
    no window, no collect, scale-free."""
    s = T(spark, sf_dir, "embeddings").select(
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("score"),
    )
    mm = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    # hi == lo (constant score column) makes the width 0 → 0/0 = NaN,
    # and ANSI mode raises on floor(NaN)→long; collapse to a single
    # bin 0 instead — matching the oracle's CASE guard.
    b = s.crossJoin(F.broadcast(mm)).select(
        "y",
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("score") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 10
                ).cast("long"),
                F.lit(9).cast("long"),
            )
        )
        .alias("bin"),
    )
    return (
        b.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"))
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("n_pos * 1000000 div n").alias("pos_ppm"),
        )
        .orderBy("bin")
    )


# --- 1-NN confusion matrix over a probe sample ------------------------------

@register(
    "q_knn_confusion",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv
          FROM e WHERE vec_id % 25 = 0 AND vec_id < 5000),
    d AS (SELECT q.q_id, q.true_label, e.label AS pred_label,
                 round(sqrt(list_sum(list_transform(range(64),
                     i -> (e.v[i+1] - q.qv[i+1])
                        * (e.v[i+1] - q.qv[i+1])))), 6) AS dist,
                 e.vec_id
          FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
    r AS (SELECT q_id, true_label, pred_label,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY dist, vec_id) AS rn
          FROM d)
    SELECT true_label, pred_label, COUNT(*) AS n
    FROM r WHERE rn = 1
    GROUP BY true_label, pred_label
    ORDER BY true_label, pred_label
    """,
)
def q_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the 1-NN classifier the embedding space
    implies, over a deterministic probe sample (vec_id % 25 = 0, capped at id 5000 — a fixed-SIZE probe set, so the eval cost stays ONE scan times a constant at any SF; a fixed-rate sample measured quadratic, 31.8 s at the x10 point) — the
    standard embedding-quality eval (a good space routes probes to
    same-label neighbors; off-diagonal mass localizes which classes
    bleed together). Plan family = batch exact KNN: broadcast probes
    across one base scan, per-probe rank window, rank-1 filter, hash
    aggregate. At 100 TB the probe set stays a sample (that's the
    point of an eval) and the base side swaps for the IVF tier."""
    from ..functions import vector as V

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    d = (
        widen(e).crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("pred_label"),
            F.round(V.l2_distance("v", "qv"), 6).alias("dist"),
            "vec_id",
        )
    )
    w = Window.partitionBy("q_id").orderBy("dist", "vec_id")
    return (
        d.select("true_label", "pred_label", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "pred_label")
    )


# --- kNN-distance outlier scores --------------------------------------------

@register(
    "q_knn_outliers",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
          FROM e WHERE vec_id % 10 = 0 AND vec_id < 5000),
    d AS (SELECT q.q_id, q.q_label,
                 round(sqrt(list_sum(list_transform(range(64),
                     i -> (e.v[i+1] - q.qv[i+1])
                        * (e.v[i+1] - q.qv[i+1])))), 6) AS dist,
                 e.vec_id
          FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
    r AS (SELECT q_id, q_label, dist,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY dist, vec_id) AS rn
          FROM d)
    SELECT q_id, q_label, dist AS d5
    FROM r WHERE rn = 5
    ORDER BY d5 DESC, q_id LIMIT 20
    """,
)
def q_knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance outlier detection (Ramaswamy et al. 2000): a
    vector's outlier score is its distance to its 5th nearest
    neighbor; the top-scored vectors are the corrupt/mislabeled
    embeddings a curation pass quarantines before index build. Probes
    are the fixed-SIZE deterministic sample the eval family uses
    (vec_id % 10 = 0, capped — q_knn_confusion's convention, so cost
    stays one scan × a constant at any SF). Plan family = batch exact
    KNN: broadcast probes × one base scan, per-probe rank window,
    rank-5 filter, global top-20. At 100 TB the base side swaps for
    the IVF tier and the score is the probe's 5th candidate distance."""
    from ..functions import vector as V

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    d = (
        widen(e).crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            F.round(V.l2_distance("v", "qv"), 6).alias("dist"),
            "vec_id",
        )
    )
    w = Window.partitionBy("q_id").orderBy("dist", "vec_id")
    return (
        d.select("q_id", "q_label", "dist", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 5)
        .select("q_id", "q_label", F.col("dist").alias("d5"))
        .orderBy(F.col("d5").desc(), "q_id")
        .limit(20)
    )


# --- reciprocal best-match pair mining ---------------------------------------

@register(
    "q_reciprocal_best_match",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    a AS (SELECT vec_id AS a_id, label AS a_label, v AS av
          FROM e WHERE vec_id % 25 = 0 AND vec_id < 5000),
    b AS (SELECT vec_id AS b_id, label AS b_label, v AS bv
          FROM e WHERE vec_id % 25 = 5 AND vec_id < 5000),
    d AS (SELECT a.a_id, a.a_label, b.b_id, b.b_label,
                 round(sqrt(list_sum(list_transform(range(64),
                     i -> (a.av[i+1] - b.bv[i+1])
                        * (a.av[i+1] - b.bv[i+1])))), 6) AS dist
          FROM a CROSS JOIN b),
    r AS (SELECT a_id, a_label, b_id, b_label, dist,
                 row_number() OVER (PARTITION BY a_id
                                    ORDER BY dist, b_id) AS rn_a,
                 row_number() OVER (PARTITION BY b_id
                                    ORDER BY dist, a_id) AS rn_b,
                 lead(dist) OVER (PARTITION BY a_id
                                  ORDER BY dist, b_id) AS d2
          FROM d)
    SELECT a_id, b_id, a_label, b_label, dist,
           CASE WHEN dist = 0 THEN 1000000000
                WHEN d2 IS NULL THEN 1000000
                ELSE CAST(floor(d2 / dist * 1000000) AS BIGINT)
           END AS margin_ppm
    FROM r WHERE rn_a = 1 AND rn_b = 1
    ORDER BY a_id
    """,
)
def q_reciprocal_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal best-match pair mining — the mutual-nearest-neighbor
    criterion parallel-corpus miners (LASER/CCMatrix-style) use to
    pair items across two collections: (a, b) survives only when b is
    a's nearest neighbor in B AND a is b's nearest in A, which kills
    the hub matches a one-directional top-1 keeps. Each kept pair
    carries the CCMatrix-style margin (runner-up distance / match
    distance, exact integer ppm of a double ratio both engines
    compute identically from the same rounded distances; ties at
    distance 0 cap at 1e9, a singleton runner-up defaults to 1e6) —
    downstream filters threshold on margin to trade pair yield for
    precision. Probe sets are the eval family's fixed-size
    deterministic samples (q_knn_confusion's convention: disjoint
    residue classes, id-capped), so the pair matrix is constant-sized
    at ANY corpus scale.

    Plan: one base scan feeds both probe filters, one broadcast cross
    of two constant-size sets, two rank windows over the same pair
    table (partition keys = probe ids), conjunctive rank-1 filter. At
    100 TB both directions swap their exact scan for the IVF tier —
    the mutual test and margin survive unchanged on the candidate
    lists."""
    from ..functions import vector as V

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("v").alias("av"),
    )
    b = e.filter((F.col("vec_id") % 25 == 5) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("v").alias("bv"),
    )
    d = widen(a).crossJoin(F.broadcast(b)).select(
        "a_id",
        "a_label",
        "b_id",
        "b_label",
        F.round(V.l2_distance("av", "bv"), 6).alias("dist"),
    )
    wa = Window.partitionBy("a_id").orderBy("dist", "b_id")
    wb = Window.partitionBy("b_id").orderBy("dist", "a_id")
    r = d.select(
        "a_id",
        "a_label",
        "b_id",
        "b_label",
        "dist",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wb).alias("rn_b"),
        F.lead("dist").over(wa).alias("d2"),
    )
    return (
        r.filter((F.col("rn_a") == 1) & (F.col("rn_b") == 1))
        .select(
            "a_id",
            "b_id",
            "a_label",
            "b_label",
            "dist",
            F.when(F.col("dist") == 0, F.lit(1000000000))
            .when(F.col("d2").isNull(), F.lit(1000000))
            .otherwise(
                F.floor(F.col("d2") / F.col("dist") * F.lit(1000000.0))
            )
            .cast("long")
            .alias("margin_ppm"),
        )
        .orderBy("a_id")
    )


# --- seasonal-naive forecast backtest ---------------------------------------

@register(
    "q_seasonal_backtest",
    oracle="""
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                      COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    j AS (SELECT a.event_type, a.n AS actual, f.n AS fcst
          FROM h a JOIN h f
            ON a.event_type = f.event_type
           AND f.hr = a.hr - INTERVAL 24 HOURS
          WHERE a.hr >= (SELECT max(date_trunc('hour', ts))
                         FROM events) - INTERVAL 23 HOURS)
    SELECT event_type,
           COUNT(*) AS n_hours,
           SUM(actual) AS total_actual,
           (SUM(abs(actual - fcst)) * 1000000) // SUM(actual) AS wape_ppm
    FROM j GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: seasonal-naive (same hour, previous day)
    hourly event-count forecasts scored over the stream's final 24
    hours, one WAPE per event type (weighted absolute percentage
    error in exact integer ppm — the robust denominator-pooled form,
    no per-hour division blowups, no floats). The capacity-planning
    eval a streaming pipeline runs before trusting its volume
    forecasts. Scale shape: everything beyond the first hash
    aggregate operates on the HOURLY grain — types × hours rows,
    data-size-independent; the self-join on (type, hr−24h) and the
    final aggregate are bounded by the calendar, not the event
    count."""
    e = T(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    last_hr = h.agg(F.max("hr").alias("mx"))
    a = h.select("event_type", "hr", F.col("n").alias("actual"))
    f = h.select(
        F.col("event_type").alias("f_type"),
        (F.col("hr") + F.expr("INTERVAL 24 HOURS")).alias("f_hr"),
        F.col("n").alias("fcst"),
    )
    j = (
        a.join(
            f,
            (a["event_type"] == f["f_type"]) & (a["hr"] == f["f_hr"]),
        )
        .crossJoin(F.broadcast(last_hr))
        .filter(F.col("hr") >= F.col("mx") - F.expr("INTERVAL 23 HOURS"))
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("actual").alias("total_actual"),
            F.expr(
                "(SUM(abs(actual - fcst)) * 1000000) div SUM(actual)"
            ).alias("wape_ppm"),
        )
        .orderBy("event_type")
    )


# --- corpus boilerplate n-grams ---------------------------------------------

@register(
    "q_boilerplate_ngrams",
    oracle="""
    WITH tk AS (SELECT doc_id,
                       list_filter(string_split(
                           trim(regexp_replace(regexp_replace(lower(text),
                               '[^a-z0-9\\s]', ' ', 'g'),
                               '\\s+', ' ', 'g')), ' '),
                           x -> x != '') AS tk
                FROM documents),
    g AS (SELECT DISTINCT doc_id, s
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(tk) - 3),
                           i -> array_to_string(tk[i:i+4], ' '))) AS s
                FROM tk WHERE len(tk) >= 5)),
    df AS (SELECT s, COUNT(*) AS n_docs FROM g GROUP BY s)
    SELECT s AS ngram, n_docs FROM df
    WHERE n_docs >= 3
    ORDER BY n_docs DESC, ngram
    LIMIT 20
    """,
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection: the 5-token shingles shared
    by the most documents (headers, footers, license blurbs, template
    chrome — the strings an exact-substring dedup pass à la Lee et al.
    2022 would remove from every training document). The inverse view
    of q_ngram_novelty: that reports per-doc novelty, this surfaces
    the offending n-grams themselves with their document frequency.
    Plan: per-doc shingle explode (partition-local), distinct, one
    map-side-combinable count on the shingle key, global top-20 via
    TakeOrderedAndProject. The shingle vocabulary shuffles on its own
    key — never through the driver, no broadcast of anything
    unbounded."""
    from ..functions.text import normalize_for_fingerprint

    d = widen(T(spark, sf_dir, "documents"))
    tk = F.filter(
        F.split(normalize_for_fingerprint(F.col("text")), " "),
        lambda x: x != "",
    )
    sh = (
        d.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 4),"
                    " i -> array_join(slice(tk, i, 5), ' '))"
                )
            ).alias("ngram"),
        )
        .distinct()
    )
    return (
        sh.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), "ngram")
        .limit(20)
    )


# --- exact cross-document substring removal ---------------------------------

@register(
    "q_boilerplate_scrub",
    oracle="""
    WITH tk AS (SELECT doc_id,
                       list_filter(string_split(
                           trim(regexp_replace(regexp_replace(lower(text),
                               '[^a-z0-9\\s]', ' ', 'g'),
                               '\\s+', ' ', 'g')), ' '),
                           x -> x != '') AS tk
                FROM documents),
    g AS (SELECT DISTINCT doc_id, s
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(tk) - 3),
                           i -> array_to_string(tk[i:i+4], ' '))) AS s
                FROM tk WHERE len(tk) >= 5)),
    top AS (SELECT s FROM (SELECT s, COUNT(*) AS n_docs FROM g GROUP BY s)
            WHERE n_docs >= 3 ORDER BY n_docs DESC, s LIMIT 20),
    starts AS (SELECT doc_id, i FROM
                   (SELECT doc_id, i, array_to_string(tk[i:i+4], ' ') AS s
                    FROM tk, unnest(range(1, len(tk) - 3)) AS r(i)
                    WHERE len(tk) >= 5)
               WHERE s IN (SELECT s FROM top)),
    cov AS (SELECT DISTINCT s.doc_id, r.i
            FROM starts s, unnest(range(s.i, s.i + 5)) AS r(i)),
    pos AS (SELECT doc_id, unnest(tk) AS tok,
                   CAST(generate_subscripts(tk, 1) AS BIGINT) AS i
            FROM tk),
    k AS (SELECT p.doc_id,
                 string_agg(p.tok, ' ' ORDER BY p.i) AS cleaned,
                 COUNT(*) AS nk
          FROM pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.i = p.i
          WHERE c.i IS NULL GROUP BY p.doc_id)
    SELECT t.doc_id,
           coalesce(k.cleaned, '') AS cleaned_text,
           len(t.tk) - coalesce(k.nk, 0) AS n_tokens_removed,
           len(array_to_string(t.tk, ' '))
               - len(coalesce(k.cleaned, '')) AS chars_removed
    FROM tk t LEFT JOIN k ON k.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
)
def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step AFTER q_boilerplate_ngrams: REWRITE every document
    with the top-20 corpus boilerplate 5-grams' token spans removed
    (exact cross-document substring removal, Lee et al. 2022 §3 —
    the reference list above only *names* the offenders). A token is
    dropped iff it falls inside any occurrence of a boilerplate
    n-gram in the doc's normalized token stream; output is the
    cleaned normalized text plus removed-token/char accounting, so
    the scrub is auditable (sum(chars_removed) = bytes saved).

    Plan: the 20-row target list broadcasts to a shingle-stream join
    that yields match START positions only; starts collect per doc
    (bounded by matches, not tokens) and one array-native
    filter-with-index pass drops covered tokens — no token-level
    explode/re-join shuffle, documents never leave their partitions
    after the broadcast probe. The shingle stream is computed twice
    (target mining + probe) — two scans beat persisting a
    tokens-×-docs intermediate at 100 TB."""
    from ..functions.text import normalize_for_fingerprint

    d = widen(T(spark, sf_dir, "documents"))
    tkc = F.filter(
        F.split(normalize_for_fingerprint(F.col("text")), " "),
        lambda x: x != "",
    )
    docs = d.select("doc_id", tkc.alias("tk"))
    sh = (
        docs.filter(F.size("tk") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 4),"
                    " i -> struct(i AS i,"
                    " array_join(slice(tk, i, 5), ' ') AS s))"
                )
            ).alias("m"),
        )
        .select("doc_id", "m.i", "m.s")
    )
    top = (
        sh.select("doc_id", "s")
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), "s")
        .limit(20)
        .select("s")
    )
    starts = (
        sh.join(F.broadcast(top), "s")
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("starts"))
    )
    return (
        docs.join(starts, "doc_id", "left")
        .withColumn(
            "_st", F.coalesce("starts", F.expr("CAST(array() AS ARRAY<INT>)"))
        )
        .withColumn(
            "_kept",
            F.expr(
                "filter(tk, (x, idx) -> NOT exists(_st,"
                " s -> s <= idx + 1 AND idx + 1 <= s + 4))"
            ),
        )
        .select(
            "doc_id",
            F.array_join("_kept", " ").alias("cleaned_text"),
            (F.size("tk") - F.size("_kept"))
            .cast("long")
            .alias("n_tokens_removed"),
            (
                F.length(F.array_join("tk", " "))
                - F.length(F.array_join("_kept", " "))
            )
            .cast("long")
            .alias("chars_removed"),
        )
        .orderBy("doc_id")
    )


# --- quantile normalization across sources ----------------------------------

@register(
    "q_quantile_normalize",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
    ng AS (SELECT COUNT(*) AS n_g FROM d),
    r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS rnk
          FROM d),
    hist AS (SELECT n_chars AS v, COUNT(*) AS c FROM d GROUP BY n_chars),
    cumh AS (SELECT v, c,
                    SUM(c) OVER (ORDER BY v) AS cum,
                    COALESCE(SUM(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_before
             FROM hist),
    t AS (SELECT r.doc_id, r.source, r.n_chars,
                 (r.rnk * ng.n_g + ns.n_s - 1) // ns.n_s AS idx
          FROM r JOIN ns ON r.source = ns.source CROSS JOIN ng)
    SELECT t.doc_id, t.source, t.n_chars, h.v AS norm_chars
    FROM t JOIN cumh h ON t.idx > h.cum_before AND t.idx <= h.cum
    ORDER BY doc_id
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of a per-doc metric across sources
    (batch-effect correction): each doc's length is replaced by the
    GLOBAL distribution's value at the doc's within-source quantile,
    so every source ends up with the same marginal distribution — the
    standard fix when per-source scoring pipelines drift and their
    outputs must be pooled. Integer-exact: within-source rank r of
    n_s maps to global position ceil(r·n_g/n_s) via
    (r·n_g + n_s − 1) div n_s, then position→value resolves against
    the global DISTINCT-value histogram's cumulative spans.

    Scale shape: the within-source rank window is PARTITIONED by
    source; the global cumulative spans over the distinct-value
    histogram are TWO-PHASED (operators/twophase.py — per-partition
    cumsums + broadcast prefix offsets), so a heavy-tailed value
    column never funnels its histogram through one task. The
    position→value lookup broadcasts the histogram for the interval
    join; that broadcast (not the window) is the surviving cardinality
    contract — it holds while distinct values fit an executor
    (~10⁷ spans ≈ hundreds of MB); beyond that, swap the broadcast
    for a range join on idx between cum_before and cum."""
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    # NOT rewritten to derive ng from a persisted ns (r15 measured
    # rejection, same shape as q_ks_drift's): the persist's extra
    # cache-fill/broadcast stages cost more jobs than the saved scan
    ns = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    ng = d.agg(F.count(F.lit(1)).alias("n_g"))
    r = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rnk"),
    )
    from ..operators.twophase import global_cumsum

    hist = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    cumh = global_cumsum(
        hist, ["n_chars"], "c", cum_col="cum", before_col="cum_before"
    ).select(F.col("n_chars").alias("v"), "cum", "cum_before")
    t = (
        r.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.expr("(rnk * n_g + n_s - 1) div n_s").alias("idx"),
        )
    )
    return (
        t.join(
            F.broadcast(cumh),
            (t["idx"] > cumh["cum_before"]) & (t["idx"] <= cumh["cum"]),
        )
        .select("doc_id", "source", "n_chars", F.col("v").alias("norm_chars"))
        .orderBy("doc_id")
    )


# --- per-label embedding centroids ------------------------------------------

@register(
    "q_label_centroids",
    oracle="""
    WITH x AS (SELECT label, i AS dim,
                      CAST(round(CAST(embedding[i + 1] AS DOUBLE), 6)
                           AS DECIMAL(18,6)) AS v
               FROM embeddings, range(64) t(i))
    SELECT label, dim, COUNT(*) AS n,
           CAST(SUM(v) AS DOUBLE) AS sum_v
    FROM x GROUP BY label, dim
    ORDER BY label, dim
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class prototypes: the per-label mean embedding, one row per
    (label, dimension) — the centroid table behind prototype
    classifiers, per-class drift monitors (compare against last
    week's centroids), and SemDeDup's cluster seeds. Components are
    rounded to 6 then summed in DECIMAL(18,6), so the unbounded
    reduction is exact and order-insensitive (q_embedding_stats'
    discipline); the OUTPUT is (n, sum) — the caller derives the
    mean, because a rounded quotient can land on a 5e-7
    representation boundary where engines' rounding of the same
    double diverges (observed once at sf0.1). posexplode fans each vector into (dim, value) rows that
    combine map-side — the shuffle carries |labels|·|dims| partials
    per partition, independent of row count."""
    e = T(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "_x"),
    ).select(
        "label",
        "dim",
        F.round(F.col("_x").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("v"),
    )
    return (
        x.groupBy("label", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("_s"))
        .select(
            "label",
            "dim",
            "n",
            # exact decimal sum, NOT the derived mean: round(sum/n, 6)
            # hash-diverged at sf0.1 on a 5e-7 representation boundary
            # (q_winsorize's emit-sums-not-means lesson); the caller
            # divides
            F.col("_s").cast("double").alias("sum_v"),
        )
        .orderBy("label", "dim")
    )


# --- embedding dimension covariance matrix ----------------------------------

@register(
    "q_embed_covariance",
    oracle="""
    WITH x AS (SELECT vec_id, i AS dim,
                      round(CAST(embedding[i + 1] AS DOUBLE), 6) AS v
               FROM embeddings, range(8) t(i)),
    p AS (SELECT a.dim AS dim_i, b.dim AS dim_j,
                 COUNT(*) AS n,
                 SUM(CAST(a.v AS DECIMAL(18,6))) AS sx,
                 SUM(CAST(b.v AS DECIMAL(18,6))) AS sy,
                 SUM(CAST(a.v * b.v AS DECIMAL(24,12))) AS sxy
          FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
          GROUP BY a.dim, b.dim)
    SELECT dim_i, dim_j,
           round((CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n, 6)
               AS cov
    FROM p ORDER BY dim_i, dim_j
    """,
)
def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance matrix of the leading embedding dimensions (upper
    triangle, first 8 dims) — the dimension-collapse detector: a
    broken encoder shows near-zero variance rows or rank-deficient
    off-diagonal structure long before retrieval metrics degrade.
    Exact despite floats: components round to the 1e-6 grid, so
    pairwise products live exactly on the 1e-12 grid — Σx in
    DECIMAL(18,6) and Σxy in DECIMAL(24,12) are exact
    order-insensitive reductions; the covariance assembles from those
    exact sums in one fixed double chain rounded to 6.

    Scale shape: one scan fans each row into d chosen dims
    (posexplode), the pair join is per-row (equi-join on vec_id,
    bounded d²/2 fan-out — a constant, not data-dependent), and the
    aggregate collapses to d²/2 groups with map-side partials. At
    100 TB: still one shuffle whose row count is d²/2 × partitions."""
    e = T(spark, sf_dir, "embeddings")
    x = (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "_x"))
        .select(
            "vec_id",
            "dim",
            F.round(F.col("_x").cast("double"), 6).alias("v"),
        )
    )
    a = x.select("vec_id", F.col("dim").alias("dim_i"), F.col("v").alias("va"))
    b = x.select(
        F.col("vec_id").alias("vid_b"),
        F.col("dim").alias("dim_j"),
        F.col("v").alias("vb"),
    )
    p = (
        a.join(b, (a["vec_id"] == b["vid_b"]) & (a["dim_i"] <= b["dim_j"]))
        .groupBy("dim_i", "dim_j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("va").cast("decimal(18,6)")).alias("sx"),
            F.sum(F.col("vb").cast("decimal(18,6)")).alias("sy"),
            F.sum((F.col("va") * F.col("vb")).cast("decimal(24,12)")).alias(
                "sxy"
            ),
        )
    )
    return p.select(
        "dim_i",
        "dim_j",
        F.round(
            (
                F.col("sxy").cast("double")
                - F.col("sx").cast("double")
                * F.col("sy").cast("double")
                / F.col("n")
            )
            / F.col("n"),
            6,
        ).alias("cov"),
    ).orderBy("dim_i", "dim_j")


# --- Spearman rank correlation (monotone-trend detector) --------------------

@register(
    "q_spearman_trend",
    oracle="""
    WITH e AS (SELECT event_type AS g, epoch_us(ts) AS x, value AS y
               FROM events),
    hx AS (SELECT g, x, COUNT(*) AS c,
                  COALESCE(SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cb
           FROM e GROUP BY g, x),
    hy AS (SELECT g, y, COUNT(*) AS c,
                  COALESCE(SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY y
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cb
           FROM e GROUP BY g, y),
    r AS (SELECT e.g,
                 (2 * hx.cb + hx.c + 1) AS ax,
                 (2 * hy.cb + hy.c + 1) AS ay
          FROM e JOIN hx ON e.g = hx.g AND e.x = hx.x
                 JOIN hy ON e.g = hy.g AND e.y = hy.y),
    s AS (SELECT g, COUNT(*) AS n,
                 SUM(ax) AS sx, SUM(ay) AS sy,
                 SUM(ax * ax) AS sxx, SUM(ay * ay) AS syy,
                 SUM(ax * ay) AS sxy
          FROM r GROUP BY g)
    SELECT g AS event_type, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS spearman
    FROM s ORDER BY g
    """,
)
def q_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of value vs time per event type — the
    outlier-robust monotone-trend detector (Pearson on RANKS; a
    single 1000× spike that drags q_corr_groups' Pearson barely moves
    Spearman). Tie-correct and exact: doubled average ranks
    A = 2·cum_before + c + 1 are integers (the q_auc identity), every
    reduction is an integer sum, and ρ assembles from six exact sums
    in one fixed double chain with a final round — engines cannot
    diverge before the last operation.

    Scale shape: both rank computations are per-group DISTINCT-value
    histograms (windows PARTITIONED by group over the histogram, not
    rows); rows join their two ranks back by (group, value) equi-keys
    and collapse to six sums per group with map-side partials."""
    e = T(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.unix_micros("ts").alias("x"),
        F.col("value").alias("y"),
    )

    def ranks(col):
        h = e.groupBy("g", col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy("g")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return h.select(
            "g",
            col,
            (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias(
                f"a{col}"
            ),
        )

    # DECIMAL(38,0) through every product/sum: Σa² ~ 4n³ and n·Σa²−(Σa)²
    # ~ 4n⁴ overflow int64 near n ≈ 1.3M rows per group — DuckDB's SUM
    # already promotes to 128-bit HUGEINT, so the Spark side must match
    # in decimal or the hostile (ANSI) gate raises at scale
    r = (
        e.join(ranks("x"), ["g", "x"])
        .join(ranks("y"), ["g", "y"])
        .select(
            "g",
            F.col("ax").cast("decimal(19,0)").alias("ax"),
            F.col("ay").cast("decimal(19,0)").alias("ay"),
        )
    )
    d38 = "decimal(38,0)"
    s = r.groupBy("g").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("ax").cast(d38).alias("sx"),
        F.sum("ay").cast(d38).alias("sy"),
        F.sum((F.col("ax") * F.col("ay")).cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("ax") * F.col("ax")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("ay") * F.col("ay")).cast(d38)).cast(d38).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("g").alias("event_type"),
        F.col("n").cast("long").alias("n"),
        F.round(num / F.sqrt(vx * vy), 6).alias("spearman"),
    ).orderBy("event_type")


# --- chi-squared association ------------------------------------------------

@register(
    "q_chi2_assoc",
    oracle="""
    WITH b AS (SELECT event_type AS r,
                      CASE WHEN value < 10 THEN 'lo'
                           WHEN value < 100 THEN 'mid'
                           ELSE 'hi' END AS c
               FROM events),
    o AS (SELECT r, c, COUNT(*) AS obs FROM b GROUP BY r, c),
    rm AS (SELECT r, SUM(obs) AS rn FROM o GROUP BY r),
    cm AS (SELECT c, SUM(obs) AS cn FROM o GROUP BY c),
    n AS (SELECT SUM(obs) AS total FROM o)
    SELECT o.r AS event_type, o.c AS bucket, o.obs,
           round(CAST(total * obs - rn * cn AS DOUBLE)
                 * CAST(total * obs - rn * cn AS DOUBLE)
                 / (CAST(rn AS DOUBLE) * cn * total), 6) AS chi2_term
    FROM o JOIN rm ON o.r = rm.r
           JOIN cm ON o.c = cm.c
           CROSS JOIN n
    ORDER BY event_type, bucket
    """,
)
def q_chi2_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared association between event type and value bucket —
    the categorical feature-selection statistic, emitted per cell so
    the analyst sees WHICH cells drive the dependence (the summed
    statistic is one more aggregate away). Exact despite the ratio:
    each cell's (n·obs − rn·cn)² numerator is integer arithmetic
    (the identity (obs − e)²/e = (n·obs − rn·cn)²/(rn·cn·n) clears
    the fractional expected count), so engines agree bit-for-bit
    until one double division, rounded. Counts, margins, and total
    are three reuses of one hash aggregate; margins broadcast back."""
    e = T(spark, sf_dir, "events")
    b = e.select(
        F.col("event_type").alias("r"),
        F.when(F.col("value") < 10, "lo")
        .when(F.col("value") < 100, "mid")
        .otherwise("hi")
        .alias("c"),
    )
    o = b.groupBy("r", "c").agg(F.count(F.lit(1)).alias("obs"))
    rm = o.groupBy("r").agg(F.sum("obs").alias("rn"))
    cm = o.groupBy("c").agg(F.sum("obs").alias("cn"))
    n = o.agg(F.sum("obs").alias("total"))
    num = (F.col("total") * F.col("obs") - F.col("rn") * F.col("cn")).cast(
        "double"
    )
    return (
        o.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("r").alias("event_type"),
            F.col("c").alias("bucket"),
            "obs",
            F.round(
                num * num
                / (
                    F.col("rn").cast("double")
                    * F.col("cn")
                    * F.col("total")
                ),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("event_type", "bucket")
    )


# --- inter-arrival burstiness (Fano factor) ---------------------------------

@register(
    "q_burstiness",
    oracle="""
    WITH g AS (SELECT event_type,
                      epoch_us(ts) - lag(epoch_us(ts)) OVER (
                          PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS gap
               FROM events),
    s AS (SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(gap AS HUGEINT)) AS sg,
                 SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sgg
          FROM g WHERE gap IS NOT NULL GROUP BY event_type)
    SELECT event_type, n,
           (n * sgg - sg * sg) // (n * sg) AS fano_floor_us
    FROM s ORDER BY event_type
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per event type: the Fano factor
    (variance/mean of the per-user gap sequence, microseconds) — a
    Poisson process reads ≈ its mean; bot bursts and thundering herds
    read far above it. Gaps are exact integer micros from a
    per-(user, type) lag window (partitioned — never global); the
    raw moments Σg and Σg² reduce in DECIMAL(38,0) because a squared
    µs gap is ~1e18 and the sum overflows int64 immediately (DuckDB's
    HUGEINT matches); the Fano assembly is EXACT integer floor
    division (n·Σg² − (Σg)²) div (n·Σg) — a double chain here
    diverged between engines at sf1 (round(…,6) on a 1e11-magnitude
    value is ulp-unstable: DuckDB scales by 10⁶ before rounding, the
    r7 sf1 sweep caught it), and at µs scale the integer part IS the
    signal. Bound: the decimal-38 products hold to ~1e10 gap samples
    per event type; Cauchy-Schwarz keeps the numerator ≥ 0."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    d38 = "decimal(38,0)"
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gap").cast(d38)).alias("sg"),
        F.sum(
            (F.col("gap").cast(d38) * F.col("gap").cast(d38)).cast(d38)
        ).alias("sgg"),
    )
    return s.select(
        "event_type",
        "n",
        # integral div = exact floor (numerator ≥ 0 by Cauchy-Schwarz);
        # decimal `/` rounds HALF_UP before a truncating cast
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sgg - sg * sg) div"
            " (CAST(n AS DECIMAL(38,0)) * sg) AS BIGINT)"
        ).alias("fano_floor_us"),
    ).orderBy("event_type")


# --- Poisson-bootstrap confidence intervals ----------------------------------

# Cumulative Poisson(1) pmf in floor-ppm — the deterministic stand-in
# for per-(row, resample) Poisson draws: a shared integer hash u in
# [0, 1e6) maps to multiplicity k via these literal thresholds, so BOTH
# engines draw the identical bootstrap and neither evaluates exp().
# Generated offline: floor(1e6 * sum_{j<=k} e^-1/j!) for k = 0..7;
# u >= the last threshold caps at multiplicity 8.
_POIS_PPM = [367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989]
_BOOT_B = 40  # resamples; rank 1 / rank 39 = 2.5% / 97.5% disc quantiles
_KNUTH = 2654435761


def _mult_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_PPM)
    )
    return f"CASE {branches} ELSE 8 END"


@register(
    "q_bootstrap_ci",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      CAST(floor(value * 1000000) AS BIGINT) AS vm,
                      event_id % 2147483648 AS fk
               FROM events),
    x AS (SELECT event_type, vm,
                 ((fk * 127 + b) % 2147483648 * {_KNUTH})
                   % 4294967296 % 1000000 AS u, b
          FROM e CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS b)),
    r AS (SELECT event_type, b,
                 SUM({_mult_case_sql('u')}) AS s1,
                 SUM(CAST({_mult_case_sql('u')} AS HUGEINT) * vm) AS sv
          FROM x GROUP BY event_type, b),
    m AS (SELECT event_type, b,
                 CAST(sv // CAST(s1 AS HUGEINT) AS BIGINT) AS mean_b
          FROM r WHERE s1 > 0),
    k AS (SELECT event_type, mean_b,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY mean_b, b) AS rn_a,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY mean_b DESC, b DESC) AS rn_d
          FROM m),
    base AS (SELECT event_type, COUNT(*) AS n_rows,
                    CAST(SUM(CAST(vm AS HUGEINT))
                         // COUNT(*) AS BIGINT) AS mean_micro
             FROM e GROUP BY event_type)
    SELECT base.event_type, base.n_rows, base.mean_micro,
           MAX(CASE WHEN k.rn_a = 1 THEN k.mean_b END) AS ci_lo_micro,
           MAX(CASE WHEN k.rn_d = 2 THEN k.mean_b END) AS ci_hi_micro
    FROM base JOIN k ON base.event_type = k.event_type
    GROUP BY base.event_type, base.n_rows, base.mean_micro
    ORDER BY base.event_type
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence intervals — THE distributed
    bootstrap (per-row multiplicities ~ Poisson(1) instead of a global
    n-with-replacement draw, so resamples need no coordination) made
    fully deterministic: multiplicity comes from the registry's Knuth
    split hash mapped through a literal cumulative-pmf table
    (_POIS_PPM, floor-ppm, generated offline), so both engines draw
    the IDENTICAL 40 resamples and the whole estimator is exact
    integer arithmetic — per-resample means as integral-div micro
    units, CI = rank-1 / rank-39 discrete quantiles with total-order
    tiebreaks. The uncertainty attached to every per-source quality
    mean a curation report ships.

    Plan: the B-fold expansion happens INSIDE the map stage (explode
    of a literal sequence, zero-multiplicity rows dropped before the
    exchange, ~37% of the expansion) and collapses to type x B rows
    via a partial-aggregating hash aggregate, so the only shuffle
    carries |types| * 40 rows at ANY corpus size; the rank windows run
    on that bounded table. Decimal(38,0) weighted sums: multiplicity
    <= 8 x micro values <= 5e8 x 1e12 rows stays 16 orders under the
    ceiling."""
    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000000.0)).alias("vm"),
        F.pmod(F.col("event_id"), F.lit(1 << 31)).alias("fk"),
    )
    x = e.select(
        "event_type",
        "vm",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
        "fk",
    ).select(
        "event_type",
        "vm",
        "b",
        F.pmod(
            F.pmod(
                F.pmod(F.col("fk") * 127 + F.col("b"), F.lit(1 << 31))
                * F.lit(_KNUTH),
                F.lit(1 << 32),
            ),
            F.lit(1000000),
        ).alias("u"),
    )
    mult = F.expr(_mult_case_sql("u"))
    r = (
        x.select("event_type", "b", "vm", mult.alias("mult"))
        .filter(F.col("mult") > 0)
        .groupBy("event_type", "b")
        .agg(
            F.sum("mult").alias("s1"),
            F.sum(F.col("mult").cast("decimal(38,0)") * F.col("vm")).alias("sv"),
        )
    )
    m = r.filter(F.col("s1") > 0).select(
        "event_type",
        "b",
        F.expr("CAST(sv div CAST(s1 AS DECIMAL(38,0)) AS BIGINT)").alias("mean_b"),
    )
    wa = Window.partitionBy("event_type").orderBy("mean_b", "b")
    wd = Window.partitionBy("event_type").orderBy(
        F.col("mean_b").desc(), F.col("b").desc()
    )
    k = m.select(
        "event_type",
        "mean_b",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    base = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(SUM(CAST(vm AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)"
        ).alias("mean_micro"),
    )
    return (
        base.join(k, "event_type")
        .groupBy("event_type", "n_rows", "mean_micro")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("mean_b"))).alias(
                "ci_lo_micro"
            ),
            F.max(F.when(F.col("rn_d") == 2, F.col("mean_b"))).alias(
                "ci_hi_micro"
            ),
        )
        .orderBy("event_type")
    )
