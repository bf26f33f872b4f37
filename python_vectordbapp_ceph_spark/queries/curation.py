"""Data-curation & diagnostics tier (round 6): co-occurrence mining,
robust clipping, corpus-level similarity, dup-cluster analytics,
quality-aware survivor selection, hard-negative mining, skew
diagnosis, and embedding drift stats.

Same determinism discipline as the mining tier: integer/decimal
arithmetic wherever a reduction has unbounded addend count; per-row
double chains are short, fixed-order, and round(…,6); every top-k has
a total-order tiebreak. No logarithms (JVM log ≠ libm log at ulp
level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register
from ._common import T, widen
from .textops import _NORM_SQL, _TOKS_LOWER


# --- within-order co-purchase pairs (market-basket mining) -----------------

@register(
    "q_copurchase_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: item pairs bought in the same
    order, top-20 by support — the association-mining primitive (and,
    on a corpus, the same shape counts tag/entity co-occurrence).
    Scale: baskets are BOUNDED (≤7 items in TPC-H-shaped data, ≤
    basket size generally), so instead of a distinct + self-join (two
    shuffles, both carrying every item row twice) the basket is
    collected per order — one shuffle — and the ≤ k²/2 ordered pairs
    expand IN-ROW from the sorted array with higher-order functions
    (pure codegen, no join). The pair aggregate is partial/final as
    usual; top-20 is TakeOrderedAndProject with a (count, pair) total
    order. An unbounded-basket corpus would cap/df-filter the array
    first (q_fingerprint_pairs' skew guard)."""
    li = T(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = items.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


# --- winsorized (clipped) aggregation --------------------------------------

@register(
    "q_winsorize",
    oracle="""
    WITH c AS (
        SELECT l_returnflag AS flag,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
    cum AS (SELECT flag, v, cnt,
                   SUM(cnt) OVER (PARTITION BY flag ORDER BY v) AS cm,
                   SUM(cnt) OVER (PARTITION BY flag) AS n
            FROM c),
    b AS (SELECT flag,
                 MIN(CASE WHEN cm * 20 >= n THEN v END) AS p05,
                 MIN(CASE WHEN cm * 20 >= 19 * n THEN v END) AS p95
          FROM cum GROUP BY flag)
    SELECT c.flag AS l_returnflag,
           CAST(b.p05 AS DOUBLE) AS p05,
           CAST(b.p95 AS DOUBLE) AS p95,
           SUM(c.cnt) AS n_rows,
           -- DuckDB's LEAST/GREATEST promote DECIMAL to DOUBLE; cast
           -- back so the unbounded SUM stays exact decimal like Spark's
           CAST(SUM(CAST(LEAST(GREATEST(c.v, b.p05), b.p95)
                         AS DECIMAL(18,2)) * c.cnt) AS DOUBLE)
               AS sum_clipped
    FROM c JOIN b USING (flag)
    GROUP BY c.flag, b.p05, b.p95
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation — clip each group's values to its own
    [p5, p95] before summing, the robust-statistics answer to outlier
    contamination in metric pipelines. The bounds are DISCRETE
    percentiles via integer rank thresholds, not interpolated: the
    clip boundary is then an actual 2-decimal data value, so the
    clipped column stays DECIMAL and the weighted sum is exact and
    order-insensitive.

    Scale shape: grouping keys like returnflag have cardinality 3, so
    a per-ROW rank window would funnel the whole table through 3
    window tasks. Instead ranks are derived over DISTINCT (group,
    value) pairs: one fully-parallel composite-key count aggregate,
    then the cumulative window runs over the value DOMAIN (bounded —
    prices, scores) rather than the row count, the same trick as
    q_mad_outliers' integer medians but with the row→domain reduction
    made explicit. cum·20 ≥ n picks the identical discrete percentile
    a row-rank formulation would. Bounds broadcast back onto the
    count table; the clipped sum is count-weighted. Emits sum + count,
    not the mean — no final division to hit a rounding tie
    (q_doc_fluency's lesson)."""
    from ..cache import tracked_persist

    li = T(spark, sf_dir, "lineitem")
    # persisted: the (flag, value) histogram feeds the percentile
    # bounds AND the clipped weighted sum — unpersisted, the lineitem
    # scan + composite-key aggregate ran twice
    c = tracked_persist(
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("flag", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("flag")
    cum = c.select(
        "flag",
        "v",
        "cnt",
        F.sum("cnt").over(wcum).alias("cm"),
        F.sum("cnt").over(wall).alias("n"),
    )
    b = cum.groupBy("flag").agg(
        F.min(F.when(F.col("cm") * 20 >= F.col("n"), F.col("v"))).alias("p05"),
        F.min(F.when(F.col("cm") * 20 >= 19 * F.col("n"), F.col("v"))).alias(
            "p95"
        ),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("p05")), F.col("p95"))
    return (
        c.join(F.broadcast(b), "flag")
        .groupBy("flag", "p05", "p95")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(clipped * F.col("cnt")).cast("double").alias("sum_clipped"),
        )
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("p05").cast("double").alias("p05"),
            F.col("p95").cast("double").alias("p95"),
            "n_rows",
            "sum_clipped",
        )
    )


# --- source-level corpus similarity ----------------------------------------

@register(
    "q_source_similarity",
    oracle=f"""
    WITH toks AS (SELECT source, unnest({_TOKS_LOWER}) AS term
                  FROM documents),
    tf AS (SELECT source, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    nrm AS (SELECT source,
                   sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nn
            FROM tf GROUP BY source),
    dots AS (SELECT a.source AS src_a, b.source AS src_b,
                    SUM(a.c * b.c) AS dot
             FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
             GROUP BY 1, 2)
    SELECT d.src_a, d.src_b,
           round(CAST(d.dot AS DOUBLE) / (na.nn * nb.nn), 6) AS cosine
    FROM dots d
    JOIN nrm na ON na.source = d.src_a
    JOIN nrm nb ON nb.source = d.src_b
    """,
)
def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between SOURCES' unigram count
    vectors — the corpus-composition diagnostic (which domains
    duplicate each other's distribution; which are novel). All the
    unbounded reductions are integer (tf counts, dot products, squared
    norms); the only double math is one sqrt/multiply/divide chain per
    source pair, identical in both engines. Plan: one token explode →
    (source, term) aggregate; the term-keyed self-join's fan-out per
    term is ≤ |sources|² — sources number in the hundreds at worst, so
    the join is bounded the same way q_copurchase_pairs is; norms are
    a |sources|-row broadcast."""
    from ..cache import tracked_persist

    d = T(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tf = tracked_persist(
        d.select("source", F.explode(toks.alias("t")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nrm = tf.groupBy("source").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("nn")
    )
    a = tf.select(F.col("source").alias("src_a"), "term", F.col("c").alias("ca"))
    b = tf.select(F.col("source").alias("src_b"), "term", F.col("c").alias("cb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = nrm.select(F.col("source").alias("src_a"), F.col("nn").alias("na"))
    nb = nrm.select(F.col("source").alias("src_b"), F.col("nn").alias("nb"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.round(
                F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
    )


# --- dup-component size distribution ---------------------------------------

_CC_EDGES_SQL = f"""
    s AS (SELECT doc_id, source,
                 list_distinct(string_split({_NORM_SQL}, ' ')) AS sh
          FROM documents),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(len(a.sh) + len(b.sh)
                       - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                >= 0.5),
    e AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p),
    reach(id, lab) AS (
        SELECT src, src FROM e
        UNION
        SELECT e2.src, r.lab FROM e e2 JOIN reach r ON e2.dst = r.id
    ),
    comps AS (SELECT id, MIN(lab) AS comp FROM reach GROUP BY id)
"""


def _cc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard near-dup pairs blocked by source — the shared
    edge set of the component-analytics queries (same construction as
    q_graph_components)."""
    from ..operators.dedup import jaccard_pairs

    d = T(spark, sf_dir, "documents")
    return jaccard_pairs(
        d, block_col="source", shingle_n=1, threshold=0.5
    ).select("id_a", "id_b")


@register(
    "q_component_sizes",
    oracle=f"""
    WITH RECURSIVE
    {_CC_EDGES_SQL},
    sizes AS (SELECT comp, COUNT(*) AS sz FROM comps GROUP BY comp),
    singles AS (SELECT COUNT(*) AS n1 FROM documents
                WHERE doc_id NOT IN (SELECT id FROM comps))
    SELECT sz AS component_size, COUNT(*) AS n_components
    FROM sizes GROUP BY sz
    UNION ALL
    SELECT 1, n1 FROM singles WHERE n1 > 0
    """,
)
def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster size histogram — the dedup IMPACT report (how much
    of the corpus is duplicated, and in what cluster sizes) that gets
    read before anyone deletes anything. Every node inside an edge set
    has degree ≥1, so size-1 components are exactly the documents in
    no pair: counted distributed-side via anti-join and unioned in —
    the full corpus never converges anywhere. Hash-matches the
    recursive-closure oracle because component labels (min reachable
    id) are algorithm-independent."""
    from ..operators.dedup import dedup_components

    d = T(spark, sf_dir, "documents")
    comps = dedup_components(_cc_pairs(spark, sf_dir))
    sized = (
        comps.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("component_size"))
        .groupBy("component_size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )
    singles = (
        d.join(comps, d["doc_id"] == comps["id"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n1"))
        .filter(F.col("n1") > 0)
        .select(
            F.lit(1).cast("long").alias("component_size"),
            F.col("n1").alias("n_components"),
        )
    )
    return sized.unionByName(singles)


# --- quality-aware dedup survivors -----------------------------------------

@register(
    "q_dedup_best_quality",
    oracle=f"""
    WITH RECURSIVE
    {_CC_EDGES_SQL},
    joined AS (SELECT c.comp, d.doc_id, d.source, d.n_chars
               FROM comps c JOIN documents d ON d.doc_id = c.id),
    ranked AS (SELECT comp, doc_id, source, n_chars,
                      row_number() OVER (PARTITION BY comp
                                         ORDER BY n_chars DESC, doc_id)
                          AS rn
               FROM joined)
    SELECT doc_id, source, n_chars FROM ranked WHERE rn = 1
    UNION ALL
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT id FROM comps)
    """,
)
def q_dedup_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: keep the LONGEST document of
    each near-dup component (tiebreak min id) instead of the min-id
    one — in practice near-dup clusters mix truncated and full copies,
    and min-id keeps a random-quality member while this keeps the most
    complete one. Any quality scalar (q_quality_score's composite)
    drops into the same ORDER BY. Plan: components (iterative
    contraction) → broadcast-size join back to the corpus → one rank
    window partitioned by component → anti-join pass-through for
    untouched docs. The survivors' columns come from the corpus row,
    so downstream (training shuffle, packing) reads them without a
    second join."""
    from ..operators.dedup import dedup_components

    d = T(spark, sf_dir, "documents")
    comps = dedup_components(_cc_pairs(spark, sf_dir))
    joined = comps.join(d, comps["id"] == d["doc_id"]).select(
        "comp", "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("comp").orderBy(F.col("n_chars").desc(), "doc_id")
    best = (
        joined.select(
            "doc_id", "source", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    untouched = d.join(
        comps, d["doc_id"] == comps["id"], "left_anti"
    ).select("doc_id", "source", "n_chars")
    return best.unionByName(untouched)


# --- hard-negative mining ---------------------------------------------------

@register(
    "q_hard_negatives",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
          FROM e WHERE vec_id < 3),
    d AS (SELECT q.q_id, e.vec_id, e.label,
                 round(sqrt(list_sum(list_transform(range(64),
                       i -> (e.v[i+1] - q.qv[i+1]) * (e.v[i+1] - q.qv[i+1])))),
                       6) AS distance
          FROM e CROSS JOIN q
          WHERE e.label <> q.q_label),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY distance, vec_id) AS rn
          FROM d)
    SELECT q_id, vec_id, label, distance FROM r WHERE rn <= 5
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for
    each anchor, the nearest vectors with a DIFFERENT label — the
    negatives that actually move a contrastive loss (random negatives
    are trivially separable). Same plan family as batch KNN
    (broadcast anchors × base scan + per-anchor rank window) with the
    label-mismatch predicate fused into the scan, so filtered rows
    never reach the window. At 100 TB the base side swaps for the IVF
    tier exactly like q_filtered_knn."""
    from ..functions import vector as V

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = (
        e.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("v").alias("qv"),
        )
    )
    d = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.round(V.l2_distance("v", "qv"), 6).alias("distance"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("distance", "vec_id")
    return (
        d.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


# --- hot-key skew diagnosis -------------------------------------------------

@register(
    "q_key_skew",
    oracle="""
    WITH t AS (SELECT o_custkey, COUNT(*) AS n_orders
               FROM orders GROUP BY o_custkey),
    tot AS (SELECT SUM(n_orders) AS total FROM t)
    SELECT o_custkey, n_orders,
           (n_orders * 1000000) // total AS share_ppm
    FROM t CROSS JOIN tot
    ORDER BY n_orders DESC, o_custkey
    LIMIT 20
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis: the top-20 heaviest join/grouping keys with
    their integer-exact corpus share (ppm — no float division). This
    is the query you run BEFORE a big join to decide whether AQE skew
    splitting, salting (operators/skew.py), or a df-cap is needed —
    the skew report is itself just a count aggregate + broadcast
    scalar + TakeOrderedAndProject, safe at any scale."""
    o = T(spark, sf_dir, "orders")
    t = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = t.agg(F.sum("n_orders").alias("total"))
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            "n_orders",
            F.expr("(n_orders * 1000000) div total").alias("share_ppm"),
        )
        .orderBy(F.col("n_orders").desc(), "o_custkey")
        .limit(20)
    )


# --- per-label embedding stats (drift detection) ---------------------------

@register(
    "q_embedding_stats",
    oracle="""
    WITH e AS (SELECT label,
                      round(sqrt(list_sum(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                          AS nrm
               FROM embeddings)
    SELECT label, COUNT(*) AS n,
           CAST(SUM(CAST(nrm AS DECIMAL(28,6))) AS DOUBLE) AS sum_norm,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
    FROM e GROUP BY label
    """,
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm profile — the drift/QA check run on
    every embedding refresh (a model swap or a broken preprocessing
    step shifts norm distributions long before downstream metrics
    notice). Per-row norm is one fixed-order double chain rounded to
    6; the unbounded per-group reduction then happens in
    DECIMAL(28,6), so the sum is exact under any partitioning
    (q_doc_fluency's discipline). min/max of identically-rounded
    doubles are order-insensitive by definition. One scan, one hash
    aggregate."""
    e = T(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: x.cast("double") * x.cast("double"),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    nrm = F.round(F.sqrt(sq), 6)
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("nrm").cast("decimal(28,6)")).cast("double").alias(
                "sum_norm"
            ),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


# --- equal-frequency (quantile) binning ------------------------------------

@register(
    "q_quantile_bins",
    oracle="""
    WITH r AS (SELECT l_returnflag AS flag,
                      CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                      ntile(4) OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice,
                                              l_orderkey, l_linenumber)
                          AS bin
               FROM lineitem)
    SELECT flag AS l_returnflag, bin, COUNT(*) AS n,
           CAST(MIN(v) AS DOUBLE) AS lo,
           CAST(MAX(v) AS DOUBLE) AS hi,
           CAST(SUM(v) AS DOUBLE) AS sum_v
    FROM r GROUP BY flag, bin
    """,
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quartile) binning per group — the feature
    discretization every tabular-training pipeline runs, and the
    equi-depth histogram a CBO builds. ntile's fill rule (first
    n mod k bins get the extra row) is standard SQL, so with an
    identical TOTAL order (value + unique key tiebreak) both engines
    assign identical bins — no interpolation, no floats in the bin
    boundary. Per-bin stats stay decimal-exact. Caveat the plan makes
    visible: ntile needs a PER-ROW rank, so a low-cardinality group
    key funnels each group through one window task — for bin EDGES
    alone use q_winsorize's domain-ranked form (window over distinct
    values); full per-row assignment at extreme scale joins those
    precomputed edges back as range predicates instead of ranking."""
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
            F.ntile(4).over(w).alias("bin"),
        )
        .groupBy("flag", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").cast("double").alias("lo"),
            F.max("v").cast("double").alias("hi"),
            F.sum("v").cast("double").alias("sum_v"),
        )
        .select(
            F.col("flag").alias("l_returnflag"), "bin", "n", "lo", "hi", "sum_v"
        )
    )


# --- power-of-two length histogram -----------------------------------------

@register(
    "q_length_histogram",
    oracle="""
    SELECT (1::BIGINT << k) AS bucket_lo,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars
    FROM (SELECT length(format('{:b}', n_chars)) - 1 AS k, n_chars
          FROM documents WHERE n_chars > 0)
    GROUP BY k
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubling (power-of-2) document-length histogram — the packing
    planner's input (how many sequences fit which context windows) and
    the classic long-tail diagnostic. The bucket is floor(log2(len))
    computed EXACTLY via the binary-string length (no float log to
    disagree at boundaries like len=4096): integers end-to-end, so
    the histogram is partitioning- and engine-independent. One scan,
    one small aggregate."""
    d = T(spark, sf_dir, "documents")
    k = (F.length(F.bin(F.col("n_chars"))) - 1).alias("k")
    return (
        d.filter(F.col("n_chars") > 0)
        .select(k, "n_chars")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.expr("shiftleft(CAST(1 AS BIGINT), k)").alias("bucket_lo"),
            "n_docs",
            "total_chars",
        )
    )


# --- train/valid/test split contamination ----------------------------------

@register(
    "q_split_contamination",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
                    ELSE 'test' END AS split,
               list_filter(string_split({_NORM_SQL}, ' '), x -> x != '')
                   AS tk
        FROM (SELECT doc_id, text,
                     ((((doc_id % 2147483648) + 2147483648) % 2147483648)
                      * 2654435761) % 4294967296 % 100 AS b
              FROM documents)),
    sh AS (SELECT DISTINCT split, doc_id,
                  unnest(list_transform(range(1, len(tk) - 6),
                         i -> array_to_string(tk[i:i+7], ' '))) AS s
           FROM t WHERE len(tk) >= 8),
    g AS (SELECT s, split, COUNT(DISTINCT doc_id) AS n_docs
          FROM sh GROUP BY s, split)
    SELECT a.split AS split_a, b.split AS split_b,
           COUNT(*) AS n_shared_shingles,
           SUM(a.n_docs * b.n_docs) AS doc_pairs
    FROM g a JOIN g b ON a.s = b.s AND a.split < b.split
    GROUP BY 1, 2
    """,
)
def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit via 8-token shingles — the
    benchmark-decontamination measure: an id-hash split keeps each
    DOCUMENT on one side but near-identical documents land on both,
    so eval examples can share long verbatim spans with training data.
    Counts, per split pair, the distinct 8-gram shingles present on
    both sides and the doc-pair incidence behind them. Shape: shingle
    explode → (shingle, split) distinct-doc aggregate → self-join on
    the shingle key (fan-out ≤ 3 splits per shingle — bounded like
    q_copurchase_pairs) → 3-row report. All integers, exact under any
    partitioning. The per-shingle evidence list is one GROUP BY away
    when a violation needs investigating."""
    from ..functions.text import normalize_for_fingerprint
    from ..operators.split import deterministic_split

    d = T(spark, sf_dir, "documents")
    tk = F.filter(
        F.split(normalize_for_fingerprint(F.col("text")), " "),
        lambda x: x != "",
    )
    t = deterministic_split(d, "doc_id").select("doc_id", "split", tk.alias("tk"))
    sh = (
        t.filter(F.size("tk") >= 8)
        .select(
            "split",
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 7),"
                    " i -> array_join(slice(tk, i, 8), ' '))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    g = sh.groupBy("s", "split").agg(F.countDistinct("doc_id").alias("n_docs"))
    a = g.select(F.col("s").alias("sa"), F.col("split").alias("split_a"),
                 F.col("n_docs").alias("na"))
    b = g.select(F.col("s").alias("sb"), F.col("split").alias("split_b"),
                 F.col("n_docs").alias("nb"))
    return (
        a.join(b, (a["sa"] == b["sb"]) & (a["split_a"] < b["split_b"]))
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_shingles"),
            F.sum(F.col("na") * F.col("nb")).alias("doc_pairs"),
        )
    )


# --- n-gram novelty (memorization risk scoring) ----------------------------

@register(
    "q_ngram_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split({_NORM_SQL}, ' '),
                                  x -> x != '') AS tk
               FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, len(tk) - 6),
                         i -> array_to_string(tk[i:i+7], ' '))) AS s
           FROM t WHERE len(tk) >= 8),
    df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS n_novel
    FROM sh JOIN df USING (s)
    GROUP BY sh.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: how many of a doc's 8-token
    shingles appear in NO other document — the memorization-risk /
    information-content score (a doc whose shingles all recur
    elsewhere adds nothing to a training mix; one that is all-novel is
    either valuable or noise). Integer counts end-to-end (the caller
    derives the ratio).

    Plan (r15, guide §2.3 — shuffle keys, not payloads): a df==1
    shingle has exactly ONE owner row in the distinct (doc, shingle)
    table, so novelty attributes through the df aggregate itself
    (min(doc_id) of a singleton group IS the owner) — the join that
    re-shuffled every 8-token shingle STRING back onto the doc stream
    is gone. The heavy shingle bytes now cross one exchange (the df
    aggregate); everything after is doc-keyed counts. Both consumers
    read the persisted distinct explode, as before."""
    from ..cache import tracked_persist
    from ..functions.text import normalize_for_fingerprint

    d = widen(T(spark, sf_dir, "documents"))
    tk = F.filter(
        F.split(normalize_for_fingerprint(F.col("text")), " "),
        lambda x: x != "",
    )
    sh = tracked_persist(
        d.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 7),"
                    " i -> array_join(slice(tk, i, 8), ' '))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    novel = (
        sh.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # deterministic: groups surviving the df==1 filter have one row
            F.min("doc_id").alias("doc_id"),
        )
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return totals.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
    )


# --- salted skew join (driver-visible) --------------------------------------

@register(
    "q_salted_join",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew-salted join (operators/skew.py) under an exact
    oracle: the fact side carries a deterministic xxhash64 row salt,
    the build side replicates salt× via a broadcast range cross, and
    the join key becomes (key, salt) — a hot key's rows spread over
    `salt` partitions instead of overwhelming one. The oracle is the
    PLAIN join: salting must be row-identical to the unsalted plan,
    and the hash gate proves it on real data (the pytest proves it on
    a planted hot key). Deterministic salt (no rand()) keeps stage
    retries exactly-once-safe. This is the manual tool for the hot-key
    case AQE's skew splitting can't fix; q_key_skew is the diagnosis
    query that decides when to reach for it."""
    from ..operators.skew import salted_join

    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salted_join(o, c, on="o_custkey", salt=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


# --- PageRank centrality over the near-dup graph (rows-only) ---------------

@register("q_pagerank")  # float iteration → rows-only; pytest pins values
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the exact-Jaccard near-dup graph: rank ≈ how
    central/canonical a document is within its dup cluster — the
    'most-copied version' signal that complements
    q_dedup_best_quality's length heuristic. Iterative float fixpoint
    → addition order varies with partitioning → rows-only with the
    driver; closed-form graphs (star, cycle) pin absolute values in
    pytest. Plan per iteration: one join + one aggregate, both
    shuffling on node id (operators/graph.py)."""
    from ..operators.graph import pagerank

    ranks = pagerank(_cc_pairs(spark, sf_dir), iterations=10)
    return ranks.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


# --- distinctive vocabulary per source (log-free Monroe odds) --------------

@register(
    "q_distinctive_terms",
    oracle=f"""
    WITH toks AS (SELECT source, unnest({_TOKS_LOWER}) AS term
                  FROM documents),
    tf AS (SELECT source, term, COUNT(*) AS a FROM toks GROUP BY 1, 2),
    per_src AS (SELECT source, SUM(a) AS atot FROM tf GROUP BY source),
    per_term AS (SELECT term, SUM(a) AS ttot FROM tf GROUP BY term),
    tot AS (SELECT SUM(a) AS gtot FROM tf),
    scored AS (
        SELECT tf.source, tf.term,
               CAST((2*tf.a + 1)
                    * (2*(tot.gtot - per_src.atot - (per_term.ttot - tf.a)) + 1)
                    AS DOUBLE)
               / CAST((2*(per_src.atot - tf.a) + 1)
                      * (2*(per_term.ttot - tf.a) + 1) AS DOUBLE) AS odds
        FROM tf
        JOIN per_src USING (source)
        JOIN per_term USING (term)
        CROSS JOIN tot),
    ranked AS (SELECT source, term, odds,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY odds DESC, term) AS rnk
               FROM scored)
    SELECT source, term, round(odds, 6) AS odds_ratio, rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source: which terms over-index in a
    domain vs the rest of the corpus — the Monroe et al. "fightin'
    words" diagnostic that drives domain-mixture decisions. Log-free:
    the score is the +1/2-smoothed odds ratio
    ((2a+1)(2(B-b)+1)) / ((2(A-a)+1)(2b+1)) with a = term count in the
    source, A = source tokens, b = count elsewhere, B = tokens
    elsewhere — monotone in the usual log-odds and built from exact
    integer counts (all products < 2^53), so the double division is
    bit-identical in both engines (no JVM-vs-libm log drift).

    Plan: explode → (source, term) count, then three broadcast-sized
    aggregates (per-source totals, per-term totals, grand total) join
    back; the rank window partitions by source over its VOCABULARY
    (bounded), never over corpus rows. At 100 TB the only big shuffle
    is the (source, term) count — exactly one pass over the tokens."""
    d = T(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tf = (
        d.select("source", F.explode(toks).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    per_src = tf.groupBy("source").agg(F.sum("a").alias("atot"))
    per_term = tf.groupBy("term").agg(F.sum("a").alias("ttot"))
    tot = tf.agg(F.sum("a").alias("gtot"))
    b = F.col("ttot") - F.col("a")
    big_b = F.col("gtot") - F.col("atot")
    odds = (
        ((2 * F.col("a") + 1) * (2 * (big_b - b) + 1)).cast("double")
        / ((2 * (F.col("atot") - F.col("a")) + 1) * (2 * b + 1)).cast("double")
    )
    w = Window.partitionBy("source").orderBy(F.desc("odds"), F.asc("term"))
    return (
        tf.join(F.broadcast(per_src), "source")
        .join(per_term, "term")
        .crossJoin(F.broadcast(tot))
        .withColumn("odds", odds)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "term", F.round("odds", 6).alias("odds_ratio"), "rnk")
    )


# --- join blow-up forecast (self-join cardinality planning) -----------------

@register(
    "q_join_blowup",
    oracle="""
    WITH c AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem
               GROUP BY l_partkey),
    tot AS (SELECT SUM(n * n) AS total_pairs FROM c)
    SELECT l_partkey, n, n * n AS pairs,
           (n * n) * 1000000 // total_pairs AS share_ppm
    FROM c CROSS JOIN tot
    ORDER BY pairs DESC, l_partkey
    LIMIT 20
    """,
)
def q_join_blowup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join output-size forecast: |A ⋈_k A| = Σ_k c(k)² computed
    EXACTLY from the key histogram, plus the top-20 keys by their
    pair contribution and integer-ppm share of the total. This is the
    planning query you run BEFORE any similarity/blocking self-join at
    100 TB — it costs one aggregation of the key column, and its
    output tells you whether the join is feasible at all, which keys
    need a df-cap (q_fingerprint_pairs' guard) or salting, and what
    shuffle volume to expect. Complements q_key_skew (per-side
    hotness) with the JOIN-OUTPUT view (hotness squared). One hash
    aggregate + broadcast scalar + TakeOrderedAndProject; scale-free."""
    li = T(spark, sf_dir, "lineitem")
    c = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    # n² and Σn² promoted to decimal(38,0) BEFORE multiplying: a hot key
    # with n ≳ 96k rows overflows int64 at (n²)·10⁶ — exactly the skew
    # regime this diagnostic exists to catch (DuckDB auto-promotes to
    # HUGEINT, so staying in int64 also diverges from the oracle at
    # scale). Same promotion discipline as q_spearman_trend /
    # streaming/drift.py::batch_tvd_ppm.
    d38 = "decimal(38,0)"
    nsq = F.col("n").cast(d38) * F.col("n").cast(d38)
    tot = c.agg(F.sum(nsq).cast(d38).alias("total_pairs"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "n",
            nsq.cast("long").alias("pairs"),
            # integral div = exact floor; decimal `/` rounds HALF_UP
            # at scale 6 before a truncating cast (off-by-one risk)
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * n * 1000000)"
                " div total_pairs AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.col("pairs").desc(), "l_partkey")
        .limit(20)
    )


# --- k-core of the co-purchase graph ---------------------------------------

def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled peeling fixpoint: each round removes degree<k nodes.
    Peeling is idempotent once stable, so unrolling MORE rounds than
    the actual peel depth is exact (extra rounds are no-ops); the
    Spark side raises if the depth ever exceeds its max_iter."""
    sql = [
        """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
          FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                                   AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
    e0 AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM p WHERE n >= 2
           UNION ALL
           SELECT pb AS src, pa AS dst FROM p WHERE n >= 2)"""
    ]
    for i in range(1, rounds + 1):
        sql.append(
            f""",
    k{i} AS MATERIALIZED (SELECT src FROM (SELECT src, COUNT(*) AS c
             FROM e{i-1} GROUP BY src) WHERE c >= {k}),
    e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i-1} e
             JOIN k{i} a ON e.src = a.src
             JOIN k{i} b ON e.dst = b.src)"""
        )
    sql.append(
        f"""
    SELECT DISTINCT src AS id FROM e{rounds} ORDER BY id"""
    )
    return "".join(sql)


# rounds=50 matches operators/graph.py::kcore's max_iter=50 exactly:
# peeling is idempotent once stable, so unrolling to the Spark side's
# iteration cap means the oracle can never be under-peeled relative to
# any run the Spark side completes (it raises past max_iter). Extra
# rounds on an already-stable edge set are cheap identity passes.
@register("q_kcore", oracle=_kcore_oracle(k=3, rounds=50))
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph (parts linked when bought
    together in ≥2 orders): the maximal subgraph where every node
    keeps ≥3 such links — the dense-cluster detector. On a document
    similarity graph the same operator flags template farms / SEO
    clusters (organic near-dup pairs don't assemble into tight cores);
    here it mines the persistently co-bought assortment. Exact oracle
    = the peeling fixpoint unrolled past its measured depth (≤10
    rounds across SFs; 14 unrolled — extra rounds are identity).
    operators/graph.py::kcore does the distributed peel: per round one
    degree aggregate + two semi-joins, all keyed on node id, edge set
    checkpointed so plans don't nest, cost tracking the SHRINKING
    frontier.

    Pair build (r15): baskets are bounded (≤7 items in TPC-H-shaped
    data), so the q_copurchase_pairs shape applies — collect the sorted
    basket per order (ONE shuffle) and expand the ≤k²/2 ordered pairs
    in-row with higher-order functions, instead of the distinct +
    self-join that shuffled every item row twice. Pair multiset (and
    thus the n≥2 filter) is identical; this build dominated the
    query's wall (the driver peel itself measures ~0 ms at sf0.1)."""
    from ..operators.graph import kcore

    li = T(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        items.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    return kcore(pairs, k=3, id_a="pa", id_b="pb").orderBy("id")


# --- Gini coefficient of spend concentration --------------------------------

@register(
    "q_gini_spend",
    oracle="""
    WITH s AS (SELECT c.c_nationkey AS nation, o.o_custkey,
                      SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    r AS (SELECT nation, x,
                 row_number() OVER (PARTITION BY nation
                                    ORDER BY x, o_custkey) AS rnk
          FROM s),
    g AS (SELECT nation, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(rnk * x) AS srx
          FROM r GROUP BY nation)
    SELECT nation, n,
           CAST(sx AS DOUBLE) AS total_spend,
           round((2.0 * CAST(srx AS DOUBLE)
                  - (n + 1) * CAST(sx AS DOUBLE))
                 / (n * CAST(sx AS DOUBLE)), 6) AS gini
    FROM g ORDER BY nation
    """,
)
def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend within each nation —
    the concentration/imbalance diagnostic (the same statistic audits
    a training mix: Gini of per-source token counts says whether one
    source dominates the corpus). Exact rank formulation
    G = (2·Σrᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with DECIMAL spend sums and a
    total-order rank tiebreak; one double division at the end.
    Scale shape: the rank window is PARTITIONED per nation over the
    customer-level aggregate (already reduced by the first groupBy),
    and the Gini assembly is a per-nation hash aggregate — the
    aggregate-before-window discipline throughout."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    r = s.select(
        "nation",
        "x",
        F.row_number()
        .over(Window.partitionBy("nation").orderBy("x", "o_custkey"))
        .alias("rnk"),
    )
    g = r.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("rnk") * F.col("x")).alias("srx"),
    )
    return g.select(
        "nation",
        "n",
        F.col("sx").cast("double").alias("total_spend"),
        F.round(
            (
                2.0 * F.col("srx").cast("double")
                - (F.col("n") + 1) * F.col("sx").cast("double")
            )
            / (F.col("n") * F.col("sx").cast("double")),
            6,
        ).alias("gini"),
    ).orderBy("nation")


# --- per-source duplicate rate ----------------------------------------------

@register(
    "q_dup_rate_by_source",
    oracle="""
    WITH f AS (SELECT doc_id, source,
                      md5(trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')))
                          AS fp
               FROM documents),
    df AS (SELECT fp, COUNT(*) AS n_docs FROM f GROUP BY fp)
    SELECT f.source,
           COUNT(*) AS n,
           SUM(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup,
           SUM(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) * 1000000
               // COUNT(*) AS dup_ppm
    FROM f JOIN df ON f.fp = df.fp
    GROUP BY f.source
    ORDER BY f.source
    """,
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source (integer ppm) — the
    corpus-health scoreboard that decides which feeds need dedup
    attention BEFORE paying for near-dup LSH on everything. One
    fingerprint projection, one df aggregate on the fingerprint key,
    one join back on that same key (both sides hash-partitioned on fp
    — Catalyst plans a single exchange each), one per-source
    aggregate. All counts integer end-to-end."""
    from ..functions.text import fingerprint

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    df_ = d.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        d.join(df_, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "source",
            "n",
            "n_dup",
            F.expr("n_dup * 1000000 div n").alias("dup_ppm"),
        )
        .orderBy("source")
    )


# --- cross-source syndication -----------------------------------------------

@register(
    "q_cross_source_dups",
    oracle="""
    WITH f AS (SELECT DISTINCT source,
                      md5(trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')))
                          AS fp
               FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS shared_docs
    FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY shared_docs DESC, source_a, source_b
    LIMIT 20
    """,
)
def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syndication detection: source pairs sharing identical
    (fingerprint-equal) documents — mirror sites, wire-copy reposts,
    scraped aggregators. Exactly the q_containment_pairs question at
    the whole-document level, answered with one distinct projection
    and a fingerprint-keyed self-join (per-fp fan-out bounded by the
    source count, so no df-cap is needed — the key's cardinality
    ceiling is structural). Top-20 via TakeOrderedAndProject."""
    from ..functions.text import fingerprint

    f = (
        T(spark, sf_dir, "documents")
        .select("source", fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    a = f.select(F.col("source").alias("source_a"), "fp")
    b = f.select(F.col("source").alias("source_b"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, (a["fp"] == b["fp_b"]) & (a["source_a"] < b["source_b"]))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_docs"))
        .orderBy(F.col("shared_docs").desc(), "source_a", "source_b")
        .limit(20)
    )


# --- grid-bucketed spatial radius join --------------------------------------

@register(
    "q_spatial_radius_join",
    oracle="""
    WITH p AS (SELECT c_custkey AS id,
                      round(CAST(c_acctbal AS DOUBLE) / 100.0, 6) AS x,
                      round(CAST((c_custkey * 2654435761) % 100000 AS DOUBLE)
                            / 1000.0, 6) AS y
               FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           round(sqrt((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)), 6) AS dist
    FROM p a JOIN p b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0
    ORDER BY id_a, id_b
    """,
)
def q_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join (all point pairs within r=2) via
    GRID-CELL BUCKETING — the geohash-join pattern: each point lands
    in an r×r cell; one side additionally explodes into its 3×3
    neighbor cells; the join is then an EQUI-join on cell id and only
    cell-local pairs pay the exact distance check. The oracle computes
    the same result the naive quadratic way — the point is that the
    Spark plan is the one that survives 100 TB: candidate fan-out is
    9×(points per cell) per point instead of N, shuffles hash on the
    cell key, and skewed (dense) cells are visible to AQE like any
    hot key. Points derive deterministically from customer columns
    (synthetic coordinates — the tables carry no geo data; the
    OPERATOR is the deliverable)."""
    r = 2.0
    c = T(spark, sf_dir, "customer")
    p = c.select(
        F.col("c_custkey").alias("id"),
        F.round(F.col("c_acctbal").cast("double") / 100.0, 6).alias("x"),
        F.round(
            ((F.col("c_custkey") * F.lit(2654435761)) % 100000).cast("double")
            / 1000.0,
            6,
        ).alias("y"),
    )
    cellx = F.floor(F.col("x") / r)
    celly = F.floor(F.col("y") / r)
    a = p.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(*[F.lit(d) for d in range(-1, 2)])
        ).alias("dx"),
    ).select(
        "id_a",
        "xa",
        "ya",
        "dx",
        F.explode(F.array(*[F.lit(d) for d in range(-1, 2)])).alias("dy"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.floor(F.col("xa") / r) + F.col("dx")).alias("cx"),
        (F.floor(F.col("ya") / r) + F.col("dy")).alias("cy"),
    )
    b = p.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cellx.alias("cx"),
        celly.alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= r * r)
        .select(
            "id_a",
            "id_b",
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )
