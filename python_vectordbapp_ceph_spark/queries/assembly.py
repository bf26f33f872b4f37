"""Training-run assembly & corpus forensics tier (round 7): token-
budget shard packing, weighted quantiles, changepoint detection,
Benford data-quality audit, hapax-token quality signal, template-
prefix duplicate groups, label-balanced subsetting, and the one-call
dataset card.

These are the steps between a curated corpus and an actual training
run: deciding shard boundaries, checking the corpus didn't drift or
get injected with synthetic numerics, balancing classes, and stamping
the summary card that travels with the dataset.

Same determinism discipline as every tier (queries/__init__.py):
integer/decimal arithmetic for unbounded reductions, round(…,6)
per-row doubles, integer ppm ratios, total-order tiebreaks, no
logarithms (Benford's log-law expectations enter as integer literal
ppm, computed nowhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register
from ._common import T
from .textops import _TOKS_LOWER

_TOKS = lambda: F.filter(  # noqa: E731
    F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
)


# --- token-budget shard packing ---------------------------------------------

_SHARD_BUDGET = 10_000  # tokens per training shard

@register(
    "q_token_shards",
    oracle=f"""
    WITH t AS (SELECT doc_id, len({_TOKS_LOWER}) AS n_tokens,
                      md5(doc_id || ':7') AS k
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY k, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
    SELECT doc_id, n_tokens, (cum - n_tokens) // {_SHARD_BUDGET} AS shard_id
    FROM c ORDER BY doc_id
    """,
)
def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment: documents are laid out in the
    deterministic shuffle order (md5(id:salt), the q_shuffle_order
    deal) and packed greedily into ~equal-token shards — shard_id is
    the shard containing the document's FIRST token, so a document is
    never split and every shard holds ≥ budget tokens except the last.
    This is the step that turns a curated corpus into the actual
    numbered training shards a loader streams.

    Scale shape: the global running token count is the two-phase
    distributed cumsum (operators/twophase.py) — range-partitioned
    partial sums + broadcast prefix offsets; no corpus-sized window
    ever lands on one task. Everything else is per-row arithmetic."""
    from ..operators.twophase import global_cumsum

    d = T(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(_TOKS()).alias("n_tokens"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7"))).alias("_k"),
    )
    c = global_cumsum(t, ["_k", "doc_id"], "n_tokens", cum_col="cum")
    return (
        c.select(
            "doc_id",
            "n_tokens",
            F.expr(f"(cum - n_tokens) div {_SHARD_BUDGET}").alias("shard_id"),
        )
        .orderBy("doc_id")
    )


# --- token-weighted global length quantiles ---------------------------------

@register(
    "q_weighted_quantiles",
    oracle=f"""
    WITH h AS (SELECT n_chars AS v, SUM(len({_TOKS_LOWER})) AS w
               FROM documents GROUP BY n_chars),
    c AS (SELECT v, w,
                 SUM(w) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM h),
    tot AS (SELECT SUM(w) AS total FROM h),
    p AS (SELECT unnest([25, 50, 75, 90]) AS pct)
    SELECT p.pct, MIN(c.v) AS value
    FROM p CROSS JOIN tot JOIN c ON c.cum * 100 >= p.pct * tot.total
    GROUP BY p.pct ORDER BY p.pct
    """,
)
def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-weighted document-length quantiles: the p-th value v such
    that documents of length ≤ v carry ≥ p% of the corpus's tokens.
    Length quantiles weighted by row count answer "how long are my
    docs"; weighted by tokens they answer the question that prices a
    training run — "where does the token MASS sit". Exact integer
    test (cum·100 ≥ pct·total), no interpolation, no floats.

    Scale shape: weights collapse to the distinct-length histogram
    first; its global cumsum is two-phased (operators/twophase.py);
    the quantile probe is a 4-row broadcast literal joined against the
    histogram and min-reduced — never a sort of rows."""
    from ..operators.twophase import global_cumsum

    d = T(spark, sf_dir, "documents")
    h = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.size(_TOKS())).alias("w")
    )
    c = global_cumsum(h, ["v"], "w", cum_col="cum")
    tot = h.agg(F.sum("w").alias("total"))
    p = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in (25, 50, 75, 90)])).alias("pct")
    )
    return (
        F.broadcast(p)
        .crossJoin(F.broadcast(tot))
        .join(c, F.col("cum") * 100 >= F.col("pct") * F.col("total"))
        .groupBy("pct")
        .agg(F.min("v").alias("value"))
        .orderBy("pct")
    )


# --- CUSUM changepoint over the daily event series --------------------------

@register(
    "q_cusum_changepoint",
    oracle="""
    WITH daily AS (SELECT event_type,
                          strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                          COUNT(*) AS c
                   FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, day, c,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
                 SUM(c) OVER (PARTITION BY event_type) AS total,
                 COUNT(*) OVER (PARTITION BY event_type) AS nd
          FROM daily),
    dev AS (SELECT event_type, day,
                   abs(CAST(cum AS DECIMAL(38,0)) * nd
                       - CAST(i AS DECIMAL(38,0)) * total) AS d,
                   CAST(total AS DECIMAL(38,0)) * nd AS denom
            FROM s),
    r AS (SELECT event_type, day,
                 CAST(floor(d * 1000000 / denom) AS BIGINT) AS dev_ppm,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY d DESC, day) AS rnk
          FROM dev)
    SELECT event_type, day AS change_day, dev_ppm
    FROM r WHERE rnk = 1 ORDER BY event_type
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the day where the
    cumulative event share deviates most from the uniform-time share —
    max |cum_i/total − i/n_days|, integerized as |cum_i·n_days −
    i·total| so the argmax is exact, reported in ppm. The ingest-rate
    regime-shift detector: a pipeline whose source changed behavior
    mid-month shows a spike at the switch day.

    Arithmetic in decimal(38,0) BEFORE the products: cum reaches
    `total` (~1e12 rows/type at 100 TB) and n_days·total·10⁶ overflows
    int64 — the q_ks_drift lesson applied at birth. Windows are
    PARTITIONED by event_type over day-count-bounded series (≤ one row
    per day per type after the first aggregate). The CUSUM assembly is
    operators/changepoint.py — shared verbatim with the streaming
    monitor (streaming/changepoint.py), so the continuously-maintained
    answer cannot drift from this batch definition."""
    from ..operators.changepoint import cusum_changepoints

    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return cusum_changepoints(daily, "event_type", "day", "c")


# --- Benford first-digit audit ----------------------------------------------

# Benford's law P(d) = log10(1 + 1/d) as integer ppm LITERALS — the
# log is a published constant table, never computed at query time (the
# no-logarithms determinism rule).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}

@register(
    "q_benford_digits",
    oracle=f"""
    WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS BIGINT) AS digit
               FROM orders WHERE o_totalprice > 0),
    h AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM h),
    b(digit, benford_ppm) AS (VALUES {", ".join(f"({k}, {v})" for k, v in _BENFORD_PPM.items())})
    SELECT b.digit, COALESCE(h.n, 0) AS n,
           COALESCE(h.n, 0) * 1000000 // tot.total AS share_ppm,
           b.benford_ppm,
           COALESCE(h.n, 0) * 1000000 // tot.total - b.benford_ppm AS dev_ppm
    FROM b LEFT JOIN h ON b.digit = h.digit CROSS JOIN tot
    ORDER BY b.digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals: observed
    digit shares vs Benford's log-law expectation, both in integer
    ppm. The classic synthetic-data / injected-records detector — real
    multiplicative-process numerics lean on 1s and 2s; generated or
    tampered columns go uniform and the dev_ppm column lights up.

    One hash aggregate over a per-row substring, a broadcast scalar
    total, and a 9-row literal expectation table — scale-free. The
    Benford probabilities are integer literals (no log at runtime)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    h = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = h.agg(F.sum("n").alias("total"))
    b = F.broadcast(
        spark.createDataFrame(
            sorted(_BENFORD_PPM.items()), "digit long, benford_ppm long"
        )
    )
    return (
        b.join(h, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.expr("coalesce(n, 0) * 1000000 div total").alias("share_ppm"),
            "benford_ppm",
            (
                F.expr("coalesce(n, 0) * 1000000 div total")
                - F.col("benford_ppm")
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


# --- hapax-token share per document -----------------------------------------

@register(
    "q_hapax_share",
    oracle=f"""
    WITH dt AS (SELECT DISTINCT doc_id, unnest({_TOKS_LOWER}) AS tok
                FROM documents),
    df AS (SELECT tok, COUNT(*) AS n_docs FROM dt GROUP BY tok),
    per AS (SELECT dt.doc_id,
                   COUNT(*) AS n_distinct,
                   SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS n_hapax
            FROM dt JOIN df ON dt.tok = df.tok
            GROUP BY dt.doc_id)
    SELECT doc_id, n_distinct, n_hapax,
           n_hapax * 1000000 // n_distinct AS hapax_ppm
    FROM per ORDER BY hapax_ppm DESC, doc_id LIMIT 20
    """,
)
def q_hapax_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document share of corpus-hapax tokens (tokens appearing in
    exactly one document). High hapax share flags OCR garbage, random
    identifiers, and code dumps — vocabulary that buys no cross-doc
    generalization; near-zero share flags boilerplate. The complement
    of q_boilerplate_ngrams on the SAME posting list.

    Scale shape: one distinct (doc, token) explode (the posting list,
    persisted once, consumed twice), a token-keyed df aggregate, a
    shuffle equi-join back on token (vocab-keyed, deliberately NOT
    broadcast — vocabulary grows with the corpus), one per-doc hash
    aggregate, TakeOrdered top-20."""
    from ..cache import tracked_persist

    d = T(spark, sf_dir, "documents")
    dt = tracked_persist(
        d.select("doc_id", F.explode(_TOKS()).alias("tok")).distinct()
    )
    df_ = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("n_docs"))
    per = (
        dt.join(df_, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
    )
    return (
        per.select(
            "doc_id",
            "n_distinct",
            "n_hapax",
            F.expr("n_hapax * 1000000 div n_distinct").alias("hapax_ppm"),
        )
        .orderBy(F.col("hapax_ppm").desc(), "doc_id")
        .limit(20)
    )


# --- template-prefix duplicate groups ---------------------------------------

_PREFIX_LEN = 8

@register(
    "q_prefix_groups",
    oracle=f"""
    WITH p AS (SELECT doc_id,
                      md5(array_to_string(({_TOKS_LOWER})[1:{_PREFIX_LEN}], ' '))
                          AS prefix_hash
               FROM documents
               WHERE len({_TOKS_LOWER}) >= {_PREFIX_LEN})
    SELECT prefix_hash, COUNT(*) AS n_docs, MIN(doc_id) AS exemplar
    FROM p GROUP BY prefix_hash HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, prefix_hash
    LIMIT 20
    """,
)
def q_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-opener detection: documents sharing an identical
    first-{_PREFIX_LEN}-token prefix, grouped by the prefix hash.
    Catches the mass-produced page class near-dup shingling can
    dilute — SEO templates and licence headers share their OPENING
    verbatim even when tails diverge. Docs shorter than the prefix
    are excluded (their "prefix" is the whole doc — that's
    q_dedup_exact's job).

    One per-row hash projection + one hash aggregate + TakeOrdered:
    group state is (hash, count, min-id) — bytes per group, no text
    shuffled, scale-free."""
    d = T(spark, sf_dir, "documents")
    toks = _TOKS()
    p = d.filter(F.size(toks) >= _PREFIX_LEN).select(
        "doc_id",
        F.md5(F.array_join(F.slice(toks, 1, _PREFIX_LEN), " ")).alias(
            "prefix_hash"
        ),
    )
    return (
        p.groupBy("prefix_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("exemplar"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix_hash")
        .limit(20)
    )


# --- label-balanced subset ---------------------------------------------------

_BALANCE_CAP = 30

@register(
    "q_balanced_sample",
    oracle=f"""
    WITH r AS (SELECT vec_id, label,
                      row_number() OVER (PARTITION BY label
                          ORDER BY md5(vec_id || ':13'), vec_id) AS rnk
               FROM embeddings)
    SELECT vec_id, label, rnk FROM r WHERE rnk <= {_BALANCE_CAP}
    ORDER BY label, rnk
    """,
)
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balanced subset: at most {_BALANCE_CAP} rows per label,
    chosen by deterministic hash rank (md5(id:salt)) — reproducible
    across runs, partitionings, and engines, unlike rand(seed). The
    class-rebalancing step before fine-tuning on skewed labels; the
    salt re-deals the selection without touching data.

    The rank-≤-k predicate compiles to WindowGroupLimit (Spark 4):
    each map task pre-prunes to its local top-k per label BEFORE the
    shuffle, so the exchange carries O(labels·k) rows per task, not
    the table — the same physical shape as q_grouped_knn."""
    e = T(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":13"))), "vec_id"
    )
    return (
        e.select("vec_id", "label", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= _BALANCE_CAP)
        .orderBy("label", "rnk")
    )


# --- the dataset card --------------------------------------------------------

@register(
    "q_dataset_card",
    oracle=f"""
    WITH s AS (SELECT COUNT(*) AS n_docs,
                      COUNT(DISTINCT source) AS n_sources,
                      COUNT(DISTINCT lang) AS n_langs,
                      SUM(len({_TOKS_LOWER})) AS total_tokens,
                      COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups,
                      MIN(n_chars) AS min_chars,
                      MAX(n_chars) AS max_chars,
                      SUM(n_chars) AS sum_chars
               FROM documents)
    SELECT 'n_docs' AS metric, CAST(n_docs AS BIGINT) AS value FROM s
    UNION ALL SELECT 'n_sources', n_sources FROM s
    UNION ALL SELECT 'n_langs', n_langs FROM s
    UNION ALL SELECT 'total_tokens', total_tokens FROM s
    UNION ALL SELECT 'exact_dup_ppm', n_exact_dups * 1000000 // n_docs FROM s
    UNION ALL SELECT 'min_chars', min_chars FROM s
    UNION ALL SELECT 'max_chars', max_chars FROM s
    UNION ALL SELECT 'mean_chars_ppm', sum_chars * 1000000 // n_docs FROM s
    ORDER BY metric
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one call: corpus size, source/language
    breadth, token volume, exact-dup rate, and length spread as a
    (metric, value) table — the summary block every curated-dataset
    release ships with, and the cheap drift check between pipeline
    runs (diff two cards). All-integer outputs (ppm for ratios) so
    the card is byte-stable across engines.

    ONE scan, ONE aggregate: every metric — including both count-
    distincts and the dup count — reduces in a single pass (Spark
    plans multi-distinct via a single expand), then stack() unpivots
    the 1-row result. No window, no join, no second scan."""
    d = T(spark, sf_dir, "documents")
    s = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.size(_TOKS())).alias("total_tokens"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return (
        s.selectExpr(
            """stack(8,
                'n_docs', CAST(n_docs AS BIGINT),
                'n_sources', CAST(n_sources AS BIGINT),
                'n_langs', CAST(n_langs AS BIGINT),
                'total_tokens', total_tokens,
                'exact_dup_ppm', CAST(n_exact_dups AS DECIMAL(38,0)) * 1000000 div n_docs,
                'min_chars', min_chars,
                'max_chars', max_chars,
                'mean_chars_ppm', CAST(sum_chars AS DECIMAL(38,0)) * 1000000 div n_docs
            ) AS (metric, value)"""
        )
        .orderBy("metric")
    )


# --- the shard manifest ------------------------------------------------------

@register(
    "q_shard_manifest",
    oracle=f"""
    WITH t AS (SELECT doc_id, len({_TOKS_LOWER}) AS n_tokens,
                      md5(doc_id || ':7') AS k
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY k, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t),
    a AS (SELECT doc_id, n_tokens,
                 (cum - n_tokens) // {_SHARD_BUDGET} AS shard_id
          FROM c)
    SELECT shard_id, COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM a GROUP BY shard_id ORDER BY shard_id
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest a training loader consumes: per shard, its doc
    count, token total, and doc-id range — the q_token_shards
    assignment rolled up to one row per shard. This is the artifact
    that gets diffed between pipeline runs (same corpus + same salt ⇒
    byte-identical manifest) and the file a resumable loader seeks
    into. One hash aggregate over the assignment; the assignment
    itself is the two-phase distributed cumsum — nothing here adds a
    scale term."""
    a = q_token_shards(spark, sf_dir)
    return (
        a.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard_id")
    )


# --- calendar coverage gaps --------------------------------------------------

@register(
    "q_calendar_gaps",
    oracle="""
    WITH obs AS (SELECT event_type,
                        CAST(date_trunc('day', ts) AS DATE) AS day
                 FROM events GROUP BY 1, 2),
    span AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi,
                    COUNT(*) AS n_days
             FROM obs GROUP BY event_type),
    cal AS (SELECT s.event_type,
                   unnest(generate_series(s.lo, s.hi,
                                          INTERVAL 1 DAY))::DATE AS day
            FROM span s),
    missing AS (SELECT c.event_type, c.day
                FROM cal c LEFT JOIN obs o
                  ON c.event_type = o.event_type AND c.day = o.day
                WHERE o.day IS NULL)
    SELECT s.event_type,
           CAST(hi - lo AS BIGINT) + 1 AS span_days,
           s.n_days AS observed_days,
           CAST(hi - lo AS BIGINT) + 1 - s.n_days AS missing_days,
           COALESCE(strftime(MIN(m.day), '%Y-%m-%d'), '') AS first_missing
    FROM span s LEFT JOIN missing m ON s.event_type = m.event_type
    GROUP BY s.event_type, s.lo, s.hi, s.n_days
    ORDER BY s.event_type
    """,
)
def q_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-outage detector: per event type, the calendar span
    between its first and last day, how many days actually carry data,
    and the first missing day — the "did a feed silently stop"
    data-quality check that row counts and schema checks can't see.

    Scale shape: rows collapse to (type, day) FIRST (one hash
    aggregate with map-side combine); the calendar explode is
    sequence() over the span — bounded by days, not rows; the
    anti-join runs on the day-level table. Nothing downstream of the
    first aggregate ever sees event-level data."""
    e = T(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.lit(1).alias("_x"))
    span = obs.groupBy("event_type").agg(
        F.min("day").alias("lo"),
        F.max("day").alias("hi"),
        F.count(F.lit(1)).alias("observed_days"),
    )
    cal = span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day"),
    )
    missing = cal.join(obs.select("event_type", "day"), ["event_type", "day"], "left_anti")
    return (
        span.join(
            missing.groupBy("event_type").agg(
                F.min("day").alias("_first_missing")
            ),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            (F.datediff("hi", "lo") + 1).cast("long").alias("span_days"),
            "observed_days",
            (F.datediff("hi", "lo") + 1 - F.col("observed_days"))
            .cast("long")
            .alias("missing_days"),
            F.coalesce(
                F.date_format("_first_missing", "yyyy-MM-dd"), F.lit("")
            ).alias("first_missing"),
        )
        .orderBy("event_type")
    )


# --- mixture-weighted shard packing ------------------------------------------

_MIX_SHARD_DOCS = 50  # docs per mixture shard

@register(
    "q_mixture_shards",
    oracle="""
    WITH sz AS (SELECT source, COUNT(*) AS n_s, SUM(n_chars) AS len_s
                FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_s) AS n_total, SUM(len_s) AS len_total FROM sz),
    rates AS (
        SELECT sz.source,
               LEAST(100, (50 * (sz.len_s // sz.n_s))
                          // (tot.len_total // tot.n_total)) AS rate_pct
        FROM sz CROSS JOIN tot),
    sel AS (SELECT d.doc_id, d.source, md5(d.doc_id || ':7') AS k
            FROM documents d JOIN rates r ON r.source = d.source
            WHERE ((((d.doc_id % 2147483648) + 2147483648) % 2147483648)
                   * 2654435761) % 4294967296 % 100 < r.rate_pct),
    idx AS (SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY k, doc_id) AS i
            FROM sel),
    ns AS (SELECT source, COUNT(*) AS n_sel FROM sel GROUP BY source),
    v AS (SELECT idx.doc_id, idx.source,
                 (idx.i * 1000000000000) // ns.n_sel AS vkey
          FROM idx JOIN ns ON ns.source = idx.source),
    r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (ORDER BY vkey, source, doc_id) AS rnk
          FROM v)
    SELECT doc_id, source, (rnk - 1) // 50 AS shard_id
    FROM r ORDER BY doc_id
    """,
)
def q_mixture_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted shard packing — q_token_shards composed with
    q_domain_mixture's per-source keep rates: the mixture filter picks
    the training subset, then STRIDE INTERLEAVING lays sources out so
    every shard carries each source at its corpus ratio (each source's
    j-th selected doc gets virtual position j/n_s; merging the streams
    by position is the classic weighted round-robin, so any K-doc
    window holds ~K·n_s/N docs of source s — within one doc, pinned by
    pytest). A training loader streaming shards in order then sees the
    prescribed mixture CONTINUOUSLY, not source-clumped — no
    per-batch reweighting needed at the consumer.

    Determinism/exactness: virtual positions are integer
    (j·10^12 div n_s, decimal(38,0) before the product), the merge
    order is the total order (vkey, source, doc_id), and membership is
    the Knuth-hash bucket — identical in both engines. Scale shape:
    BOTH ranks are two-phased. The per-source index does NOT use a
    source-partitioned window (one giant source would serialize
    through one task): sources are contiguous blocks of the
    (source, key, id) total order, so i_s = two-phase global rank −
    broadcast per-source prefix offset (the q_epoch_shuffle block
    trick with unequal blocks); the interleave rank is a second
    two-phase cumsum. The only unpartitioned windows are the
    ≤num-partitions / ≤num-sources offset ones.
    """
    from ..operators.split import split_bucket
    from ..operators.twophase import fits_single_task, global_cumsum

    d = T(spark, sf_dir, "documents")
    sz = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum("n_chars").alias("len_s")
    )
    tot = sz.agg(
        F.sum("n_s").alias("n_total"), F.sum("len_s").alias("len_total")
    )
    rates = sz.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(100).cast("long"),
            F.expr("(50 * (len_s div n_s)) div (len_total div n_total)"),
        ).alias("rate_pct"),
    )
    sel = (
        d.join(F.broadcast(rates), "source")
        .filter(split_bucket("doc_id") < F.col("rate_pct"))
        .select(
            "doc_id",
            "source",
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(":7"))
            ).alias("_k"),
        )
    )
    # one gate decision threads BOTH cumsums: v below holds exactly one
    # row per sel row (same cardinality), but its plan hangs off sel's
    # not-yet-filled persist whose size estimate is unusable — the
    # caller knows the invariant the optimizer cannot see
    small = fits_single_task(sel)
    g = global_cumsum(
        sel, ["source", "_k", "doc_id"], F.lit(1), cum_col="_g",
        single_task=small,
    )
    # per-source counts off g (the cumsum's PERSISTED range partitions)
    # rather than sel — counting sel would re-run the documents scan +
    # mixture join/filter a second time for the same numbers
    ns = g.groupBy("source").agg(F.count(F.lit(1)).alias("n_sel"))
    w_off = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
    off = ns.select(
        "source",
        "n_sel",
        F.coalesce(F.sum("n_sel").over(w_off), F.lit(0)).alias("_off"),
    )
    v = g.join(F.broadcast(off), "source").select(
        "doc_id",
        "source",
        F.expr(
            "(CAST(_g - _off AS DECIMAL(38,0)) * 1000000000000) div n_sel"
        ).alias("vkey"),
    )
    r = global_cumsum(
        v, ["vkey", "source", "doc_id"], F.lit(1), cum_col="_rnk",
        single_task=small,
    )
    return (
        r.select(
            "doc_id",
            "source",
            F.expr(f"(_rnk - 1) div {_MIX_SHARD_DOCS}").alias("shard_id"),
        )
        .orderBy("doc_id")
    )
