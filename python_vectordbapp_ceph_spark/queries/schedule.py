"""Training-run scheduling tier (round 8): the operators that turn a
packed corpus into the SCHEDULE a training run executes — per-epoch
deterministic reshuffles, curriculum ordering, epoch-annealed mixture
weights — plus the per-(source, lang) tokenizer-fertility and
label-balance reports that decide those schedules.

Same determinism discipline as every tier (queries/__init__.py):
integer/decimal arithmetic for unbounded reductions, integer ppm for
ratios, total-order tiebreaks, no logarithms, no floats on any
ordering key (band/epoch keys are exact integers, so boundaries can't
flip between engines on a ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS
from . import register
from ._common import T
from .textops import _STOPLIST, _TOKS_LOWER

_N_EPOCHS = 3       # q_epoch_shuffle epochs
_CURR_BANDS = 4     # curriculum quality bands
_STOP_ARRAY = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


# --- per-epoch deterministic reshuffle ---------------------------------------

@register(
    "q_epoch_shuffle",
    oracle="""
    WITH e AS (SELECT unnest([0, 1, 2]) AS epoch),
    x AS (SELECT e.epoch, d.doc_id,
                 md5(d.doc_id || ':' || e.epoch) AS k
          FROM documents d CROSS JOIN e),
    r AS (SELECT epoch, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY epoch
                                    ORDER BY k, doc_id) AS pos
          FROM x)
    SELECT epoch, doc_id, pos FROM r ORDER BY epoch, pos
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-epoch loader order: every epoch re-shuffles the
    corpus with a DIFFERENT deterministic salt (md5(id:epoch)), so
    epochs are decorrelated but each is reproducible from (corpus,
    epoch) alone — resume mid-epoch-2 without replaying epochs 0-1.

    Scale shape: ONE two-phase global rank over the total order
    (epoch, key, doc_id) serves all epochs — because epochs are
    equal-size blocks of that order, the per-epoch position is just
    global_rank − epoch·N (N broadcast as a 1-row scalar). No
    per-epoch unpartitioned window, no E separate sorts."""
    from ..operators.twophase import global_cumsum

    d = T(spark, sf_dir, "documents").select("doc_id")
    x = d.withColumn(
        "epoch", F.explode(F.array(*[F.lit(e) for e in range(_N_EPOCHS)]))
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.col("epoch").cast("string"))
        ).alias("_k"),
    )
    r = global_cumsum(x, ["epoch", "_k", "doc_id"], F.lit(1), cum_col="_r")
    n = d.agg(F.count(F.lit(1)).alias("_n"))
    return (
        r.crossJoin(F.broadcast(n))
        .select(
            "epoch",
            "doc_id",
            (F.col("_r") - F.col("epoch") * F.col("_n")).alias("pos"),
        )
        .orderBy("epoch", "pos")
    )


# --- curriculum ordering -----------------------------------------------------

@register(
    "q_curriculum_order",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      CASE WHEN len({_TOKS_LOWER}) = 0 THEN 0
                           ELSE (len(list_filter({_TOKS_LOWER},
                                     x -> list_contains({_STOPLIST}, x)))
                                 * 1000000) // len({_TOKS_LOWER})
                      END AS stop_ppm
               FROM documents),
    q AS (SELECT doc_id, abs(stop_ppm - 400000) AS qdist FROM t),
    b AS (SELECT doc_id, qdist,
                 ntile({_CURR_BANDS}) OVER (ORDER BY qdist, doc_id) AS band
          FROM q),
    r AS (SELECT doc_id, band,
                 ROW_NUMBER() OVER (ORDER BY band, md5(doc_id || ':c'),
                                    doc_id) AS pos
          FROM b)
    SELECT doc_id, band, pos FROM r ORDER BY doc_id
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: documents banded into quality quartiles
    (integer stopword-ratio distance from the 40% sweet spot — the
    q_quality_score signal, integerized so band boundaries are exact
    in both engines), best band first, deterministic shuffle WITHIN
    each band (md5(id:c)). The loader then streams positions in
    order: highest-quality quartile up front, no quality cliff inside
    a band.

    Scale shape: the quartile cut is the two-phase exact ntile
    (operators/twophase.global_ntile — same primitive as
    q_rfm_segments) and the final position is one two-phase global
    rank over (band, key, doc_id); the stop-ratio metric is a
    codegen'd per-row projection. Nothing data-sized runs on one
    task."""
    from ..operators.twophase import global_cumsum, global_ntile

    d = T(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    t = d.select(
        "doc_id",
        toks.alias("_tk"),
    ).select(
        "doc_id",
        F.when(F.size("_tk") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                f"(size(filter(_tk, x -> array_contains({_STOP_ARRAY}, x)))"
                f" * CAST(1000000 AS BIGINT)) div size(_tk)"
            )
        )
        .alias("stop_ppm"),
    )
    q = t.select("doc_id", F.abs(F.col("stop_ppm") - 400000).alias("qdist"))
    b = global_ntile(q, ["qdist", "doc_id"], _CURR_BANDS, "band")
    b = b.select(
        "doc_id",
        F.col("band").cast("long").alias("band"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":c"))
        ).alias("_k"),
    )
    r = global_cumsum(b, ["band", "_k", "doc_id"], F.lit(1), cum_col="pos")
    return r.select("doc_id", "band", "pos").orderBy("doc_id")


# --- epoch-annealed mixture weights ------------------------------------------

@register(
    "q_mixture_schedule",
    oracle="""
    WITH sz AS (SELECT source, COUNT(*) AS n_s FROM documents
                GROUP BY source),
    tot AS (SELECT SUM(n_s) AS n, COUNT(*) AS s FROM sz),
    e AS (SELECT unnest([0, 1, 2, 3]) AS epoch)
    SELECT e.epoch, sz.source,
           ((3 - e.epoch) * ((sz.n_s * 1000000) // tot.n)
            + e.epoch * (1000000 // tot.s)) // 3 AS share_ppm
    FROM sz CROSS JOIN tot CROSS JOIN e
    ORDER BY epoch, source
    """,
)
def q_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-annealed mixture weights — the schedule DoReMi-style
    reweighting executes: epoch 0 samples sources at their natural
    corpus share, the final epoch uniformly, intermediate epochs
    linearly interpolated, all in integer ppm so every engine and
    every rerun emits the identical schedule. Feed each epoch's row
    set to q_mixture_shards' rate input to materialize that epoch.

    Plan: one per-source count (tiny), one 1-row total, a 4-row epoch
    literal — two broadcast cross joins, per-row integer arithmetic.
    Scale-free."""
    d = T(spark, sf_dir, "documents")
    sz = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = sz.agg(
        F.sum("n_s").alias("n"), F.count(F.lit(1)).alias("s")
    )
    e = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in range(4)])).alias("epoch")
    )
    return (
        sz.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(e))
        .select(
            "epoch",
            "source",
            F.expr(
                "((3 - epoch) * ((n_s * 1000000) div n)"
                " + epoch * (1000000 div s)) div 3"
            ).alias("share_ppm"),
        )
        .orderBy("epoch", "source")
    )


# --- tokenizer fertility report ----------------------------------------------

@register(
    "q_tokenizer_fertility",
    oracle=f"""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           SUM(len({_TOKS_LOWER})) AS n_tokens,
           SUM(n_chars) AS sum_chars,
           CASE WHEN SUM(len({_TOKS_LOWER})) = 0 THEN 0
                ELSE (SUM(n_chars) * 1000000) // SUM(len({_TOKS_LOWER}))
           END AS chars_per_token_ppm,
           (SUM(len({_TOKS_LOWER})) * 1000000) // COUNT(*)
               AS tokens_per_doc_ppm
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per (source, lang): chars-per-token and
    tokens-per-doc in exact integer ppm — the numbers that convert a
    byte budget into a token budget per slice, and the first drift
    check when a new tokenizer or a new crawl slice lands (fertility
    jumps ⇒ the slice is code/markup/another script). Whitespace
    tokens here; swap the tokenizer UDF and the report is the
    before/after comparison.

    Plan: one scan, one map-side-combinable hash aggregate on
    (source, lang) — cardinality is slices, not docs. Sums promote to
    decimal(38,0) BEFORE the ·10⁶ products (the q_dataset_card
    overflow lesson: int64 wraps past ~9.2e12 total chars)."""
    d = T(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    g = d.select("source", "lang", F.size(toks).alias("_nt"), "n_chars").groupBy(
        "source", "lang"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return (
        g.select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            "sum_chars",
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(CAST(sum_chars AS DECIMAL(38,0)) * 1000000)"
                    " div n_tokens"
                )
            )
            .alias("chars_per_token_ppm"),
            F.expr(
                "(CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div n_docs"
            ).alias("tokens_per_doc_ppm"),
        )
        .orderBy("source", "lang")
    )


# --- label balance report ----------------------------------------------------

@register(
    "q_class_balance",
    oracle="""
    WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_labels FROM c)
    SELECT c.label, c.n,
           (c.n * 1000000) // tot.total AS share_ppm,
           abs((c.n * 1000000) // tot.total
               - 1000000 // tot.n_labels) AS dev_uniform_ppm
    FROM c CROSS JOIN tot
    ORDER BY label
    """,
)
def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance report over the embedding set: per-class counts,
    corpus share, and deviation from the uniform share, all integer
    ppm — the diagnostic read BEFORE q_balanced_sample decides how
    much to subsample the head classes (its target = the max n with
    every dev within tolerance). One hash aggregate on label + a
    broadcast 1-row total; scale-free."""
    d = T(spark, sf_dir, "embeddings")
    c = d.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_labels")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            F.expr("(n * 1000000) div total").alias("share_ppm"),
            F.abs(
                F.expr("(n * 1000000) div total")
                - F.expr("1000000 div n_labels")
            ).alias("dev_uniform_ppm"),
        )
        .orderBy("label")
    )


# --- leakage-safe grouped k-fold assignment ---------------------------------

_KFOLD = 5


@register(
    "q_group_kfold",
    oracle=f"""
    WITH f AS (SELECT event_id, user_id,
                      ((((user_id % 2147483648) + 2147483648) % 2147483648)
                       * 2654435761) % 4294967296 % {_KFOLD} AS fold
               FROM events),
    per AS (SELECT fold, COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users
            FROM f GROUP BY fold),
    tot AS (SELECT SUM(n_events) AS total FROM per)
    SELECT fold, n_events, n_users,
           (n_events * 1000000) // (SELECT total FROM tot) AS event_share_ppm
    FROM per ORDER BY fold
    """,
)
def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe grouped k-fold assignment: every event falls in
    the fold its USER hashes to (operators/split.py Knuth bucket), so
    no user's activity ever straddles a train/eval boundary — the
    grouped-CV discipline that keeps per-user correlation from
    inflating eval scores (and randomSplit cannot provide: its
    membership changes with partitioning and ignores the group key).
    Output is the fold-balance report a scheduler checks before
    accepting the split: events, distinct groups and event share per
    fold. Membership is a pure row function evaluated scan-side —
    zero shuffle to assign at any scale; the report itself is one
    hash aggregate bounded by k rows (the COUNT DISTINCT shuffles
    (fold, user) pairs, bounded by the user domain)."""
    from ..operators.split import split_bucket

    e = T(spark, sf_dir, "events")
    f = e.select(
        "event_id", "user_id", split_bucket("user_id", _KFOLD).alias("fold")
    )
    per = f.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tot = per.agg(F.sum("n_events").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_events",
            "n_users",
            F.expr("(n_events * 1000000) div total").alias("event_share_ppm"),
        )
        .orderBy("fold")
    )
