"""Sequence packing: group documents into fixed token-budget packs —
the step between dedup/filtering and tokenization in a training-data
pipeline (maximizes tokens per training sequence, minimizes padding).

Greedy sequential packing is inherently stateful (pack membership
depends on every previous row), so it cannot be a window expression;
it runs as applyInPandas over deterministic hash buckets:

  - docs are assigned to ``n_buckets`` buckets by the stable Knuth
    hash (operators/split.py) — buckets are the parallelism unit and
    each holds a bounded slice of the corpus;
  - within a bucket, docs are packed in id order (deterministic);
  - pack ids are globally unique: (bucket << 32) | local_pack.

An oversized doc (> budget) gets a pack of its own — truncation is the
tokenizer's decision, not the packer's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .split import split_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Returns (id, n_tokens, pack_id): every doc in exactly one pack,
    packs filled greedily in id order within a bucket, no pack over
    ``budget`` unless a single doc alone exceeds it."""
    import pandas as pd

    bucketed = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias(token_col)
    ).withColumn("_bkt", split_bucket(id_col, n_buckets))

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        if pdf["_bkt"].isna().any():
            raise ValueError(
                f"pack_sequences: null/non-integer {id_col} — every row "
                "needs a valid integer id for stable bucketing"
            )
        bucket = int(pdf["_bkt"].iloc[0])
        pack_local, used = 0, 0
        packs = []
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                pack_local += 1
                used = 0
            used += t
            packs.append((bucket << 32) | pack_local)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                token_col: pdf[token_col],
                "pack_id": packs,
            }
        )

    return bucketed.groupBy("_bkt").applyInPandas(
        pack, schema=f"{id_col} long, {token_col} long, pack_id long"
    )


def pack_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-pack fill statistics — the padding-efficiency feedback."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 4).alias("fill_ratio"),
    )
