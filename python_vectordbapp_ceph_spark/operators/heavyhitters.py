"""EXACT distributed heavy hitters in two passes — the upgrade over
the candidates-only sketches in the family (``freqItems`` /
``q_freq_items`` emit a superset with no counts; CMS answers point
probes with overestimates; this operator returns the exact answer).

Pass 1 (candidate generation): every partition maintains a
Misra-Gries summary with ``k`` counters (Misra & Gries 1982; batched
reduction per Agarwal et al. 2012 "Mergeable Summaries"): merge an
Arrow batch's value_counts into the counter dict, and when the dict
exceeds ``k`` keys subtract the (k+1)-th largest counter value from
every key and drop the non-positive ones. Each partition therefore
emits ≤ k candidate keys. The pigeonhole guarantee that makes the
union sound: if a key's GLOBAL count exceeds N/k then in at least one
partition its local count exceeds N_p/k ≥ N_p/(k+1), so it survives
that partition's summary — no global heavy hitter can be missed.

Pass 2 (exact verification): the candidate union (≤ k × n_partitions
rows — kilobytes) broadcast-semi-joins back onto the data, one hash
aggregate produces exact counts for candidates only, and the final
filter keeps ``cnt · k > N``. The output is EXACTLY the set a full
``GROUP BY … HAVING`` would produce, but the shuffle carries only
candidate keys instead of the whole key domain — at 100 TB the
vocabulary-sized exchange disappears and both passes are scans with
map-side-bounded state.

The partition total N rides along in pass 1 (one NULL-key row per
partition) so the operator is exactly two scans, no extra count job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(
    batches: Iterator[pd.DataFrame], k: int
) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries over Arrow batches: ≤ k candidate
    rows plus one NULL-key row carrying the partition's row count."""
    counters: dict[str, int] = {}
    n_part = 0
    for pdf in batches:
        col = pdf["_hh_key"].dropna()
        n_part += len(col)
        for key, cnt in col.value_counts().items():
            counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > k:
            # batched decrement: subtract the (k+1)-th largest value
            # from everything; ≤ k keys can stay strictly positive
            s = sorted(counters.values(), reverse=True)[k]
            counters = {
                key: c - s for key, c in counters.items() if c - s > 0
            }
    out = pd.DataFrame(
        {
            "_hh_key": list(counters.keys()) + [None],
            "_hh_n": [0] * len(counters) + [n_part],
        }
    )
    yield out


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact keys with count · k > N over ``df[key_col]`` (string),
    two scans, no vocabulary-sized shuffle. Columns: key_col,
    cnt (exact), share_ppm (= cnt·1e6 div N, exact integral floor)."""
    keyed = df.select(F.col(key_col).cast("string").alias("_hh_key"))
    summary = keyed.mapInPandas(
        lambda it: _mg_partition(it, k), schema="_hh_key string, _hh_n long"
    )
    # one job materializes both outputs of pass 1
    summary = summary.localCheckpoint(eager=True)
    total = summary.filter(F.col("_hh_key").isNull()).agg(
        F.sum("_hh_n").alias("n")
    )
    cands = summary.filter(F.col("_hh_key").isNotNull()).select(
        "_hh_key"
    ).distinct()
    exact = (
        keyed.join(F.broadcast(cands), "_hh_key", "left_semi")
        .groupBy("_hh_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(
            F.col("_hh_key").alias(key_col),
            "cnt",
            F.expr("cnt * 1000000 DIV n").alias("share_ppm"),
        )
        .orderBy(F.col("cnt").desc(), key_col)
    )
