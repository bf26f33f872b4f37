"""Skew-handling join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; explicit salting is the tool for the pathological case AQE
can't fix — a single hot key whose hash partition exceeds executor
memory no matter how it's split against a NON-broadcastable build side.

Mechanics: the probe side gets a deterministic salt in [0, n) derived
from hashing its whole row (xxhash64 — no rand(), so retries/stage
replays see the same salt and exactly-once sinks stay correct); the
build side is replicated n× with every salt value. The join key
becomes (key, salt): the hot key's rows spread over n partitions.
Result is row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join on ``on`` with the left (large/skewed) side salted and
    the right side replicated ``salt``×. Same rows as left.join(right,
    on, how); supports inner and left joins.

    The salt derives from ``salt_cols`` (default: every hashable left
    column — xxhash64 rejects MapType, so map columns are skipped).
    The salt must vary WITHIN a hot key: if the key is the only
    hashable column, pass explicit discriminator columns."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    if salt_cols is None:
        salt_cols = [c for c, t in left.dtypes if not t.startswith("map<")]
    if not salt_cols or salt_cols == [on]:
        raise ValueError(
            "no salt discriminator: every non-map left column equals the "
            "join key — pass salt_cols with columns that vary within a key"
        )
    lsalt = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt))
    )
    rsalt = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("long").alias("_salt"))
        )
    )
    out = lsalt.join(rsalt, [on, "_salt"], how)
    return out.drop("_salt")
