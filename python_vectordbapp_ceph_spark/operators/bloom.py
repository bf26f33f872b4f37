"""Bloom filter over a key column — the membership sketch (fourth of
the family: HLL distincts, freqItems heavy hitters, CMS frequencies,
Bloom membership). The classic scale tool for decontamination-style
"is this key in the reference set" checks when the reference set is
too large to broadcast exactly but its BIT SET is not.

Pure DataFrame ops, same skeleton as operators/cms.py: k xxhash64
functions over (key, i) map each key to k bit positions in [0, m);
the filter is the DISTINCT set of set positions (≤ m rows, usually
far fewer — kilobytes against a billion-key set with the right m).
Membership: a probe key is (possibly) present iff ALL k of its
positions are set — an inner join + count == k. Two filters with the
same (k, m) union by a distinct over their position sets.

Guarantees (Bloom 1970): NO false negatives, ever; false-positive
rate ≈ (1 − e^{−kn/m})^k — both pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(df: DataFrame, key_col: str, k: int, m: int) -> DataFrame:
    out = df.select(
        key_col,
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
    )
    return out.withColumn(
        "pos", F.pmod(F.xxhash64(F.col(key_col), F.col("i").cast("int")), F.lit(m))
    )


def bloom_build(df: DataFrame, key_col: str, k: int = 5, m: int = 4096) -> DataFrame:
    """The set-bit table: distinct positions — one shuffle, bounded
    by m rows regardless of input size."""
    return _positions(df, key_col, k, m).select("pos").distinct()


def _pack_positions(pos: DataFrame) -> DataFrame:
    """(pos) rows → (word, bits): 64 bit positions per row. The
    BITSET form of the filter — 64× fewer rows than the position set,
    which is what keeps a filter over millions of keys metadata-sized
    (the position-set form stops being 'kilobytes' right around the
    corpus sizes where the filter matters most)."""
    return (
        pos.select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) AS int))").alias("_b"),
        )
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_build_packed(
    df: DataFrame, key_col: str, k: int = 5, m: int = 4096
) -> DataFrame:
    """Bitset-form build: (word, bits) rows, ≤ m/64 of them. Same
    no-false-negative contract as bloom_build; consumed by
    bloom_contains_many (which accepts either form)."""
    return _pack_positions(_positions(df, key_col, k, m).select("pos").distinct())


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two same-geometry filters, form-aware. Position-set form
    unions by distinct; BITSET form must OR the per-word bitsets — a
    bare distinct leaves two rows per colliding word, and a probe
    position matching both then counts twice toward ``_n_hits``, which
    overshoots the ``== k`` membership test and produces a FALSE
    NEGATIVE for a genuinely inserted key. Mixed forms are a caller
    bug (pack the set form first)."""
    a_packed, b_packed = "bits" in a.columns, "bits" in b.columns
    if a_packed != b_packed:
        raise ValueError(
            "bloom_union: mixed filter forms (one packed word/bits, one "
            "position-set) — pack both via bloom_build_packed first"
        )
    u = a.unionByName(b)
    if a_packed:
        return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    return u.distinct()


def bloom_contains_many(
    blooms: list[tuple[object, DataFrame, int]],
    probes: DataFrame,
    key_col: str,
    k: int = 5,
) -> DataFrame:
    """Probe MANY filters in one plan: ``blooms`` is [(tag, filter
    frame, m)] — each filter keeps its own m (positions are only
    comparable within one m) and may be in EITHER form: bitset
    (word, bits — bloom_build_packed, the scale form) or legacy
    position-set (pos — bloom_build); set-form filters are packed on
    the fly (metadata-sized). Returns (key, _tag) rows for every
    (probe key, filter) pair the filter cannot rule out.

    One tagged union on each side and ONE broadcast hash join replace
    N separate bloom_contains calls — N broadcasts' fixed overhead was
    the measured cost driver when a streaming dedup gate probed every
    live container per micro-batch."""
    if not blooms:
        # fail loudly: bloom_parts[0] below would raise an opaque
        # IndexError; an empty filter list is a caller bug (nothing
        # to probe against), not "no hits"
        raise ValueError("bloom_contains_many: no filters given")
    probe_keys = probes.select(key_col).distinct()
    bloom_parts = []
    pos_parts = []
    for tag, bloom, m in blooms:
        packed = (
            bloom.select("word", "bits")
            if "bits" in bloom.columns
            else _pack_positions(bloom.select("pos").distinct())
        )
        bloom_parts.append(packed.select(F.lit(tag).alias("_tag"), "word", "bits"))
        pos_parts.append(
            _positions(probe_keys, key_col, k, int(m)).select(
                key_col,
                F.lit(tag).alias("_tag"),
                F.expr("pos div 64").alias("word"),
                F.expr("shiftleft(1L, cast(pmod(pos, 64) AS int))").alias("_pb"),
            )
        )
    bloom_all = bloom_parts[0]
    for p in bloom_parts[1:]:
        bloom_all = bloom_all.unionByName(p)
    pos_all = pos_parts[0]
    for p in pos_parts[1:]:
        pos_all = pos_all.unionByName(p)
    return (
        pos_all.join(F.broadcast(bloom_all), ["_tag", "word"])
        .filter(F.expr("(bits & _pb) != 0"))
        .groupBy(key_col, "_tag")
        .agg(F.count(F.lit(1)).alias("_n_hits"))
        .filter(F.col("_n_hits") == k)
        .select(key_col, "_tag")
    )


def bloom_contains(
    bloom: DataFrame, probes: DataFrame, key_col: str, k: int = 5, m: int = 4096
) -> DataFrame:
    """(key, maybe_present): present iff all k positions are set.
    The bit table broadcasts; the probe side is never shuffled.

    Probes are DEDUPED first: a key appearing twice in ``probes``
    would emit 2k position rows and count 2k hits — failing the
    ``== k`` test and reporting a genuinely present key absent, a
    false negative in exactly the decontamination direction the
    module guarantees impossible (bloom_contains_many already dedupes
    for the same reason)."""
    pos = _positions(probes.select(key_col).distinct(), key_col, k, m)
    hits = (
        pos.join(F.broadcast(bloom), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        probes.select(key_col)
        .distinct()
        .join(hits, key_col, "left")
        .select(
            key_col,
            (F.coalesce("n_hits", F.lit(0)) == k).alias("maybe_present"),
        )
    )
