"""Text-analysis column expressions for the LLM-data-pipeline surface.

All pure Catalyst expressions (regexp/split/aggregate) so they run
JVM-side at 100 TB; each has an exact SQL mirror for the DuckDB oracle.

Operators: tokenization, token counting (whitespace + BPE-ish regex),
stopword stats, quality scoring (length/punct/stopword ratios),
n-gram-heuristic language ID, document fingerprinting (md5 of the
normalized text — stable across engines, unlike murmur hash()).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual marker sets for the n-gram-heuristic language ID.
# Deliberately small + deterministic so the identical CASE logic can be
# mirrored in the DuckDB oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "los"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# The Gopher rule-set stop list (Rae et al. 2021, §A1.1): a document
# must contain at least two distinct members to pass the stopword rule.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty strings removed."""
    return F.filter(F.split(F.trim(_c(text)), r"\s+"), lambda t: t != "")


def token_count_ws(text: Column | str) -> Column:
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letter runs / digit runs / symbols).
    regexp_extract_all (not lookahead splits) so the identical RE2-safe
    pattern runs in the DuckDB oracle."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(F.lower(_c(text)))
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.size(stop).cast("double") / F.size(toks).cast("double")
    )


def punct_ratio(text: Column | str) -> Column:
    t = _c(text)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^\.\,\;\:\!\?]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length,
    penalizes punctuation soup and stopword-free keyword mash."""
    t = _c(text)
    length_component = F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0))
    stop = stopword_ratio(t)
    stop_component = F.lit(1.0) - F.abs(stop - F.lit(0.4)) / F.lit(0.4)
    punct_component = F.lit(1.0) - F.least(punct_ratio(t) * 5.0, F.lit(1.0))
    return F.round(
        (length_component + F.greatest(stop_component, F.lit(0.0)) + punct_component)
        / F.lit(3.0),
        6,
    )


def marker_hits(text: Column | str, markers: tuple[str, ...]) -> Column:
    toks = tokens(F.lower(_c(text)))
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(text: Column | str) -> Column:
    """N-gram-heuristic language guess: argmax of marker-token hits,
    'und' (undetermined) when no marker fires. Ties break in fixed
    en>de>fr>es order so the SQL oracle can mirror exactly."""
    t = _c(text)
    hits = {lang: marker_hits(t, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def normalize_for_fingerprint(text: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    canonical form used for exact-dup fingerprints."""
    t = F.lower(_c(text))
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint: md5 of the normalized text.
    md5 (not murmur `hash()`) so DuckDB produces identical values."""
    return F.md5(normalize_for_fingerprint(text))


# PII scrub patterns, applied in order (email before phone so the
# digits in a mailbox name can't half-match the phone pattern; IP
# before phone so dotted octets never feed the phone matcher). Kept
# RE2-compatible — no backrefs/lookaround — so the identical pattern
# strings run in Java regex (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def scrub_pii(text: Column | str) -> Column:
    """Redact emails / SSN-shaped ids / IPv4s / phone numbers — the
    standard pre-training privacy pass, as chained JVM regexp_replace
    (one projection, codegen'd; no Python in the hot path)."""
    out = _c(text)
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def gopher_rules(df, text_col: str = "text", id_col: str = "doc_id"):
    """The Gopher quality-filter rule gauntlet (Rae et al. 2021 §A1.1),
    adapted to the synthetic corpus' scale: per-document word count,
    mean word length, alphabetic-word fraction, distinct-stopword
    count and symbol-to-word ratio, plus the conjunctive ``keep`` flag.

    Single codegen'd projection — every metric is an array/regexp HOF
    over the one tokenization, no shuffle, no UDF: the filter runs at
    scan speed regardless of corpus size."""
    t = _c(text_col)
    toks = tokens(t)
    ltoks = tokens(F.lower(t))
    base = df.select(
        F.col(id_col), t.alias("_t"), toks.alias("_toks"), ltoks.alias("_ltoks")
    )
    n = F.size("_toks")
    sum_len = F.aggregate(
        F.transform("_toks", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_wlen = F.when(n == 0, F.lit(0.0)).otherwise(
        sum_len.cast("double") / n.cast("double")
    )
    alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.filter("_toks", lambda x: x.rlike("[a-zA-Z]"))).cast("double")
        / n.cast("double")
    )
    n_stop = F.size(
        F.array_distinct(F.filter("_ltoks", lambda x: x.isin(*GOPHER_STOPS)))
    )
    symbols = (
        F.length("_t")
        - F.length(F.replace(F.col("_t"), F.lit("#")))
        + F.size(F.regexp_extract_all("_t", F.lit(r"\.\.\."), 0))
    )
    symbol_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        symbols.cast("double") / n.cast("double")
    )
    keep = (
        n.between(20, 1000)
        & mean_wlen.between(3.0, 10.0)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
        & (symbol_ratio <= 0.1)
    )
    return base.select(
        id_col,
        n.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stop"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        keep.cast("int").alias("keep"),
    )


def _compression_ratio_one(t: str | None) -> float | None:
    import zlib

    if t is None:
        return None
    b = t.encode("utf-8")
    if not b:
        return 0.0
    return round(len(zlib.compress(b, 6)) / len(b), 6)


def compression_ratio(text: Column | str) -> Column:
    """zlib-compressed-size / raw-size quality signal (the
    Gopher/RefinedWeb "compressibility" heuristic: highly repetitive
    boilerplate compresses far below ~0.4; random noise sits near 1).

    DEFLATE is a byte-level stateful LZ77+Huffman coder — not
    expressible in Catalyst — so this is an Arrow-batched pandas UDF
    (per-row numpy-free byte work, no Python in any shuffle). Values
    are deterministic for a fixed zlib level (6), which the pytest
    oracle pins by recomputing in-process."""

    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        return s.map(_compression_ratio_one)

    return _ratio(_c(text))


def chunk_starts(n_words: Column, stride: int) -> Column:
    """[0, stride, 2*stride, ...) covering n_words words (empty when
    the document has no words)."""
    return F.when(
        n_words > 0,
        F.sequence(F.lit(0), n_words - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))


def chunk_text(df, text_col: str, size: int = 32, stride: int = 16):
    """Fixed-size word-window chunking with overlap (stride < size) —
    the sequence-packing precursor every training pipeline runs.
    One row per (doc, chunk): explode of a per-row start list; all
    array ops, no UDF. Overlapping chunks deliberately duplicate
    words — that is the semantics of striding."""
    words = tokens(text_col)
    with_words = df.withColumn("_words", words).withColumn(
        "_n", F.size("_words")
    )
    exploded = with_words.select(
        "*",
        F.explode(chunk_starts(F.col("_n"), stride)).alias("_start"),
    )
    return (
        exploded.withColumn(
            "chunk_id", (F.col("_start") / stride).cast("long")
        )
        .withColumn(
            "chunk",
            F.array_join(F.slice("_words", F.col("_start") + 1, size), " "),
        )
        .withColumn(
            "chunk_words",
            F.least(F.lit(size), F.col("_n") - F.col("_start")).cast("long"),
        )
        .drop("_words", "_n", "_start")
    )
