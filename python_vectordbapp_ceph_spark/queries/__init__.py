"""Query registry — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
ANSI-SQL oracle string DuckDB runs on the same parquet tables. The
driver's correctness gate compares row count + schema + an
order-insensitive value hash, with columns sorted by name — so every
computed column is aliased identically in both forms.

Determinism rules used throughout (the reason the hashes match):
  - money-like doubles (all test-table doubles are exact 2-decimal
    values) aggregate through ``CAST(x AS DECIMAL(18,2))`` → exact,
    order-insensitive arithmetic; final outputs cast back to double.
  - per-row double math (distances, ratios) does the identical
    left-to-right IEEE operations in both engines and rounds to 6.
  - timestamps: the events table is parquet TIMESTAMP(NANOS); Spark
    reads nanos-as-long and rebuilds micros (io.py), DuckDB's reader
    truncates to micros — identical values. Timestamp OUTPUT columns
    are formatted to strings so engine repr differences can't bite.
  - every window/top-k has a total-order tiebreak on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its DuckDB oracle, if hash-checkable)
    to the driver-facing registry. ``oracle=None`` → rows-only check
    (approximate / non-SQL-expressible operators)."""

    def deco(fn):
        if name in QUERIES:
            # a silent overwrite would make one query's oracle grade
            # another's plan — fail loudly at import time instead
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.query_name = name
        return fn

    return deco


# Populate the registry. Import order is alphabetical-ish but
# irrelevant; each module only appends.
from . import relational  # noqa: E402,F401
from . import vector  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import mining  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import evaluation  # noqa: E402,F401
from . import assembly  # noqa: E402,F401
from . import schedule  # noqa: E402,F401
from . import governance  # noqa: E402,F401
