"""The row-canonicalization contract used to compare a Spark result
with its DuckDB oracle — one implementation, imported by both the
local gate (tools/check_oracles.py) and the pytest parity suite, so
the two gates can never drift apart.

Mirrors the driver: columns sorted by name, rows order-insensitive,
exact value equality (only -0.0 and NaN representation normalized).
"""

from __future__ import annotations


def norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return v + 0.0  # -0.0 → 0.0
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def canon(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """(columns sorted by name, rows sorted with a type-aware key)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )
    return [cols[i] for i in order], out
