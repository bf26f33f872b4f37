"""Z-order (Morton) clustering — multi-dimensional data layout.

Why: parquet pruning is driven by per-file min/max statistics. Sorting
by one column gives perfect pruning on that column and none on any
other; interleaving the bits of several columns (Morton order) gives
each file a tight hyper-rectangle in ALL of them, so range predicates
on any clustered dimension skip most files. This is the OPTIMIZE
ZORDER BY layout strategy of lakehouse table formats, expressed as
plain DataFrame ops: at 100 TB the rewrite is one range shuffle, and
every later scan with a selective 2-D predicate reads a small file
subset instead of the whole table.

Everything is JVM-side Catalyst expressions (shift/mask/or folds) —
no UDF in either the scaling or the interleave.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Linear map [cmin, cmax] → [0, 2^bits - 1] integer grid cell."""
    top = (1 << bits) - 1
    if cmax <= cmin:  # degenerate: constant column
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(cmin))) / F.lit(
        float(cmax - cmin)
    ) * F.lit(float(top))
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(top)
    )


def zorder_key(cells: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each pre-scaled cell column into one
    Morton key: output bit (i*n + j) = bit i of cells[j]. A fold of
    shift/mask/or terms — whole-stage-codegen'd, no Python per row."""
    n = len(cells)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cells):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 12,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` clustered by the Morton order of ``cols``.

    One driver-side min/max aggregate sizes the grid (single cheap
    pass — row-group stats only for parquet sources), then a range
    repartition on the z-key + in-partition sort puts neighboring
    cells in the same files. The z-key is dropped before writing; the
    layout, not an extra column, carries the benefit.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    cells = [
        _scale_to_bits(
            F.col(c), float(bounds[f"_min_{c}"]), float(bounds[f"_max_{c}"]), bits
        )
        for c in cols
    ]
    (
        df.withColumn("_z", zorder_key(cells, bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_pruning(path: str, predicates: dict[str, tuple]) -> tuple[int, int]:
    """(files_total, files_matching) from parquet FOOTER min/max stats
    alone — the same decision a scan's stats-based file pruning makes.
    ``predicates`` maps column → (lo, hi) inclusive range."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    matching = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        overlap = True
        for col, (lo, hi) in predicates.items():
            cmin = cmax = None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    c = row_group.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        cmin = s.min if cmin is None else min(cmin, s.min)
                        cmax = s.max if cmax is None else max(cmax, s.max)
            if cmin is not None and (cmax < lo or cmin > hi):
                overlap = False
                break
        if overlap:
            matching += 1
    return len(files), matching
