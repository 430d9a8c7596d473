"""Multi-dimensional data layout for scan pruning: Z-order (Morton)
clustering.

Not in the reference (its sinks are plain per-batch JSON writes,
``pipeline/sink.py:8-12``); this is the write-side half of the 100 TB
story. Parquet/engine data skipping works off per-file (and per-row-group)
min/max statistics: a table sorted on ONE column prunes scans filtered on
that column but nothing else, while a Z-ORDERED layout interleaves the
bits of several columns into one sort key so every file covers a small
hyper-rectangle of the value space — filters on ANY of the z-columns
prune (the technique behind Delta/Iceberg ``ZORDER BY`` / ``sort_order``
clustering; Morton 1966 interleaving).

All arithmetic is integer-exact (grid scaling by integer multiply +
integer division, bit interleave by shift/or), so the key is reproducible
bit-for-bit by any SQL engine — the operator is oracle-certifiable, not
just a layout heuristic.

Scale shape: one tiny min/max aggregate per z-column (broadcast back),
one pure projection for the key, then ``repartitionByRange`` on the key
(range exchange = sample + shuffle once) and a within-partition sort —
exactly the cost of any global sort-write; no extra passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_grid(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Map an integer column into the ``[0, 2**bits)`` grid:
    ``(col - mn) * (2**bits - 1) DIV max(mx - mn, 1)`` — integer-exact
    (multiply then integer-divide, no floats), monotone, endpoints hit
    0 and ``2**bits - 1``."""
    span = F.greatest(mx - mn, F.lit(1)).cast("bigint")
    num = (col.cast("bigint") - mn.cast("bigint")) * F.lit((1 << bits) - 1)
    # exact integer division (operands are non-negative)
    return ((num - F.pmod(num, span)) / span).cast("bigint")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of pre-gridded integer columns (each already in
    ``[0, 2**bits)``): bit ``b`` of column ``i`` lands at position
    ``b * ncols + i``. Requires ``bits * len(cols) <= 62``. A single
    column is the degenerate interleave — the key IS the gridded value
    (plain range clustering), matching Delta's single-column ZORDER BY."""
    ncols = len(cols)
    if ncols < 1:
        raise ValueError("zorder_key needs at least 1 column")
    if ncols == 1:
        return cols[0].cast("bigint")
    if bits * ncols > 62:
        raise ValueError("bits * ncols must be <= 62 for a BIGINT key")
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return key


def with_zorder_key(
    df: DataFrame,
    columns: list[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append the Z-order key over ``columns`` (integer-typed), gridding
    each by its GLOBAL min/max (one tiny aggregate, broadcast back via a
    1-row cross join — the same pattern as the corpus-stat broadcasts)."""
    aggs = []
    for c in columns:
        aggs += [
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
        ]
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    grids = [
        scale_to_grid(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in columns
    ]
    out = joined.withColumn(key_col, zorder_key(grids, bits))
    return out.drop(*[f"__mn_{c}" for c in columns],
                    *[f"__mx_{c}" for c in columns])


def write_zordered(
    df: DataFrame,
    path: str,
    columns: list[str],
    bits: int = 16,
    num_files: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered by Z-order over ``columns``: compute the
    key, range-partition on it into ``num_files`` buckets, sort within
    partitions, drop the key, write. Each output file then covers a
    compact hyper-rectangle in the ``columns`` space, so min/max file
    stats prune scans filtered on ANY of them (verified against real
    parquet footers in tests/test_layout.py)."""
    keyed = with_zorder_key(df, columns, bits)
    (
        keyed.repartitionByRange(num_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
