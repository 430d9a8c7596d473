"""Bucketed-table sink: co-located, shuffle-free joins at scale.

A table written with ``bucketBy(n, keys)`` is hash-partitioned on disk;
a join between two tables bucketed the same way on the join keys needs NO
exchange at read time — at 100 TB that removes the dominant shuffle of
fact-to-fact joins (e.g. orders ⋈ lineitem on orderkey). Spark bucketing
requires a managed table (metastore records the bucket spec), so these
helpers go through ``saveAsTable`` rather than path writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a managed bucketed (optionally sort-bucketed) table. Sorting
    within buckets additionally removes the sort of a sort-merge join."""
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
