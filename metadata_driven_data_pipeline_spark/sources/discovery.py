"""Batch discovery + high-watermark filtering.

Reference semantics (``pipeline/runner.py:42-93``): list the input store
under a ``batch-`` prefix, regex-extract the date segment, validate it
against ``date_format`` (skip non-matching), return the sorted list; then
keep only batches strictly greater than the manifest's
``last_processed_batch`` (at-least-once, ordered, no-reprocessing).

The reference lists MinIO with a client SDK; we list through Hadoop FS via
the active SparkSession so the same code handles ``file://``, ``s3a://``,
``hdfs://`` — no object-store SDK dependency.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import SparkSession


def discover_batches(
    spark: SparkSession,
    input_root: str,
    batch_prefix: str = "batch-",
    date_format: str = "%Y-%m-%d",
) -> list[str]:
    """Return sorted batch dates found as ``<input_root>/<prefix><date>/``."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(input_root)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return []

    pattern = re.compile(rf"^{re.escape(batch_prefix)}(.+)$")
    batch_dates: list[str] = []
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        m = pattern.match(name)
        if not m:
            continue
        date_str = m.group(1)
        try:
            datetime.strptime(date_str, date_format)
        except ValueError:
            continue  # skip folders that don't match the date format
        batch_dates.append(date_str)
    return sorted(batch_dates)


def filter_new_batches(
    all_batches: list[str], last_processed: str | None
) -> tuple[list[str], list[str]]:
    """Strictly-greater-than watermark filter (parity: runner.py:80-93).

    Returns (new, rejected) so the engine can log rejected batches.
    """
    if last_processed is None:
        return list(all_batches), []
    new = [b for b in all_batches if b > last_processed]
    rejected = [b for b in all_batches if b <= last_processed]
    return new, rejected
