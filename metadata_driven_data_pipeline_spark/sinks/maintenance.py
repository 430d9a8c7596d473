"""Table maintenance: small-file compaction.

The operational counterpart of the write path: incremental pipelines
(per-batch sinks, streaming foreachBatch upserts) accrete many small
files, and at 100 TB the file count — not the byte count — becomes the
scan bottleneck (driver listing, per-file open cost, task scheduling,
object-store request rates). Compaction rewrites a table into
``ceil(total_bytes / target_bytes)`` right-sized files.

Uses the Hadoop FileSystem API (via the session's JVM) for sizing, so it
works on any configured scheme (file://, s3a://, ...), and the same
staging-path + atomic-swap discipline as the consolidation writer (never
read-overwrite-in-place — the reference's hazard, SURVEY §2.8).
"""

from __future__ import annotations

import math
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """File count + total bytes under ``path`` (recursive), via the
    Hadoop FileSystem of the path's scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        n += 1
        total += st.getLen()
    return {"files": n, "bytes": total}


def compact_small_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the table at ``path`` into ``ceil(bytes / target_bytes)``
    files (optionally sorted within files to keep min/max stats tight —
    compose with :mod:`.layout` by sorting on a Z-order key column).

    Plan: one read → ``repartition(n)`` (round-robin — even output sizes)
    or ``repartitionByRange(n, sort_by)`` when sorting → staging write →
    atomic swap. Returns before/after file stats.

    Scale shape: exactly one shuffle of the data (any compaction must
    move every byte once); no driver-side row handling. Run it from the
    same scheduler slot as consolidation — it is idempotent and safe to
    re-run (the swap is all-or-nothing).
    """
    before = table_file_stats(spark, path)
    n_files = max(1, math.ceil(before["bytes"] / max(1, target_bytes)))
    df = spark.read.format(fmt).load(path)
    if sort_by:
        out = df.repartitionByRange(
            n_files, *[F.col(c) for c in sort_by]
        ).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    staging = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    out.write.format(fmt).mode("overwrite").save(staging)
    shutil.rmtree(path, ignore_errors=True)
    shutil.move(staging, path)
    after = table_file_stats(spark, path)
    return {"before": before, "after": after, "target_files": n_files}
