"""Hot-partition compaction probe: parallel vs single-task rewrite of a
skewed partitioned layout (r9, VERDICT r8 'what's wrong' #2).

Structural claims being measured (sinks/txlog.py:optimize):
- a partition VALUE whose selected bytes exceed ``target_bytes``
  compacts in its own round-robin job across ceil(bytes/target) tasks
  into N right-sized files — wall-clock bounded by bytes/target tasks
  running in parallel, not by one straggler task serializing the whole
  value into one oversized file;
- small values are untouched by the change: one hash-repartitioned job
  per layout, one output file per value, job count bounded by layout
  count + hot-value count (never partition count).

The single-task baseline is simulated by setting ``target_bytes`` just
above the hot value's size (the pre-r9 behavior for ANY target: one
task, one file). The probe reports wall-clock, output file count, and
max output file size for both shapes on the same skewed table.

Usage: python tools/probe_hot_compact.py [n_hot_rows] [n_small_parts]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.sinks import txlog


def build(spark, root: str, n_hot: int, n_small_parts: int) -> None:
    """Skewed layout: one 'hot' value holding ~n_hot rows of random
    payload, n_small_parts values holding n_hot/50 rows each — appended
    in several commits so the hot value accumulates many small files
    (the streaming-ingest debt shape)."""
    per_commit = 4
    for i in range(per_commit):
        hot = (
            spark.range(n_hot // per_commit)
            .select(
                (F.col("id") + i * (n_hot // per_commit)).alias("k"),
                F.concat(
                    F.lit(uuid.uuid4().hex),
                    F.sha2(F.col("id").cast("string"), 256),
                    F.sha2((F.col("id") + 1).cast("string"), 512),
                ).alias("payload"),
                F.lit("hot").alias("p"),
            )
            .repartition(8)
        )
        txlog.append(spark, hot, root, partition_by=["p"])
    small_rows = max(1, n_hot // 50 // n_small_parts)
    for j in range(n_small_parts):
        sm = spark.range(small_rows).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.lit(f"c{j}").alias("p"),
        ).coalesce(1)
        txlog.append(spark, sm, root, partition_by=["p"])


def hot_stats(root: str) -> tuple[int, int, int]:
    snap = txlog.load_snapshot(root)
    hot = [
        e
        for e in snap.files.values()
        if (e.get("partition") or {}).get("p") == "hot"
    ]
    total = sum(e.get("bytes", 0) for e in hot)
    mx = max((e.get("bytes", 0) for e in hot), default=0)
    return len(hot), total, mx


def run(spark, n_hot: int, n_small: int, target_frac: float) -> dict:
    base = tempfile.mkdtemp(prefix="probe_hotcompact_")
    root = os.path.join(base, "t")
    try:
        build(spark, root, n_hot, n_small)
        n0, hot_bytes, _ = hot_stats(root)
        target = int(hot_bytes * target_frac)
        t0 = time.monotonic()
        txlog.optimize(spark, root, target_bytes=target)
        wall = time.monotonic() - t0
        n1, _, mx1 = hot_stats(root)
        return {
            "target_bytes": target,
            "hot_bytes": hot_bytes,
            "files_before": n0,
            "files_after": n1,
            "max_file_bytes": mx1,
            "wall_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark()
    # single-file shape (the pre-r9 outcome for any target): target just
    # above hot bytes → one task, one output file
    single = run(spark, n_hot, n_small, 1.05)
    # parallel shape: target = hot/8 → ~8 round-robin tasks
    parallel = run(spark, n_hot, n_small, 1.0 / 8)
    print(f"single-task : {single}")
    print(f"parallel    : {parallel}")
    if parallel["wall_s"] > 0:
        print(
            f"speedup     : {single['wall_s'] / parallel['wall_s']:.2f}x "
            f"wall-clock; max output file "
            f"{single['max_file_bytes'] / max(1, parallel['max_file_bytes']):.1f}x "
            "smaller in the parallel shape"
        )


if __name__ == "__main__":
    main()
