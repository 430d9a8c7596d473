"""Upsert probe: partition-pruned MERGE (merge_upsert, dynamic partition
overwrite) vs the whole-table rewrite (the run_upsert_consolidated /
reference-consolidation cost model) as the table grows.

Table: n_rows across n_days date partitions on disk; each upsert batch
touches `touched` partitions. The whole-table rewrite pays
O(table) per batch regardless; the pruned merge pays O(touched
partitions). Outputs wall times + the rewritten-file check.

Usage: python tools/probe_upsert.py [n_rows] [n_days] [touched]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.operators.consolidate import (
    dedup_keep_latest,
)
from metadata_driven_data_pipeline_spark.sinks.maintenance import merge_upsert


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    touched = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        spark.range(n_rows)
        .select(
            F.col("id"),
            F.concat(F.lit("day-"), (F.col("id") % n_days)).alias("day"),
            F.lit(1).alias("version"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )
    for path in ("/tmp/probe_upsert_a", "/tmp/probe_upsert_b"):
        shutil.rmtree(path, ignore_errors=True)
        base.write.partitionBy("day").parquet(path)

    updates = (
        spark.range(5_000)
        .select(
            (F.col("id") * 7919 % n_rows).alias("id"),
            F.concat(F.lit("day-"), (F.col("id") * 7919 % n_rows) % n_days)
            .alias("day"),
            F.lit(2).alias("version"),
            F.lit("updated").alias("payload"),
        )
        .filter(F.col("day").isin([f"day-{d}" for d in range(touched)]))
    )
    updates.persist()
    n_upd = updates.count()

    t0 = time.time()
    info = merge_upsert(
        spark, "/tmp/probe_upsert_a", updates, ["id"], "version", "day"
    )
    t_pruned = time.time() - t0

    # whole-table rewrite (staging + swap, as run_upsert_consolidated)
    t0 = time.time()
    existing = spark.read.parquet("/tmp/probe_upsert_b")
    merged = dedup_keep_latest(
        existing.unionByName(updates), ["id", "day"], "version"
    )
    merged.write.mode("overwrite").parquet("/tmp/probe_upsert_b__st")
    shutil.rmtree("/tmp/probe_upsert_b")
    shutil.move("/tmp/probe_upsert_b__st", "/tmp/probe_upsert_b")
    t_full = time.time() - t0

    a = spark.read.parquet("/tmp/probe_upsert_a")
    n_new_a = a.filter("payload = 'updated'").count()
    print(
        f"rows={n_rows} days={n_days} touched={touched} updates={n_upd}"
    )
    print(
        f"pruned_merge={t_pruned:.2f}s (partitions rewritten="
        f"{len(info['partitions_rewritten'])})  "
        f"full_rewrite={t_full:.2f}s  speedup={t_full / t_pruned:.1f}x  "
        f"updated_rows_visible={n_new_a == n_upd}"
    )
    for path in ("/tmp/probe_upsert_a", "/tmp/probe_upsert_b"):
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
