"""Transaction-log table probe: (A) stats-pruned scan vs full-scan
filter as the table grows, (B) file-pruned MERGE vs whole-table
overwrite at two table sizes.

The structural claims being measured (sinks/txlog.py):
- a point-range read on a key-clustered txlog table opens only the
  files whose footer [min,max] can match — cost follows the FILES THE
  PREDICATE TOUCHES, not the table size;
- a MERGE whose batch touches a narrow key band rewrites only the
  overlapping files — flat in table size, while the overwrite lane
  pays O(table) per batch;
- a DELETE of a clustered key range drops stats-proven all-match files
  by pure metadata and rewrites only the two boundary files — near-zero
  data I/O regardless of how many rows the range holds, while the
  rewrite lane (filter + overwrite) pays O(table).

Usage: python tools/probe_txlog.py [n_rows] [n_chunks] [batch_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.sinks import txlog


def _build(spark, root: str, n_rows: int, n_chunks: int) -> None:
    shutil.rmtree(root, ignore_errors=True)
    chunk = n_rows // n_chunks
    for c in range(n_chunks):
        df = (
            spark.range(c * chunk, (c + 1) * chunk)
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("bucket"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
            .coalesce(4)  # 4 tight-range files per commit
        )
        txlog.append(spark, df, root)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    root = "/tmp/probe_txlog_table"
    t0 = time.time()
    _build(spark, root, n_rows, n_chunks)
    print(f"build: {n_rows} rows in {n_chunks} commits "
          f"({time.time() - t0:.1f}s)")

    # -------- A: stats-pruned scan vs full filter ----------------------
    lo, hi = n_rows // 2, n_rows // 2 + n_rows // 200  # 0.5% band
    for _ in range(2):  # rep 1 warms, rep 2 measures
        t0 = time.time()
        df, rep = txlog.scan(
            spark, root, where=[("id", ">=", lo), ("id", "<", hi)]
        )
        pruned_rows = df.agg(F.count(F.lit(1))).collect()[0][0]
        t_pruned = time.time() - t0

        snap = txlog.load_snapshot(root)
        t0 = time.time()
        full = (
            spark.read.schema(snap.schema)
            .parquet(*snap.file_paths())
            .filter((F.col("id") >= lo) & (F.col("id") < hi))
        )
        full_rows = full.agg(F.count(F.lit(1))).collect()[0][0]
        t_full = time.time() - t0
    assert pruned_rows == full_rows, (pruned_rows, full_rows)
    print(
        f"scan[{n_rows}]: pruned {t_pruned:.2f}s "
        f"({rep['files_scanned']}/{rep['files_total']} files, "
        f"{rep['rows_skipped']} rows skipped) vs full filter "
        f"{t_full:.2f}s -> {t_full / max(t_pruned, 1e-9):.2f}x"
    )

    # -------- B: file-pruned MERGE vs whole-table overwrite ------------
    updates = spark.range(lo, lo + batch_rows).select(
        F.col("id"),
        (F.col("id") % 97).alias("bucket"),
        F.lit("updated").alias("payload"),
    )
    t0 = time.time()
    res = txlog.merge(spark, updates, root, ["id"], "bucket")
    t_merge = time.time() - t0

    t0 = time.time()
    over_root = "/tmp/probe_txlog_overwrite"
    shutil.rmtree(over_root, ignore_errors=True)
    cur = txlog.read_table(spark, root)
    txlog.append(spark, cur, over_root)  # seed the overwrite lane
    t_seed = time.time() - t0
    t0 = time.time()
    merged_full = (
        txlog.read_table(spark, over_root)
        .join(updates.select("id"), "id", "left_anti")
        .unionByName(updates)
    )
    txlog.overwrite(spark, merged_full, over_root)
    t_overwrite = time.time() - t0
    print(
        f"merge[{n_rows}]: file-pruned {t_merge:.2f}s "
        f"({res['files_rewritten']}/{n_chunks * 4} files rewritten) vs "
        f"whole-table overwrite {t_overwrite:.2f}s "
        f"-> {t_overwrite / max(t_merge, 1e-9):.2f}x  "
        f"(seed {t_seed:.1f}s)"
    )

    # -------- C: metadata DELETE vs filter-and-rewrite ------------------
    # delete a 25% clustered range: interior files drop by metadata,
    # only the two boundary files rewrite
    dlo, dhi = n_rows // 4, n_rows // 2
    t0 = time.time()
    drep = txlog.delete(
        spark, root, [("id", ">=", dlo), ("id", "<", dhi)]
    )
    t_delete = time.time() - t0

    t0 = time.time()
    cur = txlog.read_table(spark, over_root)
    kept = cur.filter(~((F.col("id") >= dlo) & (F.col("id") < dhi)))
    txlog.overwrite(spark, kept, over_root)
    t_rewrite = time.time() - t0
    n_after = txlog.read_table(spark, root).count()
    n_after_rw = txlog.read_table(spark, over_root).count()
    assert n_after == n_after_rw, (n_after, n_after_rw)
    print(
        f"delete[{n_rows}]: metadata-drop {t_delete:.2f}s "
        f"({drep['files_dropped']} files dropped, "
        f"{drep['files_rewritten']} rewritten, "
        f"{drep['rows_deleted']} rows) vs filter+overwrite "
        f"{t_rewrite:.2f}s -> {t_rewrite / max(t_delete, 1e-9):.2f}x"
    )

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(over_root, ignore_errors=True)


if __name__ == "__main__":
    main()
