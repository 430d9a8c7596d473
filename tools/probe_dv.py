"""Deletion-vector probe: point-DELETE cost, DV lane vs rewrite lane,
and the read-side mask overhead (r8).

Structural claims being measured (sinks/txlog.py:delete):
- a point delete (tiny fraction of rows, spread so stats can't prove
  any file all-match) with ``deletion_vectors=True`` writes a sidecar
  of O(deleted rows) bytes and rewrites ZERO data files — flat in
  table size, while the rewrite lane re-copies every touched file
  (O(touched bytes), which for a spread predicate is the whole table);
- the masked read pays one anti-join against the sidecar on top of the
  plain scan — bounded overhead, only on DV-carrying files.

Usage: python tools/probe_dv.py [n_rows] [n_files]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.sinks import txlog


def _build(spark, root: str, n_rows: int, n_files: int) -> None:
    shutil.rmtree(root, ignore_errors=True)
    df = (
        spark.range(0, n_rows)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("bucket"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartitionByRange(n_files, "id")
        .sortWithinPartitions("id")
    )
    txlog.append(spark, df, root)


def _data_bytes(root: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                           recursive=True)
    )


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="probe_dv")
    base = tempfile.mkdtemp(prefix="probe_dv_")

    # predicate: one bucket value (~1% of rows) spread over EVERY file —
    # stats cannot prove any file all-match, so rewrite-mode re-copies
    # the whole table while the DV lane writes a position sidecar. The
    # GDPR point-delete shape, worst case for rewrite, design case for
    # DVs.
    where = [("bucket", "==", 7)]

    results = {}
    for mode, dv in (("rewrite", False), ("dv", True)):
        root = os.path.join(base, mode)
        _build(spark, root, n_rows, n_files)
        bytes_before = _data_bytes(root)
        t0 = time.time()
        rep = txlog.delete(spark, root, where, deletion_vectors=dv)
        dt = time.time() - t0
        bytes_after = _data_bytes(root)
        dv_bytes = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(root, "_dv", "**", "*.parquet"),
                               recursive=True)
        )
        t1 = time.time()
        n_live = txlog.read_table(spark, root).count()
        read_s = time.time() - t1
        results[mode] = {
            "delete_s": round(dt, 2),
            "rows_deleted": rep["rows_deleted"],
            "files_rewritten": rep["files_rewritten"],
            "files_masked": rep.get("files_masked", 0),
            # rewrites ADD files (old ones persist until vacuum), so the
            # delta is exactly the bytes the delete wrote
            "data_bytes_written": bytes_after - bytes_before,
            "dv_sidecar_bytes": dv_bytes,
            "read_after_s": round(read_s, 2),
            "live_rows": n_live,
        }
        print(mode, results[mode], flush=True)

    assert results["dv"]["live_rows"] == results["rewrite"]["live_rows"]
    r, d = results["rewrite"], results["dv"]
    print(
        f"\nPOINT DELETE ({r['rows_deleted']} of {n_rows} rows, "
        f"{n_files} files):"
    )
    print(
        f"  rewrite lane: {r['delete_s']}s, {r['files_rewritten']} files "
        f"rewritten, {r['data_bytes_written']/1e6:.1f} MB data written"
    )
    print(
        f"  dv lane:      {d['delete_s']}s, 0 files rewritten, "
        f"{d['dv_sidecar_bytes']/1e3:.1f} KB sidecar"
    )
    print(
        f"  masked-read overhead: {d['read_after_s']}s vs "
        f"{r['read_after_s']}s plain"
    )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
