"""Relational-side scale probe: TPC-H-shaped queries on a replicated
lineitem/orders graph.

Replicates the two fact tables N times with key-shifted ids (dimension
tables stay fixed — exactly how a bigger scale factor behaves), then
times the heaviest certified join/agg shapes at 1x and Nx. Linear
operators on fixed 32-thread hardware should scale well below Nx wall.

Usage: python tools/probe_relational.py [sf_dir] [mult]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.tables import load_table

PROBED = [
    "pricing_summary",        # full-scan agg
    "region_revenue",         # 5-way broadcast star join
    "shipping_priority",      # Q3 join + top-k
    "order_count_distribution",  # Q13 left join + count-of-counts
    "suppliers_kept_waiting",    # Q21 multi-self-join EXISTS shape
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="probe-relational", shuffle_partitions=32)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    big_dir = f"/tmp/probe_rel_{mult}x"
    if not os.path.exists(big_dir):
        os.makedirs(big_dir)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{big_dir}/{t}.parquet")
        reps = spark.range(mult).withColumnRenamed("id", "rep")
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
        # shift orderkeys per replica; customer/supplier/part keys stay in
        # range so dimension joins keep their original selectivity
        (orders.crossJoin(F.broadcast(reps))
         .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * n_ord)
         .drop("rep")
         .write.mode("overwrite").parquet(f"{big_dir}/orders.parquet"))
        (li.crossJoin(F.broadcast(reps))
         .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * n_ord)
         .drop("rep")
         .write.mode("overwrite").parquet(f"{big_dir}/lineitem.parquet"))

    qs = entrymod.queries()
    for tag, d in (("base", sf_dir), (f"{mult}x", big_dir)):
        n_li = spark.read.parquet(f"{d}/lineitem.parquet").count()
        print(f"[{tag}] lineitem rows = {n_li}")
        for name in PROBED:
            t0 = time.time()
            cnt = qs[name](spark, d).count()
            print(f"  {name}: {cnt} rows in {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
