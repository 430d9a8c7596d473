"""Skew probe (r3 verdict item 7): the salted paths are oracle-certified
EQUAL to unsalted plans; this probe shows them (and AQE's skew-join
splitting) actually WINNING on a genuinely skewed key distribution.

Builds a Zipf-shaped lineitem: the bulk of the table is the sf corpus
replicated evenly, plus ONE hot orderkey holding `hot_share` of all rows
(the classic "null-key/default-value" production skew). Then measures:

1. keyed reduction: `dedup_keep_latest` (single window partition — the
   hot group sorts in ONE task) vs `two_phase_dedup_keep_latest`
   (within-(key,salt) then across-salt).
2. broadcast-ineligible equi-join of the skewed fact against orders
   (autoBroadcast disabled to model a big dim):
   plain join with AQE skewJoin OFF vs ON vs `salted_join`.

Every variant's row count is asserted identical before timing is
reported. Usage: python tools/probe_skew.py [sf_dir] [bulk_mult] [hot_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.operators import skew as sk
from metadata_driven_data_pipeline_spark.operators.consolidate import (
    dedup_keep_latest,
)


def build_skewed(spark, sf_dir: str, bulk_mult: int, hot_rows: int):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate",
    )
    reps = spark.range(bulk_mult).withColumnRenamed("id", "rep")
    bulk = (
        li.crossJoin(F.broadcast(reps))
        # distinct line numbers per replica keep the dedup non-trivial
        .withColumn(
            "l_linenumber",
            F.col("l_linenumber") + F.col("rep") * 10,
        )
        .drop("rep")
    )
    # ONE hot key: replicate a single order's lines until it holds
    # hot_rows rows — Zipf head in the extreme
    hot_key = li.agg(F.min("l_orderkey")).collect()[0][0]
    hot_src = li.filter(F.col("l_orderkey") == hot_key)
    n_hot_src = hot_src.count()
    hot_mult = max(1, hot_rows // max(1, n_hot_src))
    hreps = spark.range(hot_mult).withColumnRenamed("id", "rep")
    hot = (
        hot_src.crossJoin(F.broadcast(hreps))
        .withColumn("l_linenumber", F.col("l_linenumber") + F.col("rep") * 10)
        .drop("rep")
    )
    return bulk.unionByName(hot), hot_key


def timed(label: str, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"  {label}: {n} rows in {dt:.2f}s")
    return n, dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bulk_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    hot_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    spark = get_spark(app_name="probe-skew", shuffle_partitions=32)

    df, hot_key = build_skewed(spark, sf_dir, bulk_mult, hot_rows)
    df = df.persist()
    n = df.count()
    n_hot = df.filter(F.col("l_orderkey") == hot_key).count()
    print(f"skewed fact: {n} rows, hot key {hot_key} holds {n_hot} "
          f"({100.0 * n_hot / n:.0f}%)")

    print("[keyed reduction] keep-latest by l_orderkey")
    r1, t1 = timed(
        "single-window dedup_keep_latest",
        lambda: dedup_keep_latest(
            df, "l_orderkey", ["l_shipdate", "l_linenumber"], "DESC"
        ).count(),
    )
    r2, t2 = timed(
        "two_phase (8 salts)",
        lambda: sk.two_phase_dedup_keep_latest(
            df, "l_orderkey", ["l_shipdate", "l_linenumber"], "DESC",
            n_salts=8,
        ).count(),
    )
    assert r1 == r2, (r1, r2)
    print(f"  -> two-phase speedup {t1 / t2:.2f}x")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    cond = [df.l_orderkey == orders.o_orderkey]
    print("[broadcast-ineligible join] skewed fact x orders")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    j1, tj1 = timed(
        "plain SMJ, AQE skewJoin OFF",
        lambda: df.join(orders, cond).count(),
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    j2, tj2 = timed(
        "plain SMJ, AQE skewJoin ON",
        lambda: df.join(orders, cond).count(),
    )
    j3, tj3 = timed(
        "salted_join (8 salts)",
        lambda: sk.salted_join(
            df, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            ["l_orderkey"], n_salts=8,
        ).count(),
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert j1 == j2 == j3, (j1, j2, j3)
    print(f"  -> AQE speedup {tj1 / tj2:.2f}x, salted speedup "
          f"{tj1 / tj3:.2f}x vs skew-blind")


if __name__ == "__main__":
    main()
