"""Scale-path storage layouts: bucketed joins must be shuffle-free, and
partitioned sinks must partition-prune on read. Both asserted on the
physical plan, not just results."""

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sinks.bucketing import write_bucketed
from metadata_driven_data_pipeline_spark.sinks.writer import write_df


def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    # a fresh derby metastore forgets tables whose files persist in the
    # warehouse dir from earlier sessions — clear both
    import shutil
    for t in ("ta", "tb"):
        spark.sql(f"DROP TABLE IF EXISTS bktest.{t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/bktest.db/{t}", ignore_errors=True)
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bktest.ta", ["k"], 4, sort_cols=["k"])
    write_bucketed(b, "bktest.tb", ["k"], 4, sort_cols=["k"])

    ta, tb = spark.table("bktest.ta"), spark.table("bktest.tb")
    joined = ta.join(tb.hint("merge"), "k")
    plan = plan_of(joined)
    assert "Exchange" not in plan, f"bucketed join should be shuffle-free:\n{plan}"
    assert joined.count() == 1000


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join without bucketing exchanges both sides
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = plan_of(a.join(b.hint("merge"), "k"))
    assert "Exchange" in plan


def test_partitioned_sink_prunes_on_read(spark, tmp_path):
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2025-01-01", "2025-01-02", "2025-01-03")
         for i in range(10)],
        "batch_date string, rid long, v double",
    )
    out = str(tmp_path / "part")
    write_df(df, out, fmt="parquet", partition_by=["batch_date"])

    back = spark.read.parquet(out).filter(F.col("batch_date") == "2025-01-02")
    plan = plan_of(back)
    assert "PartitionFilters" in plan and "batch_date" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == 10
