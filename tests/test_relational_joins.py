"""Unit tests for the custom join operators (SURVEY §2.3 extension rows):
as-of join (union+window) and point-in-interval range join (bucketed
equi-join). The reference has no joins at all (SURVEY §2.3); these are the
rebuild's scale-path implementations of the two join shapes Spark lacks."""

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.relational import (
    asof_join,
    point_interval_join,
)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 3, 100), ("A", 8, 101), ("B", 5, 102), ("C", 1, 103)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 3, 11.0), ("A", 7, 12.0), ("B", 2, 20.0), ("B", 9, 21.0)],
        "sym string, t long, px double",
    )
    return trades, quotes


class TestAsofJoin:
    def test_backward_match(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, ["sym"], ["t"], "q")
        rows = {r["trade_id"]: r["q"] for r in out.collect()}
        assert rows[100]["px"] == 10.0  # t=3 trade matches t=1 quote (strict <)
        assert rows[101]["px"] == 12.0  # t=8 → latest quote at t=7
        assert rows[102]["px"] == 20.0  # B t=5 → quote t=2 (t=9 is later)
        assert rows[103] is None  # C has no quotes at all

    def test_strictly_before_on_tie(self, trades_quotes):
        trades, quotes = trades_quotes
        # trade A@t=3 must NOT match quote A@t=3 when t is the whole order
        out = asof_join(trades, quotes, ["sym"], ["t"], "q")
        r = {x["trade_id"]: x["q"] for x in out.collect()}
        assert r[100]["t"] == 1

    def test_preserves_left_rowcount(self, trades_quotes):
        trades, quotes = trades_quotes
        assert asof_join(trades, quotes, ["sym"], ["t"]).count() == trades.count()

    def test_no_shuffle_explosion_plan(self, trades_quotes):
        """Plan must be window-based: no BroadcastNestedLoopJoin / CartesianProduct."""
        trades, quotes = trades_quotes
        plan = asof_join(trades, quotes, ["sym"], ["t"])._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        assert "Window" in plan


class TestPointIntervalJoin:
    def test_containment(self, spark):
        points = spark.createDataFrame(
            [(1, 5, 900), (1, 17, 901), (1, 30, 902), (2, 5, 903)],
            "k long, p long, pid long",
        )
        intervals = spark.createDataFrame(
            [(1, 0, 10, 800), (1, 15, 20, 801), (2, 100, 200, 802)],
            "k long, s long, e long, iid long",
        )
        out = point_interval_join(points, intervals, ["k"], "p", "s", "e", 10)
        pairs = {(r["iid"], r["pid"]) for r in out.collect()}
        assert pairs == {(800, 900), (801, 901)}

    def test_half_open_end_excluded(self, spark):
        points = spark.createDataFrame([(1, 10, 0)], "k long, p long, pid long")
        intervals = spark.createDataFrame([(1, 0, 10, 1)], "k long, s long, e long, iid long")
        assert point_interval_join(points, intervals, ["k"], "p", "s", "e", 4).count() == 0

    def test_interval_spanning_buckets(self, spark):
        # interval [2, 95) spans many width-10 buckets; all contained points match once
        points = spark.createDataFrame(
            [(1, v, v) for v in (2, 9, 50, 94, 95)], "k long, p long, pid long"
        )
        intervals = spark.createDataFrame([(1, 2, 95, 7)], "k long, s long, e long, iid long")
        out = point_interval_join(points, intervals, ["k"], "p", "s", "e", 10)
        assert sorted(r["pid"] for r in out.collect()) == [2, 9, 50, 94]

    def test_equi_join_plan(self, spark):
        points = spark.createDataFrame([(1, 5, 0)], "k long, p long, pid long")
        intervals = spark.createDataFrame([(1, 0, 10, 1)], "k long, s long, e long, iid long")
        plan = point_interval_join(
            points, intervals, ["k"], "p", "s", "e", 10
        )._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_grouped_topk_equals_window_formulation(spark, sf_dir):
    """The aggregation-based top-k must return exactly the window top-k
    (same ordering, same tiebreak), with no Window/Sort in its plan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metadata_driven_data_pipeline_spark.operators.relational import (
        grouped_topk,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_brand", "p_retailprice", "p_partkey"
    )
    via_agg = {
        (r["p_brand"], r["p_partkey"], r["rank"])
        for r in grouped_topk(
            part, ["p_brand"], "p_retailprice", 3,
            descending=True, tiebreak_col="p_partkey",
        ).collect()
    }
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").desc()
    )
    via_window = {
        (r["p_brand"], r["p_partkey"], r["rank"])
        for r in part.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3").collect()
    }
    assert via_agg == via_window

    plan = grouped_topk(
        part, ["p_brand"], "p_retailprice", 3,
        descending=True, tiebreak_col="p_partkey",
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
