"""Skew helpers must be semantics-preserving: salted variants produce
exactly the unsalted results on skewed data (one hot key dominating)."""

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.consolidate import dedup_keep_latest
from metadata_driven_data_pipeline_spark.operators.skew import (
    salted_join,
    two_phase_dedup_keep_latest,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' has 500 rows; 10 cold keys have 2 each
    hot = [("hot", i, f"v{i}") for i in range(500)]
    cold = [(f"k{j}", i, f"c{j}{i}") for j in range(10) for i in range(2)]
    return spark.createDataFrame(hot + cold, "k string, seq long, payload string")


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k3", "K3"), ("nope", "X")], "k string, label string"
    )
    plain = skewed.join(dim, ["k"], "inner").select("k", "seq", "payload", "label")
    salted = salted_join(skewed, dim, ["k"], n_salts=4).select(
        "k", "seq", "payload", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    plain = skewed.join(dim, ["k"], "left_outer")
    salted = salted_join(skewed, dim, ["k"], n_salts=4, how="left_outer")
    assert sorted(map(tuple, plain.select("k", "seq", "label").collect())) == sorted(
        map(tuple, salted.select("k", "seq", "label").collect())
    )


def test_two_phase_dedup_matches_single_phase(spark, skewed):
    single = dedup_keep_latest(skewed, ["k"], ["seq"], "DESC")
    double = two_phase_dedup_keep_latest(skewed, ["k"], ["seq"], "DESC", n_salts=4)
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, double.collect()))
    assert double.count() == 11  # one winner per key
