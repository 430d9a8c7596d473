"""Count-Min sketch: over-estimate guarantee, error bound, mergeability."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import sketch as SK
from metadata_driven_data_pipeline_spark.operators.text import (
    normalize_text,
    tokens,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")


def exact_counts(docs, terms):
    toks = docs.select(
        F.explode(tokens(normalize_text(F.col("text")))).alias("tok")
    )
    rows = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    got = {r.tok: r.c for r in rows}
    return {t: got.get(t, 0) for t in terms}


def test_estimates_never_underestimate_and_bounded(spark, docs):
    terms = ["the", "data", "spark", "batch", "zzz_absent_token"]
    n_total = docs.select(
        F.sum(F.size(tokens(normalize_text(F.col("text"))))).alias("n")
    ).collect()[0]["n"]
    cms = SK.cms_build(docs, depth=4, width=1024).persist()
    est = {
        r.term: r.est
        for r in SK.cms_estimate(cms, terms, depth=4, width=1024).collect()
    }
    cms.unpersist()
    exact = exact_counts(docs, terms)
    eps_n = 2.72 * n_total / 1024  # e/w * N
    for t in terms:
        assert est[t] >= exact[t], (t, est[t], exact[t])
        assert est[t] <= exact[t] + eps_n, (t, est[t], exact[t], eps_n)
    assert exact["zzz_absent_token"] == 0


def test_sketch_grid_is_bounded(spark, docs):
    cms = SK.cms_build(docs, depth=4, width=256)
    assert cms.count() <= 4 * 256
    # counters sum to depth * total tokens (every occurrence lands once
    # per row)
    n_total = docs.select(
        F.sum(F.size(tokens(normalize_text(F.col("text"))))).alias("n")
    ).collect()[0]["n"]
    assert cms.agg(F.sum("cnt")).collect()[0][0] == 4 * n_total


def test_sketches_merge_by_addition(spark):
    a = spark.createDataFrame([Row(text="x x y")])
    b = spark.createDataFrame([Row(text="x z")])
    both = a.unionByName(b)
    merged = (
        SK.cms_build(a, width=64)
        .unionByName(SK.cms_build(b, width=64))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = {
        (r.depth, r.bucket): r.cnt
        for r in SK.cms_build(both, width=64).collect()
    }
    assert {
        (r.depth, r.bucket): r.cnt for r in merged.collect()
    } == direct
    est = {
        r.term: r.est
        for r in SK.cms_estimate(merged, ["x", "y", "z"], width=64).collect()
    }
    assert est["x"] >= 3 and est["y"] >= 1 and est["z"] >= 1


def test_empty_terms_raise(spark, docs):
    with pytest.raises(ValueError, match="non-empty"):
        SK.cms_estimate(SK.cms_build(docs), [])


# ---- HLL incremental-distinct sketches ---------------------------------


def test_hll_merge_equals_single_pass(spark):
    """Union of shard sketches must reproduce the whole-corpus sketch
    estimate exactly (register-wise max is associative)."""
    df = spark.range(0, 50_000).select(
        (F.col("id") % 20_000).alias("k"),
        (F.col("id") % 7).alias("shard"),
    )
    merged = SK.hll_merge(SK.hll_shard_sketches(df, "k", "shard")).collect()[0]
    whole = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("k"), F.lit(12))
        ).alias("est")
    ).collect()[0]
    assert merged.est == whole.est


def test_hll_estimate_within_bound_dense(spark):
    """200k distinct keys is far past sparse mode: the estimate must
    land within the 3-sigma HLL bound (1.04/sqrt(4096) ~ 1.6%/sigma)."""
    df = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("shard")
    )
    est = SK.hll_merge(SK.hll_shard_sketches(df, "k", "shard")).collect()[0].est
    assert abs(est - 200_000) <= 0.05 * 200_000


def test_hll_merge_idempotent_on_replayed_shard(spark):
    """Re-merging a duplicated shard sketch must not change the estimate
    (register max is idempotent) — the at-least-once replay guarantee."""
    df = spark.range(0, 30_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("shard")
    )
    shards = SK.hll_shard_sketches(df, "k", "shard").persist()
    replayed = shards.unionByName(shards.limit(1))
    try:
        assert (
            SK.hll_merge(replayed).collect()[0].est
            == SK.hll_merge(shards).collect()[0].est
        )
    finally:
        shards.unpersist()
