"""semdedup_pairs: k-means-bucketed within-cluster cosine near-dups."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.similarity import semdedup_pairs


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def _cents(spark, rows):
    return spark.createDataFrame(rows, "cluster_id INT, centroid ARRAY<FLOAT>")


def test_finds_within_cluster_pairs_only(spark):
    # two tight groups far apart; one centroid near each
    emb = _emb(spark, [
        (1, [1.0, 0.0]), (2, [0.99, 0.01]),      # cluster around +x
        (3, [0.0, 1.0]), (4, [0.01, 0.99]),      # cluster around +y
    ])
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    rows = semdedup_pairs(emb, cents, threshold=0.9).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert pairs == {(1, 2), (3, 4)}


def test_cross_cluster_pair_missed_by_design(spark):
    # near-identical vectors forced into different buckets by the centroids
    emb = _emb(spark, [(1, [1.0, 0.9]), (2, [0.9, 1.0])])
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    assert semdedup_pairs(emb, cents, threshold=0.5).count() == 0


def test_threshold_filters(spark):
    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    cents = _cents(spark, [(0, [1.0, 1.0])])
    # same cluster, orthogonal vectors: cosine 0 < threshold
    assert semdedup_pairs(emb, cents, threshold=0.5).count() == 0
    out = semdedup_pairs(emb, cents, threshold=0.0).collect()
    assert len(out) == 1 and out[0]["cosine"] == 0.0


def test_semdedup_auto_deterministic_and_linear_k(spark):
    from metadata_driven_data_pipeline_spark.operators.similarity import (
        semdedup_auto,
    )

    emb = _emb(
        spark,
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(200)],
    )
    a = {(r["id_a"], r["id_b"]) for r in semdedup_auto(emb, bucket_size=20,
                                                        threshold=0.999).collect()}
    b = {(r["id_a"], r["id_b"]) for r in semdedup_auto(emb, bucket_size=20,
                                                        threshold=0.999).collect()}
    assert a == b  # same corpus -> same centroids -> same pairs
    # identical-direction vectors within a bucket are found
    assert len(a) > 0
