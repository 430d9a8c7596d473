"""K-means assign/update/fit over embedding columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_update,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def _cents(spark, rows):
    return spark.createDataFrame(rows, "cluster_id INT, centroid ARRAY<FLOAT>")


def test_assign_nearest(spark):
    emb = _emb(spark, [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [6.0, 6.0])])
    cents = _cents(spark, [(0, [0.0, 0.0]), (1, [10.0, 10.0])])
    got = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(emb, cents).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_assign_tie_breaks_to_lowest_cluster_id(spark):
    emb = _emb(spark, [(1, [5.0, 5.0])])
    cents = _cents(spark, [(7, [0.0, 0.0]), (3, [10.0, 10.0])])
    rows = kmeans_assign(emb, cents).collect()
    assert rows[0]["cluster_id"] == 3  # equidistant -> lowest id


def test_assign_dist2_exact(spark):
    emb = _emb(spark, [(1, [3.0, 4.0])])
    cents = _cents(spark, [(0, [0.0, 0.0])])
    assert kmeans_assign(emb, cents).collect()[0]["dist2"] == 25.0


def test_update_means(spark):
    emb = _emb(spark, [(1, [0.0, 2.0]), (2, [2.0, 0.0]), (3, [8.0, 8.0])])
    assignment = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id LONG, cluster_id INT"
    )
    rows = kmeans_update(emb, assignment).collect()
    got = {(r["cluster_id"], r["dim"]): (r["centroid_val"], r["n_members"]) for r in rows}
    assert got[(0, 0)] == (1.0, 2)
    assert got[(0, 1)] == (1.0, 2)
    assert got[(1, 0)] == (8.0, 1)
    assert len(got) == 4


def test_fit_converges_on_blobs(spark):
    # two well-separated blobs; seeds (lowest 2 ids) fall one in each blob
    rows = [(i, [0.0 + 0.1 * (i % 3), 0.0]) for i in range(0, 10, 2)]
    rows += [(i, [9.0 + 0.1 * (i % 3), 9.0]) for i in range(1, 11, 2)]
    emb = _emb(spark, rows)
    out = kmeans_fit(emb, k=2, max_iter=10).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    assert len(out) == 10
    groups = sorted(by_cluster.values(), key=len)
    assert {frozenset(g) for g in by_cluster.values()} == {
        frozenset(range(0, 10, 2)),
        frozenset(range(1, 11, 2)),
    }
