"""Python UDAF (grouped-agg pandas) and UDTF surface."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_centroid_udaf_matches_exact_decimal_update(spark):
    from metadata_driven_data_pipeline_spark.functions.udxf import centroid_udaf
    from metadata_driven_data_pipeline_spark.operators.clustering import (
        kmeans_update,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 2.0], 0), (2, [2.0, 0.0], 0), (3, [8.0, 8.0], 1)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    got = {
        r["label"]: r["centroid"]
        for r in emb.groupBy("label")
        .agg(centroid_udaf("embedding").alias("centroid"))
        .collect()
    }
    assert got[0] == [1.0, 1.0]
    assert got[1] == [8.0, 8.0]

    # agrees with the exact-decimal JVM-side formulation
    assignment = emb.select("vec_id", F.col("label").alias("cluster_id"))
    exact = {
        (r["cluster_id"], r["dim"]): r["centroid_val"]
        for r in kmeans_update(emb, assignment).collect()
    }
    for label, cent in got.items():
        for dim, val in enumerate(cent):
            assert abs(exact[(label, dim)] - val) < 1e-9


def test_toptokens_udtf_matches_declarative(spark):
    from metadata_driven_data_pipeline_spark.functions.udxf import TopTokens

    spark.udtf.register("top_tokens", TopTokens)
    spark.createDataFrame(
        [(1, "a b a c a b"), (2, "x y x"), (3, None)],
        "doc_id LONG, text STRING",
    ).createOrReplaceTempView("docs_udtf")

    rows = spark.sql("""
        SELECT doc_id, t.token, t.n
        FROM docs_udtf, LATERAL top_tokens(text, 2) t
    """).collect()
    got = {(r["doc_id"], r["token"], r["n"]) for r in rows}
    assert got == {(1, "a", 3), (1, "b", 2), (2, "x", 2), (2, "y", 1)}
    # null text emits no rows and doc 3 is absent
    assert not any(d == 3 for d, _, _ in got)
