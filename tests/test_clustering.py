"""Connected-components clustering (operators/clustering.py).

Crafted pair graphs exercise convergence shapes the sf-data oracle run
doesn't isolate: chains (pointer-jumping path compression), cycles, multiple
components, and the end-to-end neardup_groups composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import clustering as cl


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _groups(df):
    return {
        (r["doc_id"], r["group_id"]) for r in df.collect()
    }


class TestConnectedComponents:
    def test_single_pair(self, spark):
        out = cl.connected_components(_pairs(spark, [(1, 2)]))
        assert _groups(out) == {(1, 1), (2, 1)}

    def test_chain_collapses_to_min(self, spark):
        # 0-1-2-3-4-5: long path — exercises pointer jumping
        out = cl.connected_components(
            _pairs(spark, [(i, i + 1) for i in range(5)])
        )
        assert _groups(out) == {(i, 0) for i in range(6)}

    def test_cycle(self, spark):
        out = cl.connected_components(
            _pairs(spark, [(1, 2), (2, 3), (3, 1)])
        )
        assert _groups(out) == {(1, 1), (2, 1), (3, 1)}

    def test_two_components(self, spark):
        out = cl.connected_components(
            _pairs(spark, [(1, 2), (2, 3), (10, 11)])
        )
        assert _groups(out) == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    def test_reversed_and_duplicate_edges(self, spark):
        out = cl.connected_components(
            _pairs(spark, [(2, 1), (1, 2), (3, 2)])
        )
        assert _groups(out) == {(1, 1), (2, 1), (3, 1)}

    def test_empty_pairs(self, spark):
        out = cl.connected_components(
            spark.createDataFrame([], "id_a long, id_b long")
        )
        assert out.count() == 0
        assert out.columns == ["doc_id", "group_id"]


class TestNeardupGroups:
    def test_perturbed_copies_cluster_with_originals(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        pert = docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
        out = cl.neardup_groups(
            docs.unionByName(pert), jaccard_threshold=0.7
        ).collect()
        by_id = {r["doc_id"]: r["group_id"] for r in out}
        # every perturbed doc must land in its original's group
        for orig in range(10):
            if orig + 10000 in by_id:
                assert by_id[orig + 10000] == by_id.get(orig, orig)
        # group representative is always the component min ⇒ ≤ member id
        assert all(g <= d for d, g in by_id.items())
