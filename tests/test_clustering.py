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


class TestNeardupGroupsCollapse:
    def test_collapse_exact_output_identical(self, spark):
        """collapse_exact must reproduce the uncollapsed group structure
        exactly on a corpus mixing exact-dup groups (incl. one with NO
        fuzzy neighbor), cross-group near-dups, and singletons."""
        from pyspark.sql import Row

        boiler = " ".join(f"w{i}" for i in range(30))
        rows = [
            Row(doc_id=1, text=boiler + " alpha tail"),
            Row(doc_id=5, text=boiler + " alpha tail"),   # exact dup of 1
            Row(doc_id=3, text=boiler + " beta tail"),    # near-dup of 1/5
            Row(doc_id=2, text=" ".join(f"q{i}" for i in range(30))),
            Row(doc_id=9, text=" ".join(f"q{i}" for i in range(30))),
            # ^ exact pair with no fuzzy neighbor — a group on its own
            Row(doc_id=7, text=" ".join(f"z{i}" for i in range(30))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {
            (r.doc_id, r.group_id)
            for r in cl.neardup_groups(
                df, jaccard_threshold=0.5, collapse_exact=False
            ).collect()
        }
        from metadata_driven_data_pipeline_spark.operators import dedup as DD

        DD.release_persisted()
        b = {
            (r.doc_id, r.group_id)
            for r in cl.neardup_groups(
                df, jaccard_threshold=0.5, collapse_exact=True
            ).collect()
        }
        DD.release_persisted()
        assert a == b
        assert (5, 1) in a and (3, 1) in a     # fuzzy+exact share group 1
        assert (9, 2) in a and (2, 2) in a     # exact-only pair is a group
        assert all(d != 7 for d, _ in a)        # singleton excluded


class TestNeardupKeepBest:
    def test_keep_longest_survivor_per_group(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        pert = docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
        corpus = docs.unionByName(pert)
        groups = cl.neardup_groups(corpus, jaccard_threshold=0.7)
        kept = cl.neardup_keep_best(corpus, jaccard_threshold=0.7)
        kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

        # exactly one survivor per dup group; it has the max text length
        rows = corpus.join(groups, "doc_id").select(
            "doc_id", "group_id", F.length("text").alias("len")
        ).collect()
        by_group: dict[int, list] = {}
        for r in rows:
            by_group.setdefault(r["group_id"], []).append(r)
        for gid, members in by_group.items():
            survivors = [m for m in members if m["doc_id"] in kept_ids]
            assert len(survivors) == 1, f"group {gid}"
            max_len = max(m["len"] for m in members)
            assert survivors[0]["len"] == max_len
        # ungrouped docs all survive
        grouped = {r["doc_id"] for r in rows}
        all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
        assert (all_ids - grouped) <= kept_ids
        # the ' extra' copy is strictly longer than its original, so in any
        # two-member group {orig, orig+10000} the perturbed id survives
        by_id = {r["doc_id"]: r["group_id"] for r in rows}
        members_of = {}
        for d, g in by_id.items():
            members_of.setdefault(g, set()).add(d)
        for orig in range(10):
            pid = orig + 10000
            if orig in by_id and by_id.get(pid) == by_id[orig]:
                if members_of[by_id[orig]] == {orig, pid}:
                    assert pid in kept_ids
                    assert orig not in kept_ids
