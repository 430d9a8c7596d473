"""Deterministic sampling / splitting / packing operators
(operators/sampling.py, operators/text.py::pack_sequences).

Not in the reference (no sampling of any kind); extension surface for
training-data curation. The load-bearing properties tested here:
determinism (no RNG), stability under corpus growth (hash membership is a
pure function of the key), per-stratum rate control, and the greedy
prefix-sum packing rule.
"""

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import sampling as smp
from metadata_driven_data_pipeline_spark.operators.text import pack_sequences
from pyspark.sql import Row

S = smp


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"doc number {i} body") for i in range(3000)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


class TestHashSample:
    def test_deterministic_and_approximate_rate(self, docs):
        a = sorted(r.doc_id for r in smp.hash_sample(docs, "doc_id", 0.2).collect())
        b = sorted(r.doc_id for r in smp.hash_sample(docs, "doc_id", 0.2).collect())
        assert a == b
        assert 0.15 < len(a) / 3000 < 0.25

    def test_membership_stable_under_growth(self, spark, docs):
        """A key's sample membership must not change when the corpus grows —
        the property that makes incremental re-ingestion reproducible."""
        small = docs.filter(F.col("doc_id") < 1000)
        s_small = {r.doc_id for r in smp.hash_sample(small, "doc_id", 0.2).collect()}
        s_full = {
            r.doc_id
            for r in smp.hash_sample(docs, "doc_id", 0.2).collect()
            if r.doc_id < 1000
        }
        assert s_small == s_full

    def test_salt_decorrelates(self, docs):
        a = {r.doc_id for r in smp.hash_sample(docs, "doc_id", 0.5, salt="a").collect()}
        b = {r.doc_id for r in smp.hash_sample(docs, "doc_id", 0.5, salt="b").collect()}
        assert a != b
        overlap = len(a & b) / min(len(a), len(b))
        assert 0.3 < overlap < 0.7  # ~independent 50% draws overlap ~50%

    def test_no_shuffle(self, docs):
        plan = smp.hash_sample(docs, "doc_id", 0.2)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestStratifiedSample:
    def test_per_stratum_rates(self, docs):
        out = smp.stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_fraction=0.0
        )
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert 0.4 < counts["en"] / 1000 < 0.6
        assert 0.05 < counts["de"] / 1000 < 0.16
        assert "fr" not in counts  # default 0 drops unlisted strata


class TestTrainTestSplit:
    def test_partition_and_rates(self, docs):
        out = smp.train_test_split(docs, "doc_id", 0.1, 0.1)
        counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 3000
        assert 0.05 < counts["test"] / 3000 < 0.15
        assert 0.05 < counts["validation"] / 3000 < 0.15

    def test_assignment_stable_under_growth(self, docs):
        small = docs.filter(F.col("doc_id") < 1000)
        a = {r.doc_id: r.split for r in smp.train_test_split(small, "doc_id", 0.1, 0.1).collect()}
        b = {
            r.doc_id: r.split
            for r in smp.train_test_split(docs, "doc_id", 0.1, 0.1).collect()
            if r.doc_id < 1000
        }
        assert a == b


class TestPackSequences:
    def test_greedy_prefix_rule(self, spark):
        rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        out = pack_sequences(df, "n_tokens", "doc_id", budget=100).collect()
        # recompute the rule driver-side
        cum = 0
        for r in sorted(out, key=lambda r: r.doc_id):
            assert r.pack_id == cum // 100, r
            cum += r.n_tokens
        # packs are dense 0..max
        packs = sorted({r.pack_id for r in out})
        assert packs == list(range(len(packs)))

    def test_sharded_packing_parallel_and_independent(self, spark):
        rows = [(i, ["a", "b"][i % 2], 60) for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
        out = pack_sequences(df, "n_tokens", "doc_id", budget=120, shard_col="shard")
        per = (
            out.groupBy("shard", "pack_id").agg(F.count("*").alias("n")).collect()
        )
        # 50 docs x 60 tokens per shard, budget 120 -> 2 docs per pack, 25 packs
        assert all(r.n == 2 for r in per)
        assert len(per) == 50


class TestDomainMix:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # skewed natural mixture: 600 web, 300 code, 100 books, 50 junk
        rows = (
            [(i, "web") for i in range(600)]
            + [(600 + i, "code") for i in range(300)]
            + [(900 + i, "books") for i in range(100)]
            + [(1000 + i, "junk") for i in range(50)]
        )
        return spark.createDataFrame(rows, ["doc_id", "domain"])

    def test_binding_domain_kept_whole_and_target_hit(self, corpus):
        # target 50/25/25: books is binding (100/0.25=400 < 600/0.5, 300/0.25)
        out = smp.domain_mix(
            corpus, "doc_id", "domain", {"web": 0.5, "code": 0.25, "books": 0.25}
        )
        counts = {
            r.domain: r.n
            for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
        }
        assert counts["books"] == 100  # binding domain: kept in full
        assert "junk" not in counts  # unweighted domains dropped
        # others hit the target rate within hash-draw noise
        assert abs(counts["web"] - 200) < 40
        assert abs(counts["code"] - 100) < 30

    def test_deterministic(self, corpus):
        w = {"web": 0.5, "code": 0.25, "books": 0.25}
        a = sorted(r.doc_id for r in smp.domain_mix(corpus, "doc_id", "domain", w).collect())
        b = sorted(r.doc_id for r in smp.domain_mix(corpus, "doc_id", "domain", w).collect())
        assert a == b and len(a) > 0

    def test_rejects_bad_weights(self, corpus):
        with pytest.raises(ValueError):
            smp.domain_mix(corpus, "doc_id", "domain", {})
        with pytest.raises(ValueError):
            smp.domain_mix(corpus, "doc_id", "domain", {"web": -1.0})


class TestSamplePerGroup:
    def test_exact_counts_per_group(self, spark):
        df = spark.createDataFrame(
            [Row(id=i, grp=f"g{i % 3}") for i in range(100)]
        )
        out = S.sample_per_group(df, "grp", k=5, key_col="id")
        counts = {
            r.grp: r.c
            for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()
        }
        assert counts == {"g0": 5, "g1": 5, "g2": 5}

    def test_small_groups_kept_whole_and_deterministic(self, spark):
        df = spark.createDataFrame(
            [Row(id=i, grp="small" if i < 3 else "big") for i in range(50)]
        )
        a = {r.id for r in S.sample_per_group(df, "grp", 10, "id").collect()}
        b = {
            r.id
            for r in S.sample_per_group(
                df.repartition(7), "grp", 10, "id"
            ).collect()
        }
        assert a == b  # stable under repartitioning
        assert {0, 1, 2} <= a  # |small| < k -> all kept
        assert len([i for i in a if i >= 3]) == 10

    def test_growth_low_churn(self, spark):
        """Adding rows only displaces higher-draw members: the sample
        from the grown corpus keeps every surviving old member."""
        base = spark.createDataFrame([Row(id=i, grp="g") for i in range(40)])
        grown = spark.createDataFrame(
            [Row(id=i, grp="g") for i in range(60)]
        )
        s_base = {r.id for r in S.sample_per_group(base, "grp", 10, "id").collect()}
        s_grown = {r.id for r in S.sample_per_group(grown, "grp", 10, "id").collect()}
        # every grown-sample member that existed before was in the base
        # sample OR the base sample member was displaced by a lower draw
        assert s_grown & s_base  # heavy overlap, not a reshuffle
        assert len(s_grown) == 10

    def test_k_validation(self, spark):
        df = spark.createDataFrame([Row(id=1, grp="g")])
        with pytest.raises(ValueError, match="positive"):
            S.sample_per_group(df, "grp", 0, "id")


class TestEpochShuffle:
    def test_positions_dense_and_deterministic(self, spark):
        df = spark.createDataFrame([Row(id=i) for i in range(200)])
        a = {r.id: r.position for r in S.epoch_shuffle(df, "id", epoch=1).collect()}
        b = {
            r.id: r.position
            for r in S.epoch_shuffle(df.repartition(5), "id", epoch=1).collect()
        }
        assert a == b  # same permutation regardless of partitioning
        assert sorted(a.values()) == list(range(1, 201))  # dense 1..n

    def test_epochs_give_different_orders(self, spark):
        df = spark.createDataFrame([Row(id=i) for i in range(200)])
        e0 = [r.id for r in S.epoch_shuffle(df, "id", 0).orderBy("position").collect()]
        e1 = [r.id for r in S.epoch_shuffle(df, "id", 1).orderBy("position").collect()]
        assert e0 != e1
        assert sorted(e0) == sorted(e1) == list(range(200))
        # and a genuine shuffle, not identity order
        assert e0 != list(range(200))


class TestTokenBudgetSample:
    def _docs(self, spark):
        rows = [
            Row(doc_id=i, source=f"d{i % 3}", n_tokens=10 + (i % 7))
            for i in range(300)
        ]
        return spark.createDataFrame(rows)

    def test_budget_fill_is_tight(self, spark):
        df = self._docs(spark)
        out = smp.token_budget_sample(
            df, {"d0": 200, "d1": 500}, domain_col="source"
        )
        per = {
            r.source: (r.total, r.last)
            for r in out.groupBy("source")
            .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("last"))
            .collect()
        }
        assert set(per) == {"d0", "d1"}  # d2 not budgeted -> excluded
        for dom, budget in [("d0", 200), ("d1", 500)]:
            total, biggest = per[dom]
            assert total >= budget  # crossing doc included
            assert total - budget < biggest  # overshoot < one doc

    def test_deterministic_under_repartition(self, spark):
        df = self._docs(spark)
        a = sorted(
            r.doc_id
            for r in smp.token_budget_sample(
                df, 300, domain_col="source"
            ).collect()
        )
        b = sorted(
            r.doc_id
            for r in smp.token_budget_sample(
                df.repartition(13), 300, domain_col="source"
            ).collect()
        )
        assert a == b and a

    def test_huge_budget_keeps_everything(self, spark):
        df = self._docs(spark)
        out = smp.token_budget_sample(df, 10**9, domain_col="source")
        assert out.count() == 300
