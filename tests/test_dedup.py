"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
near-dup (LLM-pipeline extension surface)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import dedup as D


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    variant = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    unrelated = "completely different content about database engines and query planners"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),  # exact dup
            Row(doc_id=3, text=variant),  # near dup of 1/2
            Row(doc_id=4, text=unrelated),
            Row(doc_id=5, text="THE   QUICK brown fox jumps over the lazy dog near the river bank today"),  # normalized dup of 1
        ]
    )


class TestExact:
    def test_exact_dedup_keeps_lowest_id(self, spark, near_dup_docs):
        out = D.exact_dedup(near_dup_docs)
        ids = sorted(r["doc_id"] for r in out.collect())
        assert ids == [1, 3, 4]  # 2 and 5 are (normalized) dups of 1

    def test_exact_dedup_no_normalize(self, spark, near_dup_docs):
        out = D.exact_dedup(near_dup_docs, normalize=False)
        ids = sorted(r["doc_id"] for r in out.collect())
        assert ids == [1, 3, 4, 5]


class TestJaccard:
    def test_pairs_above_threshold(self, spark, near_dup_docs):
        pairs = D.ngram_jaccard_pairs(near_dup_docs, threshold=0.5)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got and (1, 5) in got and (2, 5) in got
        assert (1, 3) in got  # one-word change, high shingle overlap
        assert not any(4 in p for p in got)

    def test_exact_dup_jaccard_is_one(self, spark, near_dup_docs):
        pairs = D.ngram_jaccard_pairs(near_dup_docs, threshold=0.99)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
        assert got[(1, 2)] == 1.0

    def test_pair_verify_equals_explode_join(self, spark, near_dup_docs):
        """jaccard_verify_pairs (per-pair array intersection, the linear
        verifier minhash_dedup uses) must agree exactly with the explode
        self-join on every pair."""
        ids = [r["doc_id"] for r in near_dup_docs.select("doc_id").collect()]
        all_pairs = spark.createDataFrame(
            [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
        )
        via_pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.jaccard_verify_pairs(
                near_dup_docs, all_pairs, threshold=0.0
            ).collect()
        }
        via_explode = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(near_dup_docs, threshold=0.0).collect()
        }
        # explode join only emits pairs sharing ≥1 shingle; pair-verify
        # emits all given pairs — restrict to the common domain, and check
        # pair-verify scored the disjoint pairs 0.
        for k, v in via_explode.items():
            assert via_pairs[k] == v
        for k in set(via_pairs) - set(via_explode):
            assert via_pairs[k] == 0.0


class TestMinHashLSH:
    def test_candidates_include_true_pairs(self, spark, near_dup_docs):
        cands = D.minhash_lsh_candidates(near_dup_docs)
        got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
        assert (1, 2) in got and (1, 5) in got

    def test_minhash_dedup_removes_near_dups(self, spark, near_dup_docs):
        out = D.minhash_dedup(near_dup_docs, jaccard_threshold=0.5)
        ids = sorted(r["doc_id"] for r in out.collect())
        assert 1 in ids and 4 in ids
        assert 2 not in ids and 5 not in ids

    def test_signature_deterministic(self, spark, near_dup_docs):
        sig1 = near_dup_docs.select(
            D.minhash_signature(F.col("text")).alias("s")
        ).collect()
        sig2 = near_dup_docs.select(
            D.minhash_signature(F.col("text")).alias("s")
        ).collect()
        assert [r["s"] for r in sig1] == [r["s"] for r in sig2]


class TestSimHash:
    def test_identical_docs_same_simhash(self, spark, near_dup_docs):
        sh = near_dup_docs.select(
            "doc_id", D.simhash64(F.col("text")).alias("sh")
        ).collect()
        by_id = {r["doc_id"]: r["sh"] for r in sh}
        assert by_id[1] == by_id[2] == by_id[5]
        assert by_id[1] != by_id[4]

    def test_near_dup_small_hamming(self, spark, near_dup_docs):
        sh = near_dup_docs.select(
            "doc_id", D.simhash64(F.col("text")).alias("sh")
        ).collect()
        by_id = {r["doc_id"]: r["sh"] for r in sh}
        ham_near = bin(by_id[1] ^ by_id[3]).count("1")
        ham_far = bin(by_id[1] ^ by_id[4]).count("1")
        assert ham_near < ham_far

    def test_candidates(self, spark, near_dup_docs):
        cands = D.simhash_candidates(near_dup_docs, max_hamming=10)
        got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
        assert (1, 2) in got


class TestEmbeddingNearDup:
    def test_pairs(self, spark):
        df = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
                Row(vec_id=2, embedding=[0.999, 0.01, 0.0]),
                Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
            ]
        )
        pairs = D.embedding_neardup_pairs(df, threshold=0.99)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == {(1, 2)}

    def test_candidates_verify_matches_all_pairs(self, spark, sf_dir):
        """The production candidates→verify path must recover EXACTLY the
        all-pairs ground truth on the perturbed testdata corpus — recall
        1.0 (LSH bands missed nothing) and exact precision (every
        surviving pair re-verified with the same cosine arithmetic)."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        dim = len(emb.first()["embedding"])
        pert = emb.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.concat(
                F.array(-F.col("embedding")[0]),
                F.slice(F.col("embedding"), 2, dim - 1),
            ).alias("embedding"),
        )
        df = emb.unionByName(pert)
        exact = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in D._verify_all_pairs(df, threshold=0.8).collect()
        }
        got = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in D.embedding_neardup_pairs(df, threshold=0.8).collect()
        }
        assert got == exact
        assert len(exact) > 0

    def test_candidate_pairs_empty_corpus(self, spark):
        df = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
        assert D.embedding_candidate_pairs(df).count() == 0


def test_exact_dedup_on_real_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.exact_dedup(docs)
    assert 0 < out.count() <= docs.count()


def test_split_contamination_bounds(spark):
    from metadata_driven_data_pipeline_spark.operators.dedup import (
        split_contamination,
    )
    from metadata_driven_data_pipeline_spark.operators.sampling import (
        _BUCKETS,
        hash_draw,
    )
    from pyspark.sql import functions as F

    # find one id that lands in the test split under the default salt
    ids = spark.createDataFrame([(i,) for i in range(200)], "doc_id LONG")
    test_ids = [
        r["doc_id"]
        for r in ids.filter(
            hash_draw(F.col("doc_id"), "split") < int(0.1 * _BUCKETS)
        ).collect()
    ]
    assert test_ids, "expected at least one test-split id in range(200)"
    tid = test_ids[0]
    train_id = next(i for i in range(200) if i not in test_ids)

    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(tid, dup_text), (train_id, dup_text),
            (train_id + 1000000, "totally different words here entirely now")]
    # ensure the extra doc is in train too
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in split_contamination(docs).collect()}
    # the test doc duplicates a train doc -> fully contaminated
    assert out[tid]["contamination"] == 1.0
    assert out[tid]["n_contaminated"] == out[tid]["n_shingles"]


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    from metadata_driven_data_pipeline_spark.operators.dedup import (
        containment_verify_pairs,
        jaccard_verify_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")

    jac = jaccard_verify_pairs(docs, pairs, threshold=0.8).collect()
    assert jac == []  # union dominated by the long doc -> low jaccard

    cont = containment_verify_pairs(docs, pairs, threshold=0.9).collect()
    assert len(cont) == 1
    assert cont[0]["containment_a"] == 1.0  # short doc fully embedded
    assert cont[0]["containment_b"] < 0.5


def test_persist_registry_release(spark, near_dup_docs):
    """minhash_dedup persists its candidate set (and the verify step its
    shingle projection); the module registry must expose those handles and
    release_persisted() must drop them all after materialization."""
    D.release_persisted()  # clean slate
    out = D.minhash_dedup(near_dup_docs)
    out.count()  # materialize while caches are live
    handles = D.persisted_handles()
    assert len(handles) >= 1
    assert all(h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles)
    released = D.release_persisted(blocking=True)
    assert released == len(handles)
    assert D.persisted_handles() == []
    assert all(not h.storageLevel.useMemory for h in handles)


def test_minhash_xxhash64_lane(spark, near_dup_docs):
    """The codegen'd xxhash64 production lane must make the same dedup
    decisions on clear dups as the oracle-reproducible md5 lane (different
    hash family, same uniform-key quality)."""
    out = D.minhash_dedup(
        near_dup_docs, jaccard_threshold=0.5, hash_fn="xxhash64"
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 1 in ids and 4 in ids
    assert 2 not in ids and 5 not in ids
    with pytest.raises(ValueError, match="hash_fn"):
        D.shingle_hashes(F.col("x"), hash_fn="sha1")


def test_collapse_exact_is_output_identical(spark):
    """collapse_exact must be a pure cost optimization: survivors match
    the uncollapsed pipeline exactly on a corpus mixing exact-dup groups
    with cross-group near-dups."""
    boiler = " ".join(f"w{i}" for i in range(30))
    rows = [
        Row(doc_id=1, text=boiler + " alpha tail"),
        Row(doc_id=5, text=boiler + " alpha tail"),      # exact dup of 1
        Row(doc_id=3, text=boiler + " beta tail"),        # near-dup of 1/5
        Row(doc_id=2, text=" ".join(f"q{i}" for i in range(30))),
        Row(doc_id=9, text=" ".join(f"q{i}" for i in range(30))),  # dup of 2
        Row(doc_id=7, text=" ".join(f"z{i}" for i in range(30))),  # unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(jaccard_threshold=0.5)
    a = sorted(
        r.doc_id
        for r in D.minhash_dedup(df, collapse_exact=False, **kw).collect()
    )
    D.release_persisted()
    b = sorted(
        r.doc_id
        for r in D.minhash_dedup(df, collapse_exact=True, **kw).collect()
    )
    D.release_persisted()
    assert a == b
    assert 1 in a and 2 in a and 7 in a  # group minima + unique survive
    assert 5 not in a and 9 not in a     # exact dups dropped


def test_hashed_verify_lane_matches_text_lane(spark, near_dup_docs):
    """shingle_hash='xxhash64' must produce IDENTICAL pairs and Jaccard
    values to the text lane — hashing distinct shingles preserves set
    intersections exactly (up to 2^-64 collisions, absent here)."""
    cand = D.minhash_lsh_candidates(near_dup_docs).persist()
    text_lane = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.jaccard_verify_pairs(near_dup_docs, cand).collect()
    }
    hashed_lane = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.jaccard_verify_pairs(
            near_dup_docs, cand, shingle_hash="xxhash64"
        ).collect()
    }
    cand.unpersist()
    D.release_persisted()
    assert text_lane == hashed_lane and text_lane
    with pytest.raises(ValueError, match="shingle_hash"):
        D.jaccard_verify_pairs(near_dup_docs, cand, shingle_hash="sha1")


class TestSpanDedup:
    def test_repeated_span_dropped_from_later_doc(self, spark):
        span = " ".join(f"w{i}" for i in range(8))  # one 8-token span
        unique = " ".join(f"u{i}" for i in range(8))
        df = spark.createDataFrame(
            [Row(doc_id=1, text=span), Row(doc_id=2, text=span + " " + unique)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in D.span_dedup(df, span_tokens=8).collect()}
        # doc 1 wins the shared span; doc 2 keeps only its unique span
        assert out[1].n_spans == 1 and out[1].n_kept == 1
        assert out[1].dedup_text == span
        assert out[2].n_spans == 2 and out[2].n_kept == 1
        assert out[2].dedup_text == unique

    def test_within_doc_repetition_collapsed(self, spark):
        span = " ".join(f"w{i}" for i in range(4))
        df = spark.createDataFrame(
            [Row(doc_id=7, text=" ".join([span] * 3))], "doc_id long, text string"
        )
        r = D.span_dedup(df, span_tokens=4).collect()[0]
        assert r.n_spans == 3 and r.n_kept == 1 and r.dedup_text == span

    def test_short_tail_span_kept_independently(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d e")], "doc_id long, text string"
        )
        r = D.span_dedup(df, span_tokens=4).collect()[0]
        assert r.n_spans == 2 and r.n_kept == 2
        assert r.dedup_text == "a b c d e"

    def test_empty_text_zero_spans(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="  ")], "doc_id long, text string"
        )
        r = D.span_dedup(df, span_tokens=4).collect()[0]
        assert r.n_spans == 0 and r.n_kept == 0 and r.dedup_text == ""

    def test_null_text_zero_spans(self, spark):
        # size(NULL) is NULL in Spark 3+ — without the coalesce guard a
        # NULL doc would leak NULL n_spans instead of the documented 0
        df = spark.createDataFrame(
            [Row(doc_id=1, text=None), Row(doc_id=2, text="a b c d")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in D.span_dedup(df, span_tokens=4).collect()}
        assert out[1].n_spans == 0 and out[1].n_kept == 0
        assert out[1].dedup_text == ""
        assert out[2].n_spans == 1 and out[2].n_kept == 1


class TestIncrementalDedup:
    def test_within_batch_then_index_probe(self, spark):
        seen = spark.createDataFrame(
            [Row(doc_id=1, text="already indexed content")],
            "doc_id long, text string",
        )
        index = seen.select(
            F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).alias(
                "fingerprint"
            )
        )
        batch = spark.createDataFrame(
            [
                Row(doc_id=10, text="already indexed content"),   # in index
                Row(doc_id=11, text="fresh content"),
                Row(doc_id=12, text="fresh content"),              # batch dup
                Row(doc_id=13, text="other fresh content"),
            ],
            "doc_id long, text string",
        )
        out = D.incremental_dedup(batch, index).collect()
        ids = sorted(r.doc_id for r in out)
        assert ids == [11, 13]  # 10 dropped by index, 12 by within-batch
        assert all(r.fingerprint is not None for r in out)

    def test_empty_index_reduces_to_exact_dedup(self, spark):
        index = spark.createDataFrame([], "fingerprint string")
        batch = spark.createDataFrame(
            [Row(doc_id=1, text="x"), Row(doc_id=2, text="x")],
            "doc_id long, text string",
        )
        ids = sorted(r.doc_id for r in D.incremental_dedup(batch, index).collect())
        assert ids == [1]


class TestIncrementalMinhashDedup:
    BOILER = " ".join(f"w{i}" for i in range(30))

    def test_near_dup_of_indexed_doc_dropped(self, spark):
        indexed = spark.createDataFrame(
            [Row(doc_id=1, text=self.BOILER + " indexed tail")],
            "doc_id long, text string",
        )
        index = D.minhash_index(indexed)
        batch = spark.createDataFrame(
            [
                # near-dup of the indexed doc (shares the 30-token boiler)
                Row(doc_id=10, text=self.BOILER + " other tail"),
                # unrelated
                Row(doc_id=11, text=" ".join(f"z{i}" for i in range(30))),
                # exact within-batch dup pair -> keep lowest id
                Row(doc_id=12, text=" ".join(f"q{i}" for i in range(30))),
                Row(doc_id=13, text=" ".join(f"q{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        out = D.incremental_minhash_dedup(batch, index)
        ids = sorted(r.doc_id for r in out.collect())
        D.release_persisted()
        assert ids == [11, 12], ids
        # returned rows carry the sig column ready to append to the index
        assert dict(out.dtypes)["sig"] == "array<bigint>"

    def test_empty_index_keeps_batch_survivors(self, spark):
        index = spark.createDataFrame([], "doc_id long, sig array<bigint>")
        batch = spark.createDataFrame(
            [
                Row(doc_id=1, text=self.BOILER),
                Row(doc_id=2, text=self.BOILER),
            ],
            "doc_id long, text string",
        )
        ids = sorted(
            r.doc_id
            for r in D.incremental_minhash_dedup(batch, index).collect()
        )
        D.release_persisted()
        assert ids == [1]

    def test_index_append_contract_catches_next_batch(self, spark):
        """Append the survivors' (id, sig) rows to the index; a later
        batch containing the same content must then be dropped."""
        index = spark.createDataFrame([], "doc_id long, sig array<bigint>")
        b1 = spark.createDataFrame(
            [Row(doc_id=1, text=self.BOILER + " first")],
            "doc_id long, text string",
        )
        out1 = D.incremental_minhash_dedup(b1, index)
        new_index = index.unionByName(out1.select("doc_id", "sig"))
        b2 = spark.createDataFrame(
            [Row(doc_id=2, text=self.BOILER + " first")],
            "doc_id long, text string",
        )
        out2 = D.incremental_minhash_dedup(b2, new_index)
        assert out2.count() == 0
        D.release_persisted()


class TestCorpusDiff:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [
                Row(doc_id=1, text="same"),
                Row(doc_id=2, text="before"),
                Row(doc_id=3, text="gone"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                Row(doc_id=1, text="same"),
                Row(doc_id=2, text="after"),
                Row(doc_id=4, text="brand new"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.status for r in D.corpus_diff(old, new).collect()}
        assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_whitespace_change_is_unchanged(self, spark):
        old = spark.createDataFrame(
            [Row(doc_id=1, text="a  b")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [Row(doc_id=1, text="A b ")], "doc_id long, text string"
        )
        assert D.corpus_diff(old, new).collect()[0].status == "unchanged"
