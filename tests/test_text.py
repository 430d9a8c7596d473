"""Text-analysis operators (LLM-pipeline extension surface)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def one(spark, s, col_fn):
    df = spark.createDataFrame([Row(text=s)])
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0]["v"]


class TestTokens:
    def test_token_count(self, spark):
        assert one(spark, "a b  c", X.token_count) == 3

    def test_empty_string_zero_tokens(self, spark):
        assert one(spark, "", X.token_count) == 0
        assert one(spark, "   ", X.token_count) == 0

    def test_bpe_ish_count(self, spark):
        # "hello, world!" -> hello , world ! = 4 pieces
        assert one(spark, "hello, world!", X.bpe_ish_token_count) == 4


class TestRatios:
    def test_punct_ratio(self, spark):
        assert one(spark, "ab!?", X.punct_ratio) == 0.5

    def test_punct_ratio_empty(self, spark):
        assert one(spark, "", X.punct_ratio) == 0.0

    def test_stopword_ratio(self, spark):
        v = one(spark, "the cat and the dog", lambda c: X.stopword_ratio(c))
        assert v == pytest.approx(3 / 5)

    def test_uppercase_ratio(self, spark):
        assert one(spark, "ABcd", X.uppercase_ratio) == 0.5


class TestQuality:
    def test_score_in_unit_interval(self, spark, docs):
        stats = docs.select(X.quality_score(F.col("text")).alias("q")).agg(
            F.min("q").alias("lo"), F.max("q").alias("hi")
        ).collect()[0]
        assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0

    def test_clean_prose_beats_garbage(self, spark):
        clean = one(spark, "the quick brown fox jumps over the lazy dog and it is fine for all of us to see that", X.quality_score)
        garbage = one(spark, "@#$% ^&* !!! ???", X.quality_score)
        assert clean > garbage


class TestLangId:
    def test_english(self, spark):
        assert one(spark, "the cat and the dog is in the house", X.lang_id) == "en"

    def test_spanish(self, spark):
        assert one(spark, "el perro y la casa de los gatos en un dia", X.lang_id) == "es"

    def test_undetermined(self, spark):
        assert one(spark, "zzz qqq xxx", X.lang_id) == "und"

    def test_deterministic_tie_breaks_by_code(self, spark):
        # "la" is in both es and fr lists -> tie -> lexicographically first code
        assert one(spark, "la", X.lang_id) in ("es", "fr")
        a = one(spark, "la", X.lang_id)
        b = one(spark, "la", X.lang_id)
        assert a == b


class TestFingerprint:
    def test_normalization_collapses_case_and_space(self, spark):
        a = one(spark, "Hello   World", X.fingerprint_md5)
        b = one(spark, "hello world", X.fingerprint_md5)
        assert a == b

    def test_different_text_differs(self, spark):
        a = one(spark, "hello world", X.fingerprint_md5)
        b = one(spark, "goodbye world", X.fingerprint_md5)
        assert a != b

    def test_rolling_fingerprint_short_doc(self, spark):
        v = one(spark, "one two", X.rolling_fingerprint)
        assert isinstance(v, int)


def test_text_profile_runs_on_real_docs(spark, docs):
    prof = X.text_profile(docs)
    row = prof.filter("doc_id = 0").collect()[0]
    assert row["n_tokens"] > 0
    assert row["n_chars_computed"] == row["n_chars"]
    assert 0 <= row["quality_score"] <= 1
    assert len(row["fingerprint"]) == 32


class TestRedactPII:
    def test_email(self, spark):
        assert (
            one(spark, "mail me at jo.doe+x@sub.example.co today", X.redact_pii)
            == "mail me at <EMAIL> today"
        )

    def test_ipv4(self, spark):
        assert one(spark, "host 192.168.0.1 down", X.redact_pii) == "host <IP> down"

    def test_phone(self, spark):
        assert (
            one(spark, "call +1 (415) 555-0134 now", X.redact_pii)
            == "call <PHONE> now"
        )

    def test_email_before_ip_ordering(self, spark):
        # digits+dots inside an email must not leak a partial <IP> match
        assert one(spark, "a 1.2.3.4@x.example.com b", X.redact_pii) == "a <EMAIL> b"

    def test_clean_text_untouched(self, spark):
        s = "no pii here, just words and 42 numbers"
        assert one(spark, s, X.redact_pii) == s


class TestRepetition:
    def test_bigrams(self, spark):
        df = spark.createDataFrame([Row(t="a b c")])
        out = df.select(X.bigrams(X.tokens(F.col("t"))).alias("g")).collect()[0]["g"]
        assert out == ["a b", "b c"]

    def test_bigrams_short(self, spark):
        df = spark.createDataFrame([Row(t="solo")])
        out = df.select(X.bigrams(X.tokens(F.col("t"))).alias("g")).collect()[0]["g"]
        assert out == []

    def test_repetition_profile_values(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a a a b"), Row(doc_id=2, text="x y z w")]
        )
        rows = {r["doc_id"]: r for r in X.repetition_profile(df).collect()}
        # doc 1: "a" is 3/4 tokens; bigrams [a a, a a, a b] -> top 2/3
        assert rows[1]["n_tokens"] == 4
        assert rows[1]["top_token_frac"] == 0.75
        assert abs(rows[1]["top_bigram_frac"] - round(2 / 3, 6)) < 1e-9
        # doc 2: all distinct -> 1/4 and 1/3
        assert rows[2]["top_token_frac"] == 0.25
        assert abs(rows[2]["top_bigram_frac"] - round(1 / 3, 6)) < 1e-9


class TestTfidf:
    def test_rare_term_ranks_first(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="common rare rare"),
                Row(doc_id=2, text="common common common"),
                Row(doc_id=3, text="common unique"),
            ]
        )
        out = X.tfidf_topterms(df, k=2).collect()
        top = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
        # "rare"/"unique" appear in 1 doc (df=1), "common" in 3 (df=4 ratio)
        assert top[1] == "rare"
        assert top[3] == "unique"
        assert top[2] == "common"
        r1 = [r for r in out if r["doc_id"] == 1 and r["rank"] == 1][0]
        # tf=2, N=3, df=1 -> score = 2 * 4/2 = 4.0
        assert r1["tf"] == 2 and r1["df"] == 1 and r1["score"] == 4.0

    def test_k_bounds_and_tiebreak(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="b a b a")])
        out = X.tfidf_topterms(df, k=5).collect()
        # equal scores -> alphabetical order
        assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])] == ["a", "b"]

    def test_log_idf_variant_runs(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="x y"), Row(doc_id=2, text="x")])
        out = X.tfidf_topterms(df, k=1, log_idf=True).collect()
        assert {r["doc_id"] for r in out} == {1, 2}


class TestBigramEntropy:
    def test_uniform_vs_repetitive(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([
            Row(doc_id=1, text="a b c d e f g h"),     # all bigrams unique
            Row(doc_id=2, text="a b a b a b a b a"),   # two bigrams repeated
            Row(doc_id=3, text="word"),                # < 2 tokens
            Row(doc_id=4, text=None),
        ])
        out = {r["doc_id"]: r for r in
               __import__("metadata_driven_data_pipeline_spark.operators.text",
                          fromlist=["text"]).bigram_entropy(df).collect()}
        # 7 unique bigrams → entropy = log2(7)
        import math
        assert out[1]["n_bigrams"] == 7
        assert abs(out[1]["entropy_bits"] - round(math.log2(7), 6)) < 1e-9
        # 'a b' x4 + 'b a' x4 → two equiprobable symbols → 1 bit
        assert out[2]["n_bigrams"] == 8
        assert abs(out[2]["entropy_bits"] - 1.0) < 1e-9
        # degenerate docs: zero grams, NULL entropy
        for d in (3, 4):
            assert out[d]["n_bigrams"] == 0
            assert out[d]["entropy_bits"] is None
        # diversity ordering: unique-bigram doc > repetitive doc
        assert out[1]["entropy_bits"] > out[2]["entropy_bits"]


class TestGopherRules:
    def rules(self, spark, text, **kw):
        df = spark.createDataFrame([Row(doc_id=1, text=text)])
        return X.gopher_rules(df, **kw).collect()[0]

    def test_good_doc_passes_all(self, spark):
        text = " ".join(
            ["the quick brown fox jumps over and that have with lazy dog to of be"] * 5
        )
        r = self.rules(spark, text, min_words=30)
        assert r.rule_word_count and r.rule_mean_word_len
        assert r.rule_symbol_ratio and r.rule_alpha_words and r.rule_stopwords
        assert r.gopher_keep

    def test_short_doc_fails_word_count_only(self, spark):
        r = self.rules(spark, "the cat and that have with be of", min_words=30)
        assert not r.rule_word_count and not r.gopher_keep
        assert r.rule_stopwords  # other rules still evaluated independently

    def test_symbol_spam_fails_symbol_ratio(self, spark):
        text = "the data and that have with " + "# " * 10
        r = self.rules(spark, text, min_words=5)
        assert not r.rule_symbol_ratio and not r.gopher_keep

    def test_numeric_soup_fails_alpha_words(self, spark):
        text = "the 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 and"
        r = self.rules(spark, text, min_words=5)
        assert not r.rule_alpha_words

    def test_no_stopwords_fails_stopword_rule(self, spark):
        text = " ".join(f"tok{i}" for i in range(40))
        r = self.rules(spark, text, min_words=30)
        assert not r.rule_stopwords and not r.gopher_keep

    def test_stopword_rule_needs_distinct_words(self, spark):
        # A1.1: "at least two of" the listed words — repeating one word
        # many times is one distinct hit, not two
        r = self.rules(spark, " ".join(["the"] * 40), min_words=30)
        assert not r.rule_stopwords
        r = self.rules(spark, " ".join(["the"] * 20 + ["of"] * 20), min_words=30)
        assert r.rule_stopwords

    def test_degenerate_long_words_fail_mean_word_len(self, spark):
        text = " ".join(["supercalifragilistic"] * 40) + " the of"
        r = self.rules(spark, text, min_words=30)
        assert not r.rule_mean_word_len


class TestQualityClassifier:
    def test_integer_micro_accumulation_and_threshold(self, spark):
        # weights chosen so 'good' tokens score +1.0 logit, 'bad' -1.0
        # (single-bucket model: every token hashes somewhere in [0, d);
        # use d=1 so the doc logit equals the lone weight)
        df = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta gamma")], "doc_id long, text string"
        )
        up = X.quality_classifier(df, [1.0], threshold=0.5).collect()[0]
        down = X.quality_classifier(df, [-1.0], threshold=0.5).collect()[0]
        assert up.logit == 1.0 and up.keep
        assert down.logit == -1.0 and not down.keep

    def test_bias_shifts_logit(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="x y")], "doc_id long, text string"
        )
        r = X.quality_classifier(df, [0.25], bias=0.5).collect()[0]
        assert r.logit == 0.75 and r.keep

    def test_empty_text_null_logit_not_kept(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="  ")], "doc_id long, text string"
        )
        r = X.quality_classifier(df, [1.0]).collect()[0]
        assert r.logit is None and r.keep is False

    def test_score_partitioning_invariant(self, spark):
        rows = [Row(doc_id=i, text=f"tok{i} tok{i+1} the and of") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        w = [((j * 7919) % 2001 - 1000) / 1000 for j in range(64)]
        a = {r.doc_id: r.logit for r in X.quality_classifier(df, w).collect()}
        b = {
            r.doc_id: r.logit
            for r in X.quality_classifier(df.repartition(13), w).collect()
        }
        assert a == b

    def test_rejects_empty_weights(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a")])
        import pytest as _pt
        with _pt.raises(ValueError):
            X.quality_classifier(df, [])

    def test_xxhash64_lane_same_shape_different_family(self, spark):
        rows = [Row(doc_id=i, text=f"tok{i} the and of data") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        w = [((j * 7919) % 2001 - 1000) / 1000 for j in range(64)]
        a = X.quality_classifier(df, w, hash_fn="md5").collect()
        b = X.quality_classifier(df, w, hash_fn="xxhash64").collect()
        assert len(a) == len(b) == 20
        # both lanes produce finite logits for every doc
        assert all(r.logit is not None for r in a + b)
        import pytest as _pt
        with _pt.raises(ValueError, match="hash_fn"):
            X.quality_classifier(df, w, hash_fn="sha1")


class TestLmCrossEntropy:
    def test_self_perplexity_common_text_scores_lower(self, spark):
        common = "the cat sat on the mat"
        rows = [Row(doc_id=i, text=common) for i in range(10)] + [
            Row(doc_id=99, text="zyx wvu tsr qpo nml kji")
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in X.lm_cross_entropy(df).collect()}
        # the repeated doc's bigrams dominate the corpus LM -> low bits;
        # the singleton's bigrams are rare -> high bits
        assert out[0].cross_entropy_bits < out[99].cross_entropy_bits
        assert out[0].n_oov == 0 and out[99].n_oov == 0

    def test_oov_counted_not_smoothed(self, spark):
        ref = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d")], "doc_id long, text string"
        )
        score = spark.createDataFrame(
            [Row(doc_id=2, text="a b x y")], "doc_id long, text string"
        )
        r = X.lm_cross_entropy(score, lm_df=ref).collect()[0]
        # grams: "a b" (in ref), "b x", "x y" (OOV)
        assert r.n_bigrams == 3 and r.n_oov == 2
        assert r.cross_entropy_bits is not None

    def test_all_oov_null_score(self, spark):
        ref = spark.createDataFrame(
            [Row(doc_id=1, text="p q r")], "doc_id long, text string"
        )
        score = spark.createDataFrame(
            [Row(doc_id=2, text="x y z")], "doc_id long, text string"
        )
        r = X.lm_cross_entropy(score, lm_df=ref).collect()[0]
        assert r.n_oov == r.n_bigrams == 2
        assert r.cross_entropy_bits is None

    def test_short_doc_zero_bigrams(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="word"), Row(doc_id=2, text="two words here")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in X.lm_cross_entropy(df).collect()}
        assert out[1].n_bigrams == 0 and out[1].cross_entropy_bits is None
        assert out[2].n_bigrams == 2


class TestTokenKlDivergence:
    def test_identical_corpora_zero_kl(self, spark):
        rows = [Row(doc_id=i, text="alpha beta gamma delta") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = X.token_kl_divergence(df, df).collect()[0]
        assert r.kl_bits == 0.0
        assert r.p_only_mass == 0.0 and r.q_only_mass == 0.0

    def test_shifted_distribution_positive_kl(self, spark):
        p = spark.createDataFrame(
            [Row(doc_id=1, text="a a a a b")], "doc_id long, text string"
        )
        q = spark.createDataFrame(
            [Row(doc_id=1, text="a b b b b")], "doc_id long, text string"
        )
        r = X.token_kl_divergence(p, q).collect()[0]
        assert r.kl_bits > 0 and r.n_shared == 2

    def test_off_vocabulary_mass_reported(self, spark):
        p = spark.createDataFrame(
            [Row(doc_id=1, text="a b newtoken newtoken")],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [Row(doc_id=1, text="a b oldtoken")], "doc_id long, text string"
        )
        r = X.token_kl_divergence(p, q).collect()[0]
        assert r.p_only_mass == 0.5       # 2 of 4 P tokens unseen in Q
        assert abs(r.q_only_mass - 1 / 3) < 1e-6
        assert r.n_shared == 2


class TestVocabEncode:
    def test_frequency_ranked_ids_and_min_count(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="b b b a a c")], "doc_id long, text string"
        )
        vocab = {r.token: r.token_id for r in X.build_vocab(df, min_count=2).collect()}
        assert vocab == {"b": 1, "a": 2}  # c dropped; ids start at 1 (0=UNK)

    def test_encode_preserves_positions_and_counts_unk(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="b a c b")], "doc_id long, text string"
        )
        vocab = X.build_vocab(df, min_count=2)  # only b kept
        r = X.encode_with_vocab(df, vocab).collect()[0]
        assert r.ids == [1, 0, 0, 1]  # a, c -> UNK at their positions
        assert r.n_tokens == 4 and r.n_unk == 2

    def test_tie_break_alphabetical(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="zeta alpha zeta alpha")],
            "doc_id long, text string",
        )
        vocab = {r.token: r.token_id for r in X.build_vocab(df).collect()}
        assert vocab == {"alpha": 1, "zeta": 2}  # equal counts: token asc


class TestKeywordSearch:
    def test_relevance_ordering(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="spark spark spark engine"),
                Row(doc_id=2, text="spark engine"),
                Row(doc_id=3, text="completely unrelated words here"),
            ],
            "doc_id long, text string",
        )
        out = X.keyword_search(df, ["spark"], k=5).collect()
        ids = [r.doc_id for r in out]
        assert ids[0] == 1          # highest tf first
        assert 3 not in ids          # zero-score docs dropped
        assert [r.rank for r in out] == list(range(1, len(out) + 1))

    def test_rare_term_outweighs_common(self, spark):
        rows = [Row(doc_id=i, text="common filler words") for i in range(20)]
        rows += [Row(doc_id=100, text="common rareterm filler")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = X.keyword_search(df, ["common", "rareterm"], k=3).collect()
        assert out[0].doc_id == 100  # idf boost for the rare term

    def test_empty_query_raises(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a")])
        import pytest as _pt
        with _pt.raises(ValueError):
            X.keyword_search(df, [])


class TestHybridSearch:
    def test_rrf_fuses_both_lists_and_is_deterministic(self, spark, sf_dir):
        from metadata_driven_data_pipeline_spark.operators.text import (
            hybrid_search,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corpus = docs.join(
            emb, docs["doc_id"] == emb["vec_id"]
        ).select(docs["doc_id"], "text", "embedding")
        qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
        out = hybrid_search(corpus, ["key", "spark"], qv, k=10, pool=30)
        rows = out.orderBy("rank").collect()
        assert len(rows) == 10
        # rank 1..10 dense, rrf non-increasing
        assert [r.rank for r in rows] == list(range(1, 11))
        rrfs = [r.rrf for r in rows]
        assert all(rrfs[i] >= rrfs[i + 1] for i in range(9))
        # every fused row sits in at least one source list
        assert all(
            r.bm25_rank is not None or r.cos_rank is not None for r in rows
        )
        # the query's own doc (vec 0 vs itself, cosine 1.0) tops the dense list
        top_dense = [r for r in rows if r.cos_rank == 1]
        assert top_dense and top_dense[0].doc_id == 0
        # determinism across repartition
        out2 = hybrid_search(
            corpus.repartition(7), ["key", "spark"], qv, k=10, pool=30
        )
        assert [tuple(r) for r in out2.orderBy("rank").collect()] == [
            tuple(r) for r in rows
        ]

    def test_doc_in_both_lists_outranks_single_list(self, spark, sf_dir):
        """A doc present in both lists must beat a doc that appears in
        only one list at comparable rank (the point of RRF)."""
        from metadata_driven_data_pipeline_spark.operators.text import (
            hybrid_search,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corpus = docs.join(
            emb, docs["doc_id"] == emb["vec_id"]
        ).select(docs["doc_id"], "text", "embedding")
        qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
        rows = hybrid_search(
            corpus, ["key", "spark", "table"], qv, k=50, pool=50
        ).collect()
        both = [r for r in rows if r.bm25_rank and r.cos_rank]
        only = [r for r in rows if (r.bm25_rank is None) != (r.cos_rank is None)]
        if both and only:
            best_both = min(r.rank for r in both)
            # some doc in both lists should beat the best single-list doc
            assert best_both < max(r.rank for r in only)
