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
