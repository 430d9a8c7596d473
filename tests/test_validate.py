"""Validation semantics parity (reference pipeline/validator.py; SURVEY §2.2
P2-P8 + §7.4 risk register): all-failures collection, fieldMissing
preemption, null-passes-parameterized-rules, exact error-tag strings,
OK/KO conservation, KO error-map contract."""

import pytest
from pyspark.sql import Row

from metadata_driven_data_pipeline_spark.operators.validate import (
    annotate_errors,
    split_ok_ko,
)

VALIDATIONS = [
    {
        "field": "plate_number",
        "rules": ["notNull", "notEmpty", {"name": "regex", "params": "^[A-Z0-9-]+$"}],
    },
    {"field": "driver_age", "rules": ["notNull", {"name": "minValue", "params": 18}]},
    {"field": "policy_number", "rules": ["notNull"]},
]


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        Row(policy_number="P1", driver_age=30, plate_number="ABC-123"),  # ok
        Row(policy_number="P2", driver_age=None, plate_number="XYZ-999"),  # notNull age
        Row(policy_number="P3", driver_age=17, plate_number="AAA-111"),  # minValue
        Row(policy_number="P4", driver_age=25, plate_number=""),  # notEmpty (+regex? no: empty fails regex too)
        Row(policy_number="P5", driver_age=25, plate_number="abc-123"),  # regex
        Row(policy_number=None, driver_age=40, plate_number="DDD-444"),  # policy notNull
    ]
    return spark.createDataFrame(rows)


def errors_of(ko_rows, policy):
    for r in ko_rows:
        if r["policy_number"] == policy:
            return r["validation_errors"]
    return None


class TestRules:
    def test_ok_ko_conservation(self, spark, sample):
        res = split_ok_ko(sample, VALIDATIONS, cache=False)
        ok, ko = res.ok.collect(), res.ko.collect()
        assert len(ok) + len(ko) == sample.count()
        assert len(ok) == 1 and ok[0]["policy_number"] == "P1"

    def test_not_null_tag(self, spark, sample):
        ko = split_ok_ko(sample, VALIDATIONS, cache=False).ko.collect()
        assert errors_of(ko, "P2") == {"driver_age": ["notNull"]}

    def test_min_value_tag_format(self, spark, sample):
        """Exact format 'minValue: <min>' (validator.py:53)."""
        ko = split_ok_ko(sample, VALIDATIONS, cache=False).ko.collect()
        assert errors_of(ko, "P3") == {"driver_age": ["minValue: 18"]}

    def test_regex_tag_format(self, spark, sample):
        """Exact format 'regex: <pattern>' (validator.py:45)."""
        ko = split_ok_ko(sample, VALIDATIONS, cache=False).ko.collect()
        assert errors_of(ko, "P5") == {"plate_number": ["regex: ^[A-Z0-9-]+$"]}

    def test_all_failures_collected_not_short_circuit(self, spark, sample):
        """Empty plate fails notEmpty AND regex (both collected, in rule order)."""
        ko = split_ok_ko(sample, VALIDATIONS, cache=False).ko.collect()
        assert errors_of(ko, "P4") == {
            "plate_number": ["notEmpty", "regex: ^[A-Z0-9-]+$"]
        }

    def test_null_passes_parameterized_rules(self, spark):
        """notEmpty/regex/minValue only fire on non-null (validator.py:31-54):
        a null field with only a regex rule produces NO error."""
        df = spark.createDataFrame([Row(f=None)], "f string")
        res = split_ok_ko(df, [{"field": "f", "rules": [{"name": "regex", "params": "^x$"}]}], cache=False)
        assert res.ok.count() == 1 and res.ko.count() == 0

    def test_non_numeric_string_passes_min_value(self, spark):
        """CAST to double yields NULL for non-numeric → rule passes (P7)."""
        df = spark.createDataFrame([Row(f="abc")], "f string")
        res = split_ok_ko(df, [{"field": "f", "rules": [{"name": "minValue", "params": 5}]}], cache=False)
        assert res.ok.count() == 1

    def test_field_missing_preempts_rules(self, spark):
        df = spark.createDataFrame([Row(other=1)])
        validations = [{"field": "absent", "rules": ["notNull", {"name": "minValue", "params": 0}]}]
        ko = split_ok_ko(df, validations, cache=False).ko.collect()
        assert ko[0]["validation_errors"] == {"absent": ["fieldMissing"]}

    def test_zero_rules_yields_typed_null(self, spark):
        df = spark.createDataFrame([Row(f="x")])
        annotated = annotate_errors(df, [{"field": "f", "rules": []}])
        assert dict(annotated.dtypes)["f_error"] == "array<string>"
        assert annotated.collect()[0]["f_error"] is None

    def test_unknown_simple_rule_raises(self, spark):
        df = spark.createDataFrame([Row(f="x")])
        with pytest.raises(ValueError, match="Unsupported validation rule"):
            annotate_errors(df, [{"field": "f", "rules": ["bogus"]}])

    def test_unknown_parameterized_rule_raises(self, spark):
        df = spark.createDataFrame([Row(f="x")])
        with pytest.raises(ValueError, match="Unsupported validation rule"):
            annotate_errors(df, [{"field": "f", "rules": [{"name": "bogus", "params": 1}]}])

    def test_malformed_rule_raises(self, spark):
        df = spark.createDataFrame([Row(f="x")])
        with pytest.raises(ValueError, match="Invalid validation rule"):
            annotate_errors(df, [{"field": "f", "rules": [42]}])


class TestContracts:
    def test_ok_has_no_error_columns(self, spark, sample):
        res = split_ok_ko(sample, VALIDATIONS, cache=False)
        assert res.ok.columns == sample.columns

    def test_ko_error_map_only_failing_fields(self, spark, sample):
        """map_filter drops non-failing fields (validator.py:174-183)."""
        ko = split_ok_ko(sample, VALIDATIONS, cache=False).ko.collect()
        errs = errors_of(ko, "P2")
        assert set(errs.keys()) == {"driver_age"}

    def test_ko_schema_is_map_of_string_to_array(self, spark, sample):
        res = split_ok_ko(sample, VALIDATIONS, cache=False)
        assert dict(res.ko.dtypes)["validation_errors"] == "map<string,array<string>>"

    def test_extension_rules(self, spark):
        df = spark.createDataFrame([Row(f="100"), Row(f="5")])
        res = split_ok_ko(
            df, [{"field": "f", "rules": [{"name": "maxValue", "params": 50}]}], cache=False
        )
        assert res.ko.count() == 1
        res2 = split_ok_ko(
            df, [{"field": "f", "rules": [{"name": "isIn", "params": ["5"]}]}], cache=False
        )
        assert res2.ko.count() == 1


def test_empty_validations_passes_all_rows_through(spark, sample):
    """An empty rules list is legal metadata: every row is OK and the KO
    frame is empty but keeps the contract schema (validation_errors map)."""
    res = split_ok_ko(sample, [])
    assert res.ok.count() == sample.count()
    assert res.ko.count() == 0
    assert "validation_errors" in res.ko.columns
    assert dict(res.ko.dtypes)["validation_errors"] == "map<string,array<string>>"
