"""Property-based validation tests (SURVEY §5 rebuild plan item c): random
rule subsets × random row values, checked against an independent pure-Python
model of the reference semantics (pipeline/validator.py):

- every failed rule is collected (no short-circuit);
- fieldMissing preempts all other rules for a missing column;
- parameterized rules pass NULL values (only notNull catches them);
- exact error-tag strings ('regex: <pat>', 'minValue: <min>');
- conservation: every row lands in exactly one of OK/KO.
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metadata_driven_data_pipeline_spark.operators.validate import split_ok_ko

PATTERNS = ["^[A-Z]+$", "^[0-9]{3}$"]

text_vals = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.sampled_from(["ABC", "abc", "123", "A1-b2", "ZZZ", " x "]),
)
int_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=100))

str_rules = st.lists(
    st.sampled_from(
        ["notNull", "notEmpty"]
        + [{"name": "regex", "params": p} for p in PATTERNS]
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda r: str(r),
)
int_rules = st.lists(
    st.one_of(
        st.just("notNull"),
        st.builds(lambda m: {"name": "minValue", "params": m}, st.integers(0, 50)),
        st.builds(lambda m: {"name": "maxValue", "params": m}, st.integers(0, 50)),
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda r: str(r),
)


def model_field_errors(value, rules, present):
    """Pure-Python mirror of the rule semantics."""
    if not present:
        return ["fieldMissing"]
    errs = []
    for rule in rules:
        name = rule["name"] if isinstance(rule, dict) else rule
        params = rule.get("params") if isinstance(rule, dict) else None
        if name == "notNull":
            if value is None:
                errs.append("notNull")
        elif name == "notEmpty":
            if value is not None and str(value).strip() == "":
                errs.append("notEmpty")
        elif name == "regex":
            if value is not None and not re.search(params, str(value)):
                errs.append(f"regex: {params}")
        elif name == "minValue":
            if value is not None and float(value) < float(params):
                errs.append(f"minValue: {params}")
        elif name == "maxValue":
            if value is not None and float(value) > float(params):
                errs.append(f"maxValue: {params}")
    return errs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(text_vals, int_vals), min_size=1, max_size=8
    ),
    plate_rules=str_rules,
    age_rules=int_rules,
    drop_age_col=st.booleans(),
)
def test_split_matches_model(spark, rows, plate_rules, age_rules, drop_age_col):
    validations = [
        {"field": "plate", "rules": plate_rules},
        {"field": "age", "rules": age_rules},
    ]
    data = [(i, p, a) for i, (p, a) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, plate string, age long")
    if drop_age_col:
        df = df.drop("age")

    res = split_ok_ko(df, validations, cache=False)
    ok_ids = {r["rid"] for r in res.ok.collect()}
    ko = {r["rid"]: r["validation_errors"] for r in res.ko.collect()}

    for rid, plate, age in data:
        expected = {}
        e_plate = model_field_errors(plate, plate_rules, True)
        if e_plate:
            expected["plate"] = e_plate
        e_age = model_field_errors(age, age_rules, not drop_age_col)
        if e_age:
            expected["age"] = e_age

        if expected:
            assert rid in ko and rid not in ok_ids, f"row {rid} should be KO"
            got = {k: list(v) for k, v in ko[rid].items()}
            assert got == expected, f"row {rid}: {got} != {expected}"
        else:
            assert rid in ok_ids and rid not in ko, f"row {rid} should be OK"

    # conservation is implied by the above, but assert it directly too
    assert len(ok_ids) + len(ko) == len(data)
