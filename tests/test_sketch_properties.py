"""Property-based tests for the round-4 sketch/layout operators, checked
against independent pure-Python models (same strategy as
test_validate_properties.py):

- Count-Min: estimates never underestimate, and equal exact counts when
  the grid is collision-free for the sampled vocabulary; counters are
  additive across corpus splits.
- Z-order: the Morton key bit-interleave matches a pure-Python model for
  random coordinates; gridding is monotone with endpoint pinning.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import sketch as SK
from metadata_driven_data_pipeline_spark.sinks import layout as L

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=5,
)


def py_morton(xs: list[int], bits: int) -> int:
    key = 0
    for b in range(bits):
        for i, x in enumerate(xs):
            key |= ((x >> b) & 1) << (b * len(xs) + i)
    return key


@given(docs=docs_strategy)
@settings(**SETTINGS)
def test_cms_never_underestimates_any_term(spark, docs):
    df = spark.createDataFrame([Row(text=t) for t in docs])
    exact: dict[str, int] = {}
    for t in docs:
        for w in t.split():
            exact[w] = exact.get(w, 0) + 1
    cms = SK.cms_build(df, depth=4, width=256)
    est = {
        r.term: r.est
        for r in SK.cms_estimate(
            cms, list(exact), depth=4, width=256
        ).collect()
    }
    for w, c in exact.items():
        assert est[w] >= c, (w, est[w], c)


@given(docs=docs_strategy, split=st.integers(min_value=0, max_value=4))
@settings(**SETTINGS)
def test_cms_split_merge_equals_whole(spark, docs, split):
    k = min(split, len(docs))
    a = spark.createDataFrame([Row(text=t) for t in docs[:k]] or [Row(text="")])
    b = spark.createDataFrame([Row(text=t) for t in docs[k:]] or [Row(text="")])
    whole = spark.createDataFrame(
        [Row(text=t) for t in (docs[:k] or [""]) + (docs[k:] or [""])]
    )
    merged = {
        (r.depth, r.bucket): r.cnt
        for r in SK.cms_build(a, width=128)
        .unionByName(SK.cms_build(b, width=128))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    direct = {
        (r.depth, r.bucket): r.cnt
        for r in SK.cms_build(whole, width=128).collect()
    }
    assert merged == direct


coords = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
    ),
    min_size=1,
    max_size=10,
)


@given(pts=coords)
@settings(**SETTINGS)
def test_zorder_key_matches_python_model(spark, pts):
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            L.zorder_key([F.col("x"), F.col("y")], bits=8).alias("z"),
        ).collect()
    }
    for x, y in pts:
        assert out[(x, y)] == py_morton([x, y], 8)


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=2,
        max_size=12, unique=True,
    )
)
@settings(**SETTINGS)
def test_grid_monotone_with_pinned_endpoints(spark, vals):
    mn, mx = min(vals), max(vals)
    df = spark.createDataFrame([Row(v=v) for v in vals])
    rows = (
        df.select(
            "v",
            L.scale_to_grid(F.col("v"), F.lit(mn), F.lit(mx), 6).alias("g"),
        )
        .orderBy("v")
        .collect()
    )
    gs = [r.g for r in rows]
    assert gs == sorted(gs)
    assert gs[0] == 0 and gs[-1] == 63
    assert all(0 <= g <= 63 for g in gs)
