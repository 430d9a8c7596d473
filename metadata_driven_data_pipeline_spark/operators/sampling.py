"""Deterministic sampling / splitting operators for training-data curation.

Not in the reference (no sampling of any kind); extension surface for the
100 TB training-data pipeline: corpus subsampling, per-class (stratified)
rebalancing, and train/validation/test splitting.

Everything is **hash-based and deterministic** — membership depends only on
the row's key, never on an RNG or on partitioning — so:
- results are reproducible run-to-run and engine-to-engine (an ANSI-SQL
  oracle computes the identical sample from the same md5 formula);
- the sample is stable under repartitioning, retries, and incremental
  reprocessing (a document keeps its split assignment forever — the property
  that prevents train/test contamination when a corpus is re-ingested);
- no shuffle is needed: each op is a pure projection/filter, executed
  map-side at any scale.

The hash is the engine-wide ``_hash60`` (md5-derived 60-bit int, see
operators/dedup.py) taken mod 1,000,000 for a uniform [0, 1e6) draw per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.dedup import _hash60

_BUCKETS = 1_000_000


def hash_draw(key: Column, salt: str = "") -> Column:
    """Uniform deterministic draw in [0, 1e6) from a key column.

    ``salt`` decorrelates independent sampling decisions over the same key
    (e.g. a 10% subsample and a train/test split must not interact).
    """
    return _hash60(F.concat(F.lit(salt + ":"), key.cast("string"))) % F.lit(_BUCKETS)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (pure filter, no
    shuffle, no RNG). Unlike ``df.sample``, membership is a function of the
    key alone — stable across runs, partitionings, and engines."""
    threshold = int(round(fraction * _BUCKETS))
    return df.filter(hash_draw(F.col(key_col), salt) < F.lit(threshold))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the RNG):
    keep ~``fractions[stratum]`` of each stratum's rows, keyed by row hash.

    The scale path for class rebalancing at 100 TB: a single map-side
    filter — no shuffle, no collect of strata, no seed coordination across
    executors."""
    threshold = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(stratum_col).cast("string") == value,
            F.lit(int(round(frac * _BUCKETS))),
        ).otherwise(threshold)
    return df.filter(hash_draw(F.col(key_col), salt) < threshold)


def domain_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Rebalance a corpus to a target domain mixture with maximal
    retention — the pre-training data-mixing pass (e.g. "40% web, 30%
    code, 30% books" over a crawl whose natural proportions differ).

    Given target weights ``{domain: w}`` (need not sum to 1; they are
    normalized by use), the binding domain is the one with the smallest
    ``n_i / w_i`` — it is kept in full, and every other domain is
    down-sampled deterministically to ``w_i * scale / n_i`` where
    ``scale = min_i(n_i / w_i)``, so the *expected* output proportions
    equal the target weights and no domain is over-drawn. Non-binding
    domains are thinned by independent per-row hash draws, so realized
    proportions match only within hash-draw noise (≈ ±1/√(w_i·scale) per
    domain) — callers needing exact mixture counts should follow with a
    per-domain top-k on the draw value instead. Domains absent from
    ``weights`` are dropped. Membership is a pure function of the row key
    (same md5 draw as :func:`hash_sample`): stable under repartitioning,
    retries, and incremental re-ingestion.

    Scale shape: one map-side-combinable count per domain (k rows), a
    broadcast join of the k-row fraction table back onto the corpus, and a
    map-side filter — no full shuffle of the data. The k-row aggregate is
    the only global coordination, exactly like the k-centroid collect in
    clustering.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive values")
    w_expr2 = F.lit(None).cast("double")
    for value, w in sorted(weights.items()):
        w_expr2 = F.when(
            F.col("__dom").cast("string") == value, F.lit(float(w))
        ).otherwise(w_expr2)
    counts = (
        df.groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count("*").alias("__n"))
        .withColumn("__w", w_expr2)
        .filter(F.col("__w").isNotNull())
    )
    scale = counts.agg(
        F.min(F.col("__n") / F.col("__w")).alias("__scale")
    )
    fracs = counts.crossJoin(F.broadcast(scale)).select(
        "__dom",
        F.least(
            F.lit(1.0), F.col("__w") * F.col("__scale") / F.col("__n")
        ).alias("__frac"),
    )
    thresh = F.floor(F.col("__frac") * _BUCKETS + F.lit(0.5)).cast("bigint")
    return (
        df.join(
            F.broadcast(fracs),
            df[domain_col].cast("string") == F.col("__dom").cast("string"),
        )
        .filter(hash_draw(F.col(key_col), salt) < thresh)
        .drop("__dom", "__frac")
    )


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    validation_fraction: float = 0.0,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a stable 'train' / 'validation' / 'test' label by key
    hash. A key's assignment never changes as the corpus grows — new batches
    land in the same split, so incremental ingestion cannot leak test
    documents into training."""
    draw = hash_draw(F.col(key_col), salt)
    test_hi = int(round(test_fraction * _BUCKETS))
    val_hi = test_hi + int(round(validation_fraction * _BUCKETS))
    label = (
        F.when(draw < F.lit(test_hi), F.lit("test"))
        .when(draw < F.lit(val_hi), F.lit("validation"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, label)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    salt: str = "grp",
) -> DataFrame:
    """EXACTLY ``min(k, |group|)`` rows per group, chosen by ranking the
    deterministic hash draw within each group — the distributed
    equivalent of per-group reservoir sampling, without randomness:
    stable under repartitioning, retries, and re-runs, and adding rows to
    a group only displaces the highest-draw members (low churn between
    corpus snapshots).

    Unlike :func:`stratified_hash_sample` (per-row Bernoulli by fraction,
    exact only in expectation), this gives exact per-group COUNTS — the
    contract eval-set construction needs ("200 examples per language").

    Scale shape: one window over (group, draw) — a single hash shuffle
    keyed by the group; with Spark >= 3.5 the ``rn <= k`` filter plants a
    partial WindowGroupLimit, so each map partition forwards at most k
    rows per group before the shuffle (skew-immune like keep-latest,
    BASELINE.md round-4 skew probe).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(group_col).orderBy(
        hash_draw(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int = 0,
    order_col: str = "position",
) -> DataFrame:
    """Deterministic global shuffle for a training epoch: every row gets
    a dense ``order_col`` position obtained by sorting on the epoch-salted
    hash draw (ties by key). Different ``epoch`` values produce
    independent permutations; the same epoch always produces the SAME
    permutation — reproducible data order, the property RNG-based
    ``orderBy(rand())`` loses across retries/partitioning.

    Scale shape: one range exchange + sort (what any total order costs);
    the row_number window over the global order compiles to a single
    partition-chained window — at 100 TB assign positions per shard
    instead (sort by draw, then ``zipWithIndex``-style offsets), or
    consume the sorted output directly without materialized positions.
    """
    draw = hash_draw(F.col(key_col), f"epoch{epoch}")
    w = Window.orderBy(draw.asc(), F.col(key_col).asc())
    return df.withColumn(order_col, F.row_number().over(w))


def token_budget_sample(
    df: DataFrame,
    budgets: int | dict[str, int],
    domain_col: str = "source",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Fill a per-domain TOKEN budget (not a document count): within each
    domain, documents are taken in deterministic hash-draw order until
    the budget is reached — the mixture-building step of a training-data
    pipeline, where "sample 3B tokens of web + 1B of code" is the actual
    contract and document counts are the wrong unit.

    Greedy-fill semantics: a doc is kept while the running token total
    BEFORE it is under the domain's budget, so the crossing document is
    included (total may overshoot by at most one document) and a
    too-large budget degrades to "keep everything". ``budgets`` is one
    int for every domain or a per-domain dict (missing domains get 0 —
    excluded). Deterministic: same inputs + salt ⇒ the same sample,
    independent of partitioning (same md5-draw lane as
    :func:`hash_sample`; ties broken by key).

    Scale shape: one hash shuffle on ``domain_col`` + a per-domain sort
    for the running-sum window — the same cost class as any grouped
    ranking; no driver-side rows (the budget table broadcasts).
    """
    draw = hash_draw(F.col(key_col), salt)
    if isinstance(budgets, dict):
        spark = df.sparkSession
        btab = spark.createDataFrame(
            [(str(k), int(v)) for k, v in sorted(budgets.items())],
            f"{domain_col} string, __budget bigint",
        )
        src = df.join(F.broadcast(btab), domain_col, "inner")
    else:
        src = df.withColumn("__budget", F.lit(int(budgets)))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(draw.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    before = cum - F.col(token_col)
    return (
        src.withColumn("__before", before)
        .filter(F.col("__before") < F.col("__budget"))
        .drop("__budget", "__before")
    )
