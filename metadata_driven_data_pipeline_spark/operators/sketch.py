"""Count-Min sketch: mergeable frequency estimation for token streams.

Completes the sketch family (MinHash/SimHash for similarity, SQ8/PQ for
vectors) with the standard frequency sketch (Cormode & Muthukrishnan
2005): ``d`` hash rows × ``w`` counters; an item's estimate is the MIN
over its ``d`` counters — always an OVER-estimate, with
``est ≤ true + εN`` where ``ε ≈ e/w`` holds with probability
``1 − e^{−d}``.

Cardinality lives here too: beyond the inline ``approx_count_distinct``
(``approx_stats``), ``hll_shard_sketches``/``hll_merge`` expose the HLL
sketch AS DATA — per-batch binary sketches that persist beside the
manifest and merge across days/sources without rescanning history.

Why it earns a place at 100 TB: exact token counts need a shuffle keyed
by EVERY DISTINCT TOKEN (billions of keys, skewed); the sketch is a
FIXED d×w integer grid that partial-aggregates map-side and merges by
plain addition — the shuffle carries at most d·w rows regardless of
vocabulary size, and sketches from different corpus shards/days merge by
summing counters (the property exact top-k lacks).

Every hash is md5-derived (same ``_hash60`` lane as MinHash), so counter
grids and estimates are bit-reproducible by an ANSI-SQL oracle — the
sketch is CERTIFIED, not just plausible. A ``xxhash64`` production lane
mirrors the MinHash policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.dedup import (
    MERSENNE31,
    _base_hash,
)
from metadata_driven_data_pipeline_spark.operators.text import (
    normalize_text,
    tokens,
)


def _bucket(token: Column, depth: int, width: int, hash_fn: str) -> Column:
    """Row-``depth`` bucket of a token: seed-prefixed base hash mod w."""
    return _base_hash(
        F.concat(F.lit(f"cms{depth}:"), token), hash_fn
    ) % F.lit(width)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "md5",
) -> DataFrame:
    """Build the sketch over the corpus token stream (every occurrence
    counts, not distinct): returns ``(depth, bucket, cnt)`` — at most
    ``d·w`` rows whatever the vocabulary size.

    Scale shape: tokenize → explode → one hash aggregate on (depth,
    bucket); the explode fans out d rows per token but they partial-
    aggregate map-side into the fixed grid before the shuffle, so the
    exchange carries ≤ d·w rows per map partition. Merge sketches from
    other shards by unioning and re-summing (counters are additive).
    """
    toks = df.select(
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("__tok")
    )
    rows = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col("__tok"), d, width, hash_fn).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db")
    ).select("__db.depth", "__db.bucket")
    return rows.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "md5",
) -> DataFrame:
    """Estimated occurrence count per query term: ``min`` over the
    term's ``d`` counters (0 when a counter row is absent — an empty
    bucket was never materialized). Returns ``(term, est)``.

    The query side is a ``d·|terms|``-row lookup table joined against
    the sketch — broadcast-sized both sides; no corpus access at all
    (the point: estimation happens wherever the d×w grid lives).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    spark = cms.sparkSession
    lookup = spark.createDataFrame(
        [(t,) for t in sorted(set(terms))], "term string"
    ).select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col("term"), d, width, hash_fn).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db"),
    ).select("term", "__db.depth", "__db.bucket")
    joined = lookup.join(cms, ["depth", "bucket"], "left").select(
        "term", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("term").agg(F.min("cnt").alias("est"))


def hll_shard_sketches(
    df: DataFrame,
    key_col: str,
    shard_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-shard HLL cardinality sketch: ``(shard, sketch, shard_est)``.

    The incremental-distinct building block: each ingestion batch / day /
    source shard reduces to ONE binary Datasketches HLL (2^lgk registers,
    rel. std err ≈ 1.04/√2^lgk — ~1.6% at lgk=12) that can be persisted
    next to the manifest watermark. Corpus-wide distinct counts then
    merge the stored sketches (register-wise max — associative,
    commutative, idempotent) WITHOUT rescanning history — the property
    plain ``approx_count_distinct`` results lack (two counts don't add:
    shards share keys). Shuffle carries one ~2^lgk-byte row per shard.

    Runs on Spark's built-in ``hll_sketch_agg`` (JVM Datasketches lane,
    map-side partial aggregation; no Python in the hot path).
    """
    return df.groupBy(F.col(shard_col).alias("shard")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def hll_merge(sketches: DataFrame) -> DataFrame:
    """Union stored shard sketches into one estimate row ``(est)``.

    ``hll_union_agg`` is register-wise max, so re-merging overlapping or
    replayed shards never double-counts (idempotent) — safe under the
    at-least-once reprocessing the manifest allows.
    """
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(True))
        ).alias("est")
    )
