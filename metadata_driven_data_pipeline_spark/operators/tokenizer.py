"""Distributed BPE tokenizer training and encoding.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") trained ON the cluster — the step a
training-data pipeline runs between curation and packing, and the one
the whitespace/`bpe_ish` token counters in ``text.py`` only approximate.

Scale design (what survives 100 TB):

- The corpus collapses to the DISTINCT-WORD frequency table first
  (tokenize → groupBy word → count): all merge iterations run over a
  vocabulary-sized relation, never the corpus — the classic BPE corpus
  compression. 100 TB of text is ~10^8 distinct words, a few GB.
- Each merge round is (1) one pair-count aggregate (explode adjacent
  symbol pairs weighted by word frequency; map-side partial combine),
  (2) ONE ``(pair, count)`` row collected to the driver (argmax with a
  deterministic count-desc, pair-asc tie-break), (3) a pure-JVM
  merge-apply pass (``F.aggregate`` left fold — greedy left-to-right,
  exactly the reference semantics) rewriting each word's symbol array.
- Round state is the words table (persisted; the previous round's is
  unpersisted). Only the k merge rules ever live on the driver.
- ``bpe_encode`` applies the rules to the DISTINCT words of the target
  corpus and joins the encodings back on the word key — per-word work is
  again vocabulary-sized; the corpus-sized side is one linear join.

The trainer is certified against a pure-Python reference implementation
in ``tests/test_tokenizer.py`` (identical merge tables and encodings),
and the encoder's char-conservation contract is oracle-checked by the
driver (``bpe_encode`` in ``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.text import (
    normalize_text,
    tokens,
)

_EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, freq, syms) with syms = chars + end-of-word mark.

    The end-of-word symbol keeps word-final merges distinct from
    word-internal ones (the Sennrich formulation), so "low" and
    "lowest" share the "low" prefix but not the final "w</w>".
    """
    words = df.select(
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(_EOW))
            ).alias("syms"),
        )
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right fold replacing adjacent (left, right) symbol
    pairs with their concatenation — pure JVM (``F.aggregate``), no
    Python in the loop. ``try_element_at`` keeps the empty-accumulator
    probe NULL-safe under ANSI mode."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol pairs weighted by word freq."""
    pairs = words.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(
                        a.alias("left"), b.alias("right")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("freq").alias("cnt")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_freq: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns the
    merge table ``(rank, left, right, merged, pair_count)`` — rank is
    application order. Training stops early when no pair reaches
    ``min_freq``. Deterministic: argmax ties break on (left, right)
    ascending, so two engines (or two cluster sizes) learn the identical
    table.

    The driver sees exactly one row per round (the argmax) plus the k
    merge strings — never corpus or vocabulary data.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    words = _word_freqs(df, text_col).persist()
    words.count()
    rules: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                _pair_counts(words)
                .filter(F.col("cnt") >= min_freq)
                .orderBy(F.col("cnt").desc(), "left", "right")
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right, cnt = top[0].left, top[0].right, top[0].cnt
            rules.append((rank, left, right, left + right, int(cnt)))
            nxt = words.withColumn(
                "syms", _apply_merge(F.col("syms"), left, right)
            ).persist()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document with a learned merge table: returns
    ``(id_col, bpe_tokens array<string>, n_bpe_tokens)``. Tokens carry
    the ``</w>`` end-of-word mark on word-final symbols.

    Rules are applied in rank order to the DISTINCT words of this corpus
    (vocabulary-sized work), then joined back onto the exploded corpus
    and re-assembled in word order — the corpus-sized side does one
    explode, one linear join, one groupBy on the document id.
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        rule_list = [(r.left, r.right) for r in rows]
    else:
        rule_list = list(merges)
    docs = df.select(
        F.col(id_col),
        tokens(normalize_text(F.col(text_col))).alias("__words"),
    )
    exploded = docs.select(
        id_col, F.posexplode("__words").alias("__pos", "word")
    )
    vocab = exploded.select("word").distinct().select(
        "word",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(_EOW))).alias(
            "syms"
        ),
    )
    for left, right in rule_list:
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), left, right)
        )
    encoded = exploded.join(vocab, "word").select(
        id_col, "__pos", F.col("syms")
    )
    grouped = encoded.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "syms"))),
                lambda s: s.syms,
            )
        ).alias("bpe_tokens")
    )
    # empty/NULL-text docs vanish in the explode; restore them with an
    # empty encoding so the operator is total over the corpus
    return (
        docs.select(id_col)
        .join(grouped, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "bpe_tokens", F.array().cast("array<string>")
            ).alias("bpe_tokens"),
        )
        .select(
            id_col,
            "bpe_tokens",
            F.size("bpe_tokens").alias("n_bpe_tokens"),
        )
    )
