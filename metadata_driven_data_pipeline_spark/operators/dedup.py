"""Deduplication operators: exact + fuzzy, designed for 100 TB corpora.

Not in the reference (its only dedup is the keep-latest window W1,
``pipeline/consolidator.py:30-43``); this module is the LLM-data-pipeline
extension surface. Five strategies, each with a different scale/recall
trade-off:

- **exact**: hash-groupBy on normalized content. One shuffle on the
  fingerprint; at 100 TB shuffle only (fingerprint, id) pairs — never the
  text — then semi-join survivors back.
- **MinHash + LSH**: shingle → k independent min-hashes → band into b
  buckets → candidate pairs are rows sharing a (band, band-hash) bucket →
  verify with true Jaccard. Avoids the O(n²) cross join: the only shuffles
  are the explode-by-band groupBys. Two base-hash lanes (``hash_fn``):
  md5-derived ints a SQL oracle (duckdb) reproduces exactly (default), or
  codegen'd ``xxhash64`` for production throughput (see ``_base_hash``).
- **SimHash**: 64-bit sign-sum sketch of token hashes; near-dups differ in
  few bits. Bucketed by the 16-bit prefix for candidate generation.
- **n-gram Jaccard**: exact Jaccard over word shingles via explode +
  self-join on shingle — quadratic in bucket size, use for verification or
  small corpora.
- **embedding cosine**: near-dup = cosine(embedding_a, embedding_b) ≥ τ;
  brute-force for verification, LSH/IVF bucketing (similarity.py) at scale.

All built from built-in functions (JVM codegen); no Python UDFs.

Caching contract: operators that feed one projection into both sides of a
self-join (``jaccard_verify_pairs``, ``minhash_dedup``,
``split_contamination``, ``containment_pairs``) persist that intermediate
and deliberately do NOT unpersist it before returning — the returned
DataFrame still reads the cached blocks lazily, so unpersisting here would
silently re-run the dominant hashing work at materialization. Every such
persist is recorded in a module-level registry: once a caller has
materialized the result (count/collect/write), reclaim the memory with
:func:`release_persisted` (unpersists and clears the registry) or inspect
:func:`persisted_handles` to manage individual handles. The engine's
``run_dataflow`` clears transform caches the same way after sink writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.partitioning import widen
from metadata_driven_data_pipeline_spark.operators.text import (
    fingerprint_md5,
    normalize_text,
    tokens,
)


# --- persist-handle registry -------------------------------------------------

_PERSISTED: list[DataFrame] = []


def _track_persist(df: DataFrame) -> DataFrame:
    """Record a DataFrame this module persisted so callers can release it."""
    _PERSISTED.append(df)
    return df


def persisted_handles() -> list[DataFrame]:
    """DataFrames persisted by this module's operators, oldest first.
    Each is safe to ``unpersist()`` once downstream results are
    materialized; prefer :func:`release_persisted` to drop them all."""
    return list(_PERSISTED)


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every intermediate this module cached and clear the
    registry; returns how many handles were released. Call after the
    operator output has been materialized (count/collect/write) — the
    lazily-returned DataFrames will otherwise recompute the cached stage
    on their next action."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=blocking)
        n += 1
    return n


# --- exact ------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep the lowest-id row per distinct (normalized) content.

    Plan: fingerprint projection → window min over fingerprint → filter.
    At 100 TB prefer the fingerprint+min_by aggregation then semi-join to
    avoid carrying text through the shuffle; for parity/simplicity the
    window form is equivalent on Catalyst (single hash shuffle).
    """
    key = F.md5(normalize_text(F.col(text_col))) if normalize else F.md5(F.col(text_col))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# --- shingles + minhash ------------------------------------------------------

def _norm_sql(col: str) -> str:
    """SQL text of :func:`normalize_text` over a named column."""
    return f"regexp_replace(trim(lower({col})), '\\\\s+', ' ')"


def _tokens_sql(col: str) -> str:
    """SQL text of :func:`tokens` over an arbitrary string expression."""
    return (
        f"CASE WHEN trim({col}) = '' THEN CAST(array() AS array<string>) "
        f"ELSE split(trim({col}), '\\\\s+') END"
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (shorter docs yield the
    whole doc as one shingle so they still participate).

    Pass the column NAME (str) in hot paths: the tree then parses as ONE
    SQL expression instead of dozens of py4j round trips (r11 — plan
    CONSTRUCTION was a measured driver cost across the minhash family;
    the parsed tree duplicates the token subtree exactly like the
    Column form does, so plans and results are identical)."""
    if isinstance(text, str):
        t = _tokens_sql(_norm_sql(text))
        return F.expr(
            f"array_distinct(CASE WHEN size({t}) >= {n} THEN "
            f"transform(sequence(0, size({t}) - {n}), "
            f"i -> concat_ws(' ', slice({t}, i + 1, {n}))) "
            f"ELSE array(concat_ws(' ', {t})) END)"
        )
    toks = tokens(normalize_text(text))
    cnt = F.size(toks)
    raw = F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(0), cnt - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(raw)


def _hash60(s: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 (first 15 hex chars).
    Chosen because duckdb reproduces it exactly:
    ('0x'||substr(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


MERSENNE31 = 2147483647  # 2^31 - 1, the universal-hash modulus


def _base_hash(s: Column, hash_fn: str) -> Column:
    """31-bit base hash per shingle under the chosen lane.

    - ``"md5"`` (default): hex-md5 → 60-bit int → mod 2^31-1. An ANSI-SQL
      oracle (DuckDB) reproduces it exactly — the CORRECTNESS lane.
    - ``"xxhash64"``: Spark's codegen'd 64-bit xxHash, no hex round-trip —
      measured materially faster per shingle (BASELINE.md round 3); the
      recommended 100 TB PRODUCTION lane when no cross-engine oracle needs
      to replay the hashes. Same quality (uniform 31-bit keys), different
      (engine-internal) hash family, so dedup DECISIONS match in
      distribution, not bit-for-bit.
    """
    if hash_fn == "md5":
        return _hash60(s) % F.lit(MERSENNE31)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(s), F.lit(MERSENNE31))
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")


def _perm_consts(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for the i-th linear permutation
    h_i(x) = (a*x + b) mod 2^31-1.  Fixed arithmetic (Knuth multiplier),
    so any ANSI-SQL oracle reproduces the family from the same formula."""
    a = (i * 2654435761 + 40503) % MERSENNE31 or 1
    b = (i * 97 + 17) % MERSENNE31
    return a, b


def _base_hash_sql(var: str, hash_fn: str) -> str:
    """SQL text of :func:`_base_hash` over a lambda variable/column."""
    if hash_fn == "md5":
        return (
            f"CAST(conv(substring(md5({var}), 1, 15), 16, 10) AS BIGINT) "
            f"% {MERSENNE31}"
        )
    if hash_fn == "xxhash64":
        return f"pmod(xxhash64({var}), {MERSENNE31})"
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")


def shingle_hashes(shingles: Column | str, hash_fn: str = "md5") -> Column:
    """One 31-bit base hash per shingle (a SINGLE hash pass over the doc).
    All k min-hashes are derived from this array by cheap linear
    permutations — the classic universal-hashing MinHash construction —
    instead of k independent hash passes (~k× less hashing work).

    ``hash_fn``: ``"md5"`` (oracle-reproducible default) or ``"xxhash64"``
    (codegen'd production lane) — see :func:`_base_hash`.

    31-bit range keeps a*x+b < 2^62, overflow-free in 64-bit SQL ints.
    Accepts a column NAME (str) for the one-parse construction lane
    (same tree, see :func:`word_shingles`)."""
    if isinstance(shingles, str):
        return F.expr(
            f"transform({shingles}, s -> {_base_hash_sql('s', hash_fn)})"
        )
    return F.transform(shingles, lambda s: _base_hash(s, hash_fn))


def minhash_from_hashes(hashes: Column | str, num_hashes: int = 16) -> Column:
    """k min-hashes over a *materialized* base-hash array column
    (:func:`shingle_hashes`): min_s (a_i * h(s) + b_i) mod 2^31-1.

    Pass a column reference, not the ``shingle_hashes`` expression — the k
    ``array_min`` terms each embed their input, and Catalyst does not
    common-subexpression-eliminate inside higher-order functions, so an
    inlined hash expression would tokenize+md5 the document k times.
    A column NAME (str) uses the one-parse construction lane (same tree,
    see :func:`word_shingles`).
    """
    if isinstance(hashes, str):
        mins_sql = ", ".join(
            f"array_min(transform({hashes}, "
            f"x -> ({a} * x + {b}) % {MERSENNE31}))"
            for a, b in (_perm_consts(i) for i in range(num_hashes))
        )
        return F.expr(f"array({mins_sql})")

    # closure factory, NOT a default-arg lambda: F.transform treats a 2-arg
    # lambda as (element, index)
    def perm(i: int):
        a, b = _perm_consts(i)

        def fn(x: Column) -> Column:
            return (F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE31)

        return fn

    mins = [F.array_min(F.transform(hashes, perm(i))) for i in range(num_hashes)]
    return F.array(*mins)


def minhash_from_shingles(
    shingles: Column, num_hashes: int = 16, hash_fn: str = "md5"
) -> Column:
    """Single-expression form over a materialized shingle array. Convenient,
    but the k terms each embed the base-hash pass (no CSE inside
    higher-order functions) — hot paths should project
    :func:`shingle_hashes` into its own column and call
    :func:`minhash_from_hashes`."""
    return minhash_from_hashes(shingle_hashes(shingles, hash_fn), num_hashes)


def minhash_signature(
    text: Column, num_hashes: int = 16, hash_fn: str = "md5"
) -> Column:
    """Fully-inlined form (shingling + hashing inlined per hash — ad-hoc
    use only; see :func:`minhash_from_hashes` for the hot-path shape)."""
    return minhash_from_shingles(word_shingles(text), num_hashes, hash_fn)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    rows per band-bucket are joined (within-bucket pairs only) — the
    anti-quadratic step. Output: (id_a, id_b) with id_a < id_b, distinct.

    Scale: signatures are tiny (k longs); the explode produces b rows per
    doc; the groupBy/self-join shuffles only (bucket_key, id). Skewed
    buckets (boilerplate docs) can be capped with a count filter before the
    pair expansion.
    """
    rows_per_band = num_hashes // bands
    base = widen(df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text")))
    # staged projections so the shingle array and then the base-hash array
    # each materialize once per row (multi-use non-cheap alias → Catalyst
    # keeps the projection boundary)
    sig = (
        base.select("__id", word_shingles("__text").alias("__shingles"))
        .select(
            "__id", shingle_hashes("__shingles", hash_fn).alias("__hashes")
        )
        .select(
            "__id",
            minhash_from_hashes("__hashes", num_hashes).alias("__sig"),
        )
    )
    # banded explode as one parsed expression (same construction lane as
    # the signature chain — identical tree to the F.struct/F.lit form)
    band_structs = ", ".join(
        "struct({b} AS band, concat_ws(',', {parts}) AS bucket)".format(
            b=b,
            parts=", ".join(
                f"CAST(__sig[{b * rows_per_band + r}] AS STRING)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    banded = sig.select(
        "__id",
        F.expr(f"explode(array({band_structs}))").alias("bb"),
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # hint("merge"): a broadcast self-join would build the (expensive)
    # signature plan twice — once per side; SMJ makes both sides identical
    # shuffles on (band, bucket) so ReuseExchange computes signatures ONCE.
    left = banded.alias("l").hint("merge")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Plan: explode distinct shingles → self-equi-join on shingle → count
    common per pair → Jaccard = common / (|A| + |B| - common). The explode
    join is the scalable exact method when shingle frequency is bounded;
    pair with LSH candidates at 100 TB (join candidates first, then verify).
    """
    ex = (
        widen(df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text")))
        .select("__id", word_shingles("__text", n).alias("__sh"))
        .select(
            "__id",
            F.size("__sh").alias("__n_shingles"),
            F.explode("__sh").alias("__shingle"),
        )
    )
    # SMJ self-join: one shared shuffle on __shingle (see minhash hint note)
    a, b = ex.alias("a").hint("merge"), ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.__shingle") == F.col("b.__shingle"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__n_shingles").alias("na"),
            F.col("b.__n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    shingle_hash: str | None = None,
) -> DataFrame:
    """Exact Jaccard for a *given* candidate-pair set: join each side's
    shingle array onto the pair and intersect the two arrays directly.

    Linear in |pairs| (vs the explode self-join of
    :func:`ngram_jaccard_pairs`, which is quadratic in shingle document
    frequency — a boilerplate 3-gram shared by f docs costs f² join rows
    there, but nothing here). This is the verification half of the
    LSH-then-verify pattern at 100 TB: |pairs| ≪ n², and each pair carries
    only two shingle arrays through one shuffle.

    ``shingle_hash``: ``None`` (default) carries the shingle TEXT arrays
    — the oracle lane, every intersected value visible to an ANSI-SQL
    replay. ``"xxhash64"`` maps each shingle to a codegen'd 64-bit hash
    before the pair join: `array_intersect` then compares longs instead
    of strings and the shuffled bytes per doc drop from Σ|shingle text|
    to 8·|shingles| — the production lane for the 100 TB verify stage
    (same Jaccard up to 2⁻⁶⁴ collisions; measured speedup in BASELINE.md
    round 4). Same lane policy as ``minhash``'s ``hash_fn``."""
    # Shingle only docs that occur in a pair (semi-join first): the
    # candidate set is tiny relative to the corpus, and this projection is
    # consumed twice (a/b sides of the pair join), so it is persisted —
    # shingle arrays for |paired docs| rows only, cheap at any scale, and
    # computing them twice would double the dominant per-doc hashing cost.
    from pyspark import StorageLevel

    if shingle_hash not in (None, "xxhash64"):
        raise ValueError(
            f"unknown shingle_hash {shingle_hash!r}; use None or 'xxhash64'"
        )
    sh_expr = word_shingles(text_col, n)
    if shingle_hash == "xxhash64":
        # distinct text shingles -> distinct hashes w.h.p.; Jaccard over
        # the hashed sets equals Jaccard over the text sets up to 2^-64
        sh_expr = F.transform(sh_expr, lambda s: F.xxhash64(s))
    in_pairs = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = _track_persist(
        df.join(in_pairs, id_col, "left_semi")
        .select(F.col(id_col), sh_expr.alias("__sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    common = F.size(F.array_intersect("__sh_a", "__sh_b"))
    return (
        joined.withColumn(
            "jaccard",
            F.round(
                common
                / (F.size("__sh_a") + F.size("__sh_b") - common),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _exact_collapse(
    df: DataFrame, text_col: str, id_col: str, hash_fn: str
):
    """Shared exact-collapse plan: returns (fps, rep_ids, non_reps) where
    ``fps`` = persisted (id, __fp) projection, ``rep_ids`` = the min-id
    member per distinct content, ``non_reps`` = everyone else.

    Deliberately shuffles ONLY (fingerprint, id) pairs — the min-per-fp
    aggregate partial-combines map-side, so the exchange is tiny and the
    corpus TEXT never moves (the earlier window-over-full-rows form paid
    a text shuffle + full-row persist, which on low-dup corpora cost more
    than the collapse saved)."""
    from pyspark import StorageLevel

    fp = (
        F.md5(normalize_text(F.col(text_col)))
        if hash_fn == "md5"
        else F.xxhash64(normalize_text(F.col(text_col)))
    )
    fps = _track_persist(
        widen(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), fp.alias("__fp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reps = fps.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
    rep_ids = reps.select(F.col("__rep").alias(id_col))
    non_reps = (
        fps.join(reps, "__fp")
        .filter(F.col(id_col) != F.col("__rep"))
        .select(id_col, "__rep")
    )
    return fps, rep_ids, non_reps


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    hash_fn: str = "md5",
    collapse_exact: bool = True,
) -> DataFrame:
    """Full fuzzy-dedup: LSH candidates → exact Jaccard verify
    (:func:`jaccard_verify_pairs` — per-pair array intersection, linear in
    the candidate count) → drop the higher id of every confirmed pair
    (union-find-free greedy survivor rule: a doc survives unless it pairs
    with a lower id).

    ``collapse_exact`` (default on) runs the sketch pipeline over one
    REPRESENTATIVE per distinct normalized content (the min-id member)
    instead of every copy — the standard exact-then-fuzzy composition.
    Provably identical output: identical docs share signatures, so LSH
    buckets every within-group pair and Jaccard-1 verifies them, dropping
    all-but-lowest exactly as the collapse does; and a doc x is dropped by
    a near-dup group G iff min(G) < x, because every member of G shares
    the rep's shingle set and the rep IS min(G). What changes is COST:
    pair work is quadratic in duplicate multiplicity without the
    collapse (m identical copies ⇒ m² candidate pairs — the dominant
    term on real crawls and on the adversarial 20× probe), and linear
    with it (measured in BASELINE.md round 4: 39.9 s → 7.8 s at 100k
    docs). Crossover note: on a corpus with NO exact dups the collapse
    is a measured ~0.7 s fixed overhead (fingerprint pass + rep
    semi-join), so below a few thousand unique docs the uncollapsed
    plan is marginally faster — the same documented trade as the
    candidates→verify default in ``embedding_neardup``.

    The candidate-pair set is persisted: it feeds both the verify join and
    (via the losers) the final anti join, and each occurrence would
    otherwise re-run the whole shingle→minhash→band→join pipeline — the
    dominant cost. Pairs are two longs per row (vs the corpus's text), so
    MEMORY_AND_DISK is cheap at any scale."""
    from pyspark import StorageLevel

    fuzzy_input = df
    non_reps = None
    if collapse_exact:
        fps, rep_ids, non_reps = _exact_collapse(
            df, text_col, id_col, hash_fn
        )
        # persist the representative rows: they feed the LSH candidate
        # build, the verify-stage shingle projection, AND (via losers)
        # the final anti join — unpersisted, each job re-derives the
        # semi-join and re-reads the corpus (measured 2x on the certified
        # aug-corpus query)
        fuzzy_input = _track_persist(
            df.join(rep_ids, id_col, "left_semi")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    candidates = _track_persist(
        minhash_lsh_candidates(
            fuzzy_input, text_col, id_col, num_hashes, bands, hash_fn
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    verified = jaccard_verify_pairs(
        fuzzy_input, candidates, text_col, id_col,
        threshold=jaccard_threshold,
        # production lane propagates end-to-end: hashed-shingle verify
        # (longs through the pair join) whenever the minhash lane is
        # already xxhash64; md5 keeps the text-shingle oracle verify
        shingle_hash="xxhash64" if hash_fn == "xxhash64" else None,
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    if non_reps is not None:
        losers = losers.union(non_reps.select(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# --- simhash -----------------------------------------------------------------

def token_hashes(text: Column | str) -> Column:
    """60-bit hash per distinct normalized token (SimHash input).
    A column NAME (str) uses the one-parse construction lane (same
    tree, see :func:`word_shingles`)."""
    if isinstance(text, str):
        t = _tokens_sql(_norm_sql(text))
        return F.expr(
            f"transform(array_distinct({t}), s -> "
            "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))"
        )
    return F.transform(F.array_distinct(tokens(normalize_text(text))), _hash60)


def simhash_from_hashes(hashes: Column | str) -> Column:
    """64-bit SimHash from a *materialized* token-hash array column: bit j
    of the sketch is 1 iff more token-hashes have bit j set than not.

    The 60 per-bit counts each reference the hash array, so (as with
    :func:`minhash_from_shingles`) pass a column reference — inlining the
    hashing expression would tokenize+md5 the document 60 times.

    Pass the column NAME (str) in hot paths: the 60 per-bit aggregate
    lambdas then parse as ONE SQL expression instead of ~10k py4j round
    trips of Column construction — measured 2.5 s of pure driver time
    per plan at r11, the dominant cost of ``simhash_pairs`` (guide
    §1.2 step 2: per-task work was already right; the *driver* was the
    hot spot). The parsed tree is the same expression (same aggregate/
    shiftright/CASE shape), so sketches are bit-identical.
    """
    if isinstance(hashes, str):
        col = hashes
        ones = [
            f"aggregate({col}, CAST(0 AS BIGINT), "
            f"(acc, h) -> acc + (shiftright(h, {j}) & CAST(1 AS BIGINT)))"
            for j in range(60)
        ]
        bits = " + ".join(
            f"(CASE WHEN {o} * 2 >= size({col}) "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j, o in enumerate(ones)
        )
        return F.expr(
            f"CASE WHEN size({col}) > 0 THEN ({bits}) "
            "ELSE CAST(0 AS BIGINT) END"
        )
    n = F.size(hashes)

    # Per-bit integer F.aggregate instead of F.size(F.filter(...)): same
    # O(60·n) work but no filtered-array allocation per bit — measured
    # ~2.6× faster at sf0.1, bit-identical output.
    def popcount_bit(j: int):
        def fn(acc: Column, h: Column) -> Column:
            return acc + F.shiftright(h, j).bitwiseAND(F.lit(1).cast("bigint"))

        return fn

    bits = []
    for j in range(60):
        ones = F.aggregate(hashes, F.lit(0).cast("bigint"), popcount_bit(j))
        bits.append(
            F.when(ones * 2 >= n, F.lit(1 << j).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return F.when(n > 0, out).otherwise(F.lit(0).cast("bigint"))


def simhash64(text: Column) -> Column:
    """Single-expression SimHash (hashing inlined per bit — convenient for
    ad-hoc use; hot paths should project :func:`token_hashes` into a column
    and call :func:`simhash_from_hashes`)."""
    return simhash_from_hashes(token_hashes(text))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates: bucket by the high ``prefix_bits`` of the
    simhash, pair within buckets, keep pairs within ``max_hamming`` bits.
    (Prefix bucketing misses pairs differing inside the prefix — standard
    multi-probe trades recall for the O(n²) avoidance; run with rotated
    sketches for full recall.)"""
    sh = (
        widen(df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text")))
        .select("__id", token_hashes("__text").alias("__hashes"))
        .select("__id", simhash_from_hashes("__hashes").alias("__sh"))
    )
    bucketed = sh.withColumn(
        "__bucket", F.shiftright("__sh", 60 - prefix_bits)
    )
    # SMJ self-join: one shared shuffle on __bucket (see minhash hint note)
    a, b = bucketed.alias("a").hint("merge"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            hamming64(F.col("a.__sh"), F.col("b.__sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding near-dup -------------------------------------------------------

def _emb_base(df: DataFrame, emb_col: str, id_col: str) -> DataFrame:
    """(__id, __v: array<double>, __norm) — vectors cast ONCE per row so
    downstream pair predicates multiply doubles directly (O(n) casts, not
    O(pairs)); cast-before-multiply is bit-exact with casting inside the
    lambda, so oracle hashes are unchanged."""
    return widen(df).select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(emb_col), lambda x: x.cast("double")).alias("__v"),
        F.sqrt(
            F.aggregate(
                F.col(emb_col),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("__norm"),
    )


def _pair_cosine() -> Column:
    """round(cos, 6) between the joined ``a``/``b`` aliases of _emb_base."""
    dot = F.aggregate(
        F.zip_with(F.col("a.__v"), F.col("b.__v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(dot / (F.col("a.__norm") * F.col("b.__norm")), 6)


def _verify_all_pairs(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine pairs by brute-force O(n²) self-join — INTERNAL
    verification path only (recall ground truth for tests and the recall
    harness). Production entry point is :func:`embedding_neardup_pairs`,
    which is candidates→verify and |candidates|-linear."""
    a, b = _emb_base(df, emb_col, id_col).alias("a"), _emb_base(
        df, emb_col, id_col
    ).alias("b")
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            _pair_cosine().alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_candidate_pairs(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    bits: int = 14,
    bands: int = 32,
    seed: int = 7,
    multiprobe: int = 1,
) -> DataFrame:
    """Banded random-hyperplane LSH candidate pairs (id_a < id_b, distinct).

    Each row gets ``bands`` independent ``bits``-bit sign signatures (one
    Arrow/numpy GEMM — deterministic seed-derived hyperplanes, no RNG
    state); a pair is a candidate when any band matches within Hamming
    distance ``multiprobe`` (the probe side also enumerates single-bit
    flips, so two rows whose band signatures differ in ≤1 bit still
    collide). For a pair at angle θ with per-bit agreement s = 1 − θ/π,
    P(band hit) = s^bits + bits·(1−s)·s^(bits−1) at multiprobe=1; with the
    default (14, 32) that is ≥ 0.9986 at cosine 0.8 (s ≈ 0.795), ≥
    0.99994 at 0.85, and → 1 rapidly above. Tests assert empirical
    recall = 1.0 vs the exact all-pairs ground truth on the testdata
    corpus at three scale factors.

    Scale shape: one linear Arrow-batched signature projection, explode to
    (band, sig) [probe side ×(1+multiprobe·bits)], one shuffle hash join on
    the bucket key, pair-distinct. No all-pairs product anywhere; expected
    false-positive collisions per random pair = bands·(1+bits)/2^bits
    (~2.9% at defaults; clustered corpora add genuinely-similar pairs on
    top, which is the point), and every candidate is re-verified with the exact
    cosine predicate, so widening the probe only costs candidate volume,
    never precision. At 100 TB, raise ``bits`` so 2^bits tracks corpus
    size (bucket occupancy, not n², bounds the join) and raise ``bands``
    for recall — both linear-cost knobs."""
    from metadata_driven_data_pipeline_spark.operators.similarity import (
        np_band_signatures,
    )

    if dim is None:
        probe = df.select(F.size(F.col(emb_col)).alias("d")).first()
        if probe is None:
            return df.sparkSession.createDataFrame(
                [], f"id_a {df.schema[id_col].dataType.simpleString()}, "
                    f"id_b {df.schema[id_col].dataType.simpleString()}"
            )
        dim = probe["d"]
    base = widen(df).select(
        F.col(id_col).alias("__id"),
        np_band_signatures(emb_col, dim, bits, bands, seed).alias("__sigs"),
    )
    left = base.select(
        "__id", F.posexplode(F.col("__sigs")).alias("__band", "__sig")
    )
    probes = [F.col("__sig")]
    if multiprobe >= 1:
        probes += [
            F.col("__sig").bitwiseXOR(F.lit(1 << i)) for i in range(bits)
        ]
    right = base.select(
        "__id", F.posexplode(F.col("__sigs")).alias("__band", "__sig")
    ).select(
        "__id", "__band", F.explode(F.array(*probes)).alias("__sig")
    )
    a, b = left.alias("a"), right.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__sig") == F.col("b.__sig"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_neardup_pairs(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int | None = None,
    bits: int = 14,
    bands: int = 32,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ ``threshold`` — candidates→verify.

    Candidates from banded random-hyperplane LSH
    (:func:`embedding_candidate_pairs`, |candidates|-linear), verified with
    the exact double-precision cosine predicate — identical arithmetic to
    the all-pairs form, so surviving pairs are bit-identical to
    :func:`_verify_all_pairs` output restricted to the candidate set.

    Recall contract: probabilistic (multiprobe-1 band hit, see
    :func:`embedding_candidate_pairs`) — ≥ 99.86% at cosine 0.8 with
    defaults, → 1 rapidly above;
    tests assert empirical recall = 1.0 against the exact ground truth on
    testdata. At 100 TB, raise ``bands`` (linear cost) to push recall —
    precision is always exact because every candidate is re-verified."""
    cand = embedding_candidate_pairs(
        df, emb_col=emb_col, id_col=id_col, dim=dim, bits=bits, bands=bands,
        seed=seed,
    )
    base = _emb_base(df, emb_col, id_col)
    a = base.withColumnRenamed("__id", "id_a").alias("a")
    b = base.withColumnRenamed("__id", "id_b").alias("b")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", _pair_cosine().alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def split_contamination(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Train/test decontamination report: for every TEST document (per the
    deterministic hash split of ``sampling.train_test_split``), how many of
    its distinct word n-grams also occur in ANY train document.

    Returns ``(id_col, n_shingles, n_contaminated, contamination)`` — one
    row per test doc; ``contamination`` = contaminated/total rounded to 6.
    This is the benchmark-leakage check a training pipeline runs before
    eval: a test doc with high n-gram overlap against the train split is
    compromised.

    Scale shape: explode test+train shingles once (|corpus| × shingles
    rows), distinct the train side (hash agg), LEFT SEMI join test shingles
    against it (the semi join never materializes matches), and two per-doc
    counts. Everything shuffles on the shingle hash or the doc id — no
    pairwise doc×doc work at any point. Shingles are reduced to 60-bit
    md5-derived ints BEFORE the shuffle (8-byte keys instead of ~40-byte
    strings): measured 2.2× faster end-to-end at sf 0.1, and the DuckDB
    oracle applies the identical hash so results stay exact (a collision
    would merge the same pair of shingles in both engines).
    """
    from .sampling import _BUCKETS, hash_draw

    threshold = int(round(test_fraction * _BUCKETS))
    with_split = df.select(
        F.col(id_col),
        (hash_draw(F.col(id_col), salt) < F.lit(threshold)).alias("__is_test"),
        word_shingles(text_col, n).alias("__sh"),
    )
    # NOTE: deliberately NOT persisting `exploded` — the __is_test filter
    # does not depend on the shingle projection, so Catalyst pushes it
    # below the shingling and each branch shingles only its own split
    # (train branch: train docs; test branches: test docs). Persisting the
    # full exploded set was measured 1.5× SLOWER (materializes every
    # string shingle once instead of letting each branch pipeline).
    exploded = with_split.select(
        id_col,
        "__is_test",
        F.explode(F.transform("__sh", lambda s: _hash60(s))).alias("shingle"),
    )
    train_shingles = (
        exploded.filter(~F.col("__is_test")).select("shingle").distinct()
    )
    test_sh = _track_persist(exploded.filter(F.col("__is_test")).persist())
    totals = test_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        test_sh.join(train_shingles, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0))
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


def containment_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact CONTAINMENT for a given candidate-pair set: |A∩B|/|A| and
    |A∩B|/|B| per pair, kept when either direction ≥ ``threshold``.

    Containment is the asymmetric complement to Jaccard: a short document
    fully embedded in a long one (quote, boilerplate wrapper, excerpt) has
    containment ≈ 1 on the short side but low Jaccard (the union is
    dominated by the long doc), so Jaccard-only dedup misses it. Same
    |pairs|-linear plan as :func:`jaccard_verify_pairs` — per-pair array
    intersection over the semi-joined shingle projection, no explode join.
    """
    from pyspark import StorageLevel

    in_pairs = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = _track_persist(
        df.join(in_pairs, id_col, "left_semi")
        .select(F.col(id_col), word_shingles(text_col, n).alias("__sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    common = F.size(F.array_intersect("__sh_a", "__sh_b"))
    out = joined.select(
        "id_a",
        "id_b",
        F.round(common / F.size("__sh_a").cast("double"), 6).alias(
            "containment_a"
        ),
        F.round(common / F.size("__sh_b").cast("double"), 6).alias(
            "containment_b"
        ),
    )
    return out.filter(
        (F.col("containment_a") >= threshold)
        | (F.col("containment_b") >= threshold)
    )


# --- incremental curation ----------------------------------------------------

def incremental_dedup(
    new_df: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    normalize: bool = True,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus fingerprint index —
    the realistic 100 TB ingestion flow: a whole-corpus re-dedup per batch
    is O(corpus) every day, while this is O(batch) + one semi-join probe
    into the (small, fingerprint-only) index.

    Two stages, both exact:
    1. within-batch: keep the lowest-``id_col`` row per fingerprint
       (same rule as :func:`exact_dedup`);
    2. cross-corpus: LEFT ANTI join against ``seen_fingerprints``
       (one ``fp_col`` column) — any doc whose content is already indexed
       is dropped.

    Returns surviving rows of ``new_df`` plus their ``fp_col`` (callers
    append it to the index, keeping the next batch's probe exact).

    Scale shape: one hash shuffle of (fingerprint, id) for the window,
    one anti join — broadcast when the index fits (~16 bytes/doc), SMJ
    otherwise; the index never carries text.
    """
    key = (
        F.md5(normalize_text(F.col(text_col)))
        if normalize
        else F.md5(F.col(text_col))
    )
    w = Window.partitionBy(fp_col).orderBy(F.col(id_col).asc())
    within = (
        new_df.withColumn(fp_col, key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    seen = seen_fingerprints.select(fp_col).distinct()
    return within.join(seen, fp_col, "left_anti")


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc MinHash signature table ``(id_col, sig array<bigint>)`` —
    the persisted FUZZY-dedup index (the sketch-only analog of
    :func:`incremental_dedup`'s fingerprint index): k longs per document,
    never the text, so a 100 TB corpus indexes in ~8k bytes/doc·10⁻³ and
    the index itself is join-able/broadcastable at ingestion time.

    Same staged projection as :func:`minhash_lsh_candidates` (shingles →
    base hashes → k permutation minima, each materialized once per row).
    """
    base = widen(
        df.select(F.col(id_col), F.col(text_col).alias("__text"))
    )
    return (
        base.select(id_col, word_shingles("__text").alias("__shingles"))
        .select(
            id_col, shingle_hashes("__shingles", hash_fn).alias("__hashes")
        )
        .select(
            id_col,
            minhash_from_hashes("__hashes", num_hashes).alias("sig"),
        )
    )


def _banded_sigs(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Explode a signature table to (id, band, bucket) LSH rows."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__bb"),
    ).select(
        id_col,
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )


def incremental_minhash_dedup(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    sig_threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Fuzzy-dedup a NEW batch against a persisted MinHash signature
    index (:func:`minhash_index`) — the ingestion-time near-dup flow:
    whole-corpus re-dedup is O(corpus) per batch, this is O(batch) work
    plus one banded probe into a signatures-only index.

    Stages:
    1. within-batch: full :func:`minhash_dedup` (LSH candidates + EXACT
       Jaccard verify at ``jaccard_threshold`` — the batch's text is hot,
       so exact verification is cheap and precise);
    2. cross-corpus: band the survivors' signatures, equi-join against
       the banded index (same (band, bucket) keys LSH uses), and drop any
       batch doc whose best signature agreement with an indexed doc is
       ≥ ``sig_threshold``. Agreement (fraction of equal minhash
       components) is the standard unbiased Jaccard ESTIMATOR — the index
       carries no text, so the cross-corpus decision is sketch-based by
       design (with k=16, agreement ≥ 0.5 ⇒ est. Jaccard ≥ 0.5; raise
       ``num_hashes`` to tighten the estimator at 8 bytes/doc/hash).

    Returns surviving ``new_df`` rows plus their ``sig`` column — append
    those (id, sig) rows to the index so the next batch's probe sees
    this one (same contract as :func:`incremental_dedup`).

    Scale shape: the within-batch stage shuffles only the batch; the
    probe is a (band, bucket) equi-join — |bands| rows per doc on each
    side, never all-pairs — followed by a per-candidate O(k) agreement
    fold and a max-agg; broadcast the banded batch side when the batch is
    small relative to the index (Catalyst/AQE picks this automatically).
    """
    from pyspark import StorageLevel

    # persisted: the within-batch pipeline (LSH + verify) feeds BOTH the
    # signature build and the final survivor join — unpersisted it would
    # run twice, and it is the dominant per-batch cost
    within = _track_persist(
        minhash_dedup(
            new_df, text_col, id_col, num_hashes, bands,
            jaccard_threshold, hash_fn,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    sigs = _track_persist(minhash_index(
        within, text_col, id_col, num_hashes, hash_fn
    ).persist())
    # normalized index projection, consumed by banding AND the agreement
    # join — persist so a caller-side derived index is not evaluated twice
    idx = _track_persist(
        index.select(F.col(id_col).alias("__idx_id"), "sig")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    batch_banded = _banded_sigs(sigs, id_col, num_hashes, bands)
    index_banded = _banded_sigs(idx, "__idx_id", num_hashes, bands)
    cand = (
        batch_banded.join(index_banded, ["band", "bucket"])
        .select(id_col, "__idx_id")
        .distinct()
    )
    agree = (
        cand.join(sigs, id_col)
        .join(
            idx.select("__idx_id", F.col("sig").alias("__isig")),
            "__idx_id",
        )
        .select(
            id_col,
            (
                F.aggregate(
                    F.zip_with(
                        "sig", "__isig",
                        lambda a, b: (a == b).cast("int"),
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                )
                / F.lit(float(num_hashes))
            ).alias("__agree"),
        )
    )
    dropped = (
        agree.groupBy(id_col)
        .agg(F.max("__agree").alias("__best"))
        .filter(F.col("__best") >= sig_threshold)
        .select(id_col)
    )
    return within.join(dropped, id_col, "left_anti").join(sigs, id_col)


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff by content fingerprint: one row per doc id present in
    either snapshot, with status ``added`` (id only in new), ``removed``
    (id only in old), ``changed`` (both, different normalized content) or
    ``unchanged`` — the audit step between two curation runs (what did
    this pipeline change, and how much?).

    Scale shape: both sides reduce to (id, fingerprint) projections before
    the full-outer join — one shuffle each on ``id_col``, no text moves.
    """
    fp = fingerprint_md5(F.col(text_col))
    o = old_df.select(F.col(id_col), fp.alias("__fp_old"))
    n = new_df.select(F.col(id_col), fp.alias("__fp_new"))
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(id_col, status.alias("status"))


# --- span-granular exact dedup (ExactSubstr-style) ---------------------------

def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 32,
) -> DataFrame:
    """Sub-document exact dedup: drop duplicated ``span_tokens``-token spans,
    keeping only their globally-first occurrence, and reassemble each doc
    from its surviving spans.

    Document-level dedup (``exact_dedup`` / ``minhash_dedup``) misses the
    dominant duplication mode in web corpora: the *same boilerplate span*
    (header, license text, navigation, quoted excerpt) repeated inside
    otherwise-distinct documents. Suffix-array ExactSubstr dedup
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better") removes any repeated ≥k-token substring; a suffix array over
    100 TB is not a Spark-shaped computation, so this operator implements
    the scalable approximation used in MassiveText-style pipelines:
    fixed-width non-overlapping token windows as the dedup granule.

    Semantics (fully deterministic → SQL-oracle-able):
    - tokenize (whitespace), split into ceil(n/k) non-overlapping spans;
      the last span may be short.
    - a span's key is its exact token sequence (joined by single spaces);
      the *winner* for a key is the lexicographically-smallest
      (id, span_idx) that produced it.
    - every non-winner occurrence is dropped; docs are reassembled from
      surviving spans in original order. Docs whose spans all survive are
      returned verbatim (modulo whitespace normalization to single spaces).

    Scale shape: one explode (rows ×ceil(n/k), but each carries only k
    tokens — total data stays ~n), one hash shuffle on the span key for the
    winner agg, one hash shuffle on ``id_col`` for reassembly. Linear in
    corpus size; no self-join, no candidate explosion. At 100 TB, shuffle
    md5(span) instead of the span text to cut shuffle bytes (the key is
    exact either way); kept as text here so the oracle and the operator
    share the same visible key.

    Returns: (id_col, n_spans, n_kept, dedup_text).
    """
    # per-row tokenize/slice dominates — parallelize a single-split
    # input (no-op at scale); both the span explode and the totals leg
    # read the widened projection
    df = widen(df.select(F.col(id_col), F.col(text_col)))
    toks = tokens(F.col(text_col))
    # NULL text → tokens() is NULL and size(NULL) is NULL, which would
    # bypass the <= 0 guard and leak NULL n_spans; coalesce pins every
    # empty/NULL doc to the documented (n_spans=0, n_kept=0, '') row
    n = F.coalesce(F.size(toks), F.lit(0))
    k = span_tokens
    n_spans = F.when(n <= 0, F.lit(0)).otherwise(
        F.ceil(n / F.lit(k)).cast("int")
    )
    spans = df.select(
        F.col(id_col),
        F.posexplode(
            # guard: sequence(0, -1) would generate a DESCENDING [0, -1]
            F.when(n_spans <= 0, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), n_spans - 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
                )
            )
        ).alias("span_idx", "span_text"),
    )
    # winner per span key = lexicographically-smallest (id, span_idx):
    # map-side-combinable min over a struct — no window over the full corpus
    winners = spans.groupBy("span_text").agg(
        F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("__w")
    )
    kept = (
        spans.join(winners, "span_text")
        .filter(
            (F.col("__w")[id_col] == F.col(id_col))
            & (F.col("__w")["span_idx"] == F.col("span_idx"))
        )
        .select(id_col, "span_idx", "span_text")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("span_idx", "span_text"))
                ),
                lambda s: s["span_text"],
            ),
        ).alias("dedup_text"),
    )
    n_total = F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0))
    totals = df.select(
        F.col(id_col),
        F.when(n_total <= 0, F.lit(0))
        .otherwise(F.ceil(n_total / F.lit(k)))
        .cast("int")
        .alias("n_spans"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
    )
