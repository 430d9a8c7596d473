"""Public column-function namespace.

One import surface for the engine's reusable Column-level functions
(everything here is a pure projection built from ``pyspark.sql.functions``
— JVM codegen, no UDFs), complementing the full `pyspark.sql.functions`
namespace that metadata reaches through ``expr``-typed transforms
(SURVEY §2.2 P10).

Text: tokens, token_count, bpe_ish_token_count, char_count, punct_ratio,
uppercase_ratio, stopword_ratio, quality_score, lang_id, normalize_text,
fingerprint_md5, rolling_fingerprint.

Sketches: hash60, word_shingles, shingle_hashes, minhash_from_hashes,
minhash_from_shingles, minhash_signature, token_hashes, simhash_from_hashes,
simhash64, hamming64.

Vector: dot, l2_norm, cosine, rh_signature.
"""

from metadata_driven_data_pipeline_spark.operators.dedup import (
    _hash60 as hash60,
    hamming64,
    minhash_from_hashes,
    minhash_from_shingles,
    minhash_signature,
    shingle_hashes,
    simhash64,
    simhash_from_hashes,
    token_hashes,
    word_shingles,
)
from metadata_driven_data_pipeline_spark.operators.similarity import (
    cosine,
    dot,
    l2_norm,
    rh_signature,
)
from metadata_driven_data_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    char_count,
    fingerprint_md5,
    lang_id,
    normalize_text,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    token_count,
    tokens,
    uppercase_ratio,
)

__all__ = [
    "hash60", "hamming64", "minhash_from_hashes", "minhash_from_shingles",
    "minhash_signature", "shingle_hashes",
    "simhash64", "simhash_from_hashes", "token_hashes", "word_shingles",
    "cosine", "dot", "l2_norm", "rh_signature",
    "bpe_ish_token_count", "char_count", "fingerprint_md5", "lang_id",
    "normalize_text", "punct_ratio", "quality_score", "rolling_fingerprint",
    "stopword_ratio", "token_count", "tokens", "uppercase_ratio",
]
