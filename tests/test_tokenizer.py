"""Distributed BPE trainer/encoder vs a pure-Python reference.

The reference implements the textbook Sennrich et al. algorithm on the
driver (dict-of-tuples); the Spark implementation must reproduce its
merge table and encodings EXACTLY — including argmax tie-breaks — so
training is cluster-size- and engine-independent.
"""

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import tokenizer as tk

EOW = "</w>"


# ---- pure-Python reference ---------------------------------------------


def ref_word_freqs(texts):
    words = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split():
            words[w] += 1
    return {w: (c, tuple(w) + (EOW,)) for w, c in words.items()}


def ref_pair_counts(vocab):
    pairs = Counter()
    for _, (freq, syms) in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += freq
    return pairs


def ref_apply(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def ref_train(texts, n_merges, min_freq=1):
    vocab = ref_word_freqs(texts)
    rules = []
    for rank in range(1, n_merges + 1):
        pairs = ref_pair_counts(vocab)
        if not pairs:
            break
        # count desc, then (left, right) asc — the documented tie-break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_freq:
            break
        rules.append((rank, left, right, left + right, cnt))
        vocab = {
            w: (f, ref_apply(s, left, right))
            for w, (f, s) in vocab.items()
        }
    return rules


def ref_encode(text, rules):
    out = []
    for w in " ".join(text.lower().split()).split():
        syms = tuple(w) + (EOW,)
        for _, left, right, _, _ in rules:
            syms = ref_apply(syms, left, right)
        out.extend(syms)
    return out


# ---- fixtures ----------------------------------------------------------

CORPUS = [
    "low lower lowest low low",
    "new newer newest new wider",
    "the low bid and the lower bid",
    "newest gadget in the new world",
    "wide wider widest the the the",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    )


# ---- tests -------------------------------------------------------------


def test_merge_table_matches_reference(spark, docs):
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in tk.bpe_train(docs, n_merges=12).orderBy("rank").collect()
    ]
    assert got == ref_train(CORPUS, 12)


def test_encode_matches_reference(spark, docs):
    rules = ref_train(CORPUS, 10)
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in tk.bpe_encode(
            docs, [(l, r) for _, l, r, _, _ in rules]
        ).collect()
    }
    for i, t in enumerate(CORPUS):
        assert enc[i] == ref_encode(t, rules), i


def test_encode_accepts_trained_dataframe(spark, docs):
    merges = tk.bpe_train(docs, n_merges=5)
    out = tk.bpe_encode(docs, merges)
    assert out.count() == len(CORPUS)
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row.n_bpe_tokens == len(row.bpe_tokens)
    # chars are conserved: stripping </w> and concatenating reproduces
    # the normalized text without spaces
    joined = "".join(s.replace(EOW, "") for s in row.bpe_tokens)
    assert joined == CORPUS[0].replace(" ", "")


def test_early_stop_when_no_pair_reaches_min_freq(spark):
    tiny = spark.createDataFrame([Row(doc_id=0, text="ab cd")])
    merges = tk.bpe_train(tiny, n_merges=50, min_freq=2)
    # every adjacent pair occurs once; min_freq=2 stops before rank 1
    assert merges.count() == 0


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text="aa aa")]
    )
    merges = tk.bpe_train(df, n_merges=2)
    assert merges.count() == 2  # (a,a) then (aa,</w>)
    enc = tk.bpe_encode(df, merges)
    got = {r.doc_id: r.n_bpe_tokens for r in enc.collect()}
    # empty doc encodes to zero tokens; "aa aa" to two fused tokens
    assert got == {0: 0, 1: 2}
