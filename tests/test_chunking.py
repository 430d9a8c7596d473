"""chunk_documents: fixed-size token chunking with overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.text import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_short_doc_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_size=4, stride=3
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0
    assert out[0]["chunk_len"] == 3


def test_exact_boundary_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c d")]), chunk_size=4, stride=3
    ).collect()
    assert len(out) == 1 and out[0]["chunk_len"] == 4


def test_overlap_and_tail_coverage(spark):
    # 10 tokens, size 4, stride 3 -> chunks start at 0,3,6 and tail 9
    toks = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, toks)]), chunk_size=4, stride=3
    ).orderBy("chunk_idx").collect()
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert [r["chunk_len"] for r in out] == [4, 4, 4]
    # n=10 <= size+2*stride: 1+ceil(6/3)=3 chunks, last covers t6..t9


def test_every_token_covered(spark):
    toks = " ".join(f"t{i}" for i in range(11))
    out = chunk_documents(
        _docs(spark, [(1, toks)]), chunk_size=4, stride=3
    ).orderBy("chunk_idx").collect()
    covered = set()
    for r in out:
        start = r["chunk_idx"] * 3
        covered.update(range(start, start + r["chunk_len"]))
    assert covered == set(range(11))


def test_empty_and_null_docs_dropped(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, "   "), (3, None), (4, "x")]),
        chunk_size=4,
        stride=3,
    ).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_no_overlap_when_stride_equals_size(spark):
    toks = " ".join(f"t{i}" for i in range(9))
    out = chunk_documents(
        _docs(spark, [(1, toks)]), chunk_size=3, stride=3
    ).collect()
    assert sum(r["chunk_len"] for r in out) == 9


def test_invalid_args(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), stride=-1)


def test_hash_matches_slice(spark):
    toks = " ".join(f"t{i}" for i in range(7))
    out = chunk_documents(
        _docs(spark, [(1, toks)]), chunk_size=4, stride=3
    ).orderBy("chunk_idx").collect()
    import hashlib

    expected0 = hashlib.md5("t0 t1 t2 t3".encode()).hexdigest()
    expected1 = hashlib.md5("t3 t4 t5 t6".encode()).hexdigest()
    assert [r["chunk_hash"] for r in out] == [expected0, expected1]


def test_chunk_invariants_edge_grid(spark):
    """Every (n_tokens, chunk_size, stride) combo in one job: full token
    coverage, correct chunk count, max length respected, contiguous
    chunk_idx starting at 0."""
    import math

    sizes = [(4, 3), (3, 3), (5, 2), (8, 8), (2, 1)]
    ns = [1, 2, 3, 4, 5, 7, 8, 9, 16, 17, 31]
    for chunk_size, stride in sizes:
        rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in ns]
        from metadata_driven_data_pipeline_spark.operators.text import (
            chunk_documents,
        )

        out = chunk_documents(
            spark.createDataFrame(rows, "doc_id LONG, text STRING"),
            chunk_size=chunk_size,
            stride=stride,
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for n in ns:
            chunks = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
            expected = 1 if n <= chunk_size else 1 + math.ceil(
                (n - chunk_size) / stride
            )
            assert len(chunks) == expected, (n, chunk_size, stride)
            assert [c["chunk_idx"] for c in chunks] == list(range(expected))
            covered = set()
            for c in chunks:
                start = c["chunk_idx"] * stride
                assert 1 <= c["chunk_len"] <= chunk_size
                covered.update(range(start, start + c["chunk_len"]))
            assert covered == set(range(n)), (n, chunk_size, stride)
