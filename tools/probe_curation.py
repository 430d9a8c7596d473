"""Scale probe for the round-3 curation operators.

Times span_dedup / gopher_rules / quality_classifier / domain_mix on the
sf documents table and on a 20x replicated corpus (replicas share text →
heavy span duplication, the realistic regime for span_dedup), reporting
the wall-clock scaling ratio. Linear operators should stay well under
20x wall at 20x data on a fixed 32-thread machine.

Usage: python tools/probe_curation.py [sf_dir] [replication]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.operators import dedup as dd
from metadata_driven_data_pipeline_spark.operators import sampling as smp
from metadata_driven_data_pipeline_spark.operators import text as tx


def replicate(docs, times: int):
    n = docs.count()
    reps = docs.sparkSession.range(times).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n * 10)
        .drop("rep")
    )


def timed(label, df, force_all_columns=False):
    t0 = time.time()
    if force_all_columns:
        # count() would let Catalyst prune expensive output columns
        # (e.g. span_dedup's reassembled text); checksum them instead
        row = df.agg(
            F.count("*").alias("n"),
            F.max(F.md5(F.concat_ws("|", *df.columns))).alias("chk"),
        ).collect()[0]
        n = row["n"]
    else:
        n = df.count()
    dt = time.time() - t0
    print(f"  {label}: {n} rows in {dt:.2f}s")
    return dt


def run(docs, tag):
    print(f"[{tag}] n={docs.count()}")
    out = {}
    out["span_dedup"] = timed(
        "span_dedup(k=16)", dd.span_dedup(docs, span_tokens=16),
        force_all_columns=True,
    )
    out["gopher"] = timed(
        "gopher_rules", tx.gopher_rules(docs, min_words=30).filter("gopher_keep")
    )
    w = [((j * 7919) % 2001 - 1000) / 1000 for j in range(64)]
    out["qclf"] = timed(
        "quality_classifier", tx.quality_classifier(docs, w).filter("keep")
    )
    out["qclf_xx"] = timed(
        "quality_classifier(xxhash64)",
        tx.quality_classifier(docs, w, hash_fn="xxhash64").filter("keep"),
    )
    out["domain_mix"] = timed(
        "domain_mix",
        smp.domain_mix(docs, "doc_id", "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}),
    )
    # incremental dedup: first half of ids is the index, second half the batch
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    index = docs.filter(F.col("doc_id") < mid).select(
        F.md5(tx.normalize_text(F.col("text"))).alias("fingerprint")
    )
    out["incremental_dedup"] = timed(
        "incremental_dedup",
        dd.incremental_dedup(docs.filter(F.col("doc_id") >= mid), index),
    )
    vocab = tx.build_vocab(docs, min_count=3)
    out["vocab_encode"] = timed(
        "vocab_encode",
        tx.encode_with_vocab(docs, vocab).select("doc_id", "n_unk"),
        force_all_columns=True,
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    times = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    docs.persist().count()
    base = run(docs, "base")
    big = replicate(docs, times)
    big.persist().count()
    scaled = run(big, f"{times}x")
    print(f"scaling ratios at {times}x data:")
    for k in base:
        print(f"  {k}: {scaled[k] / base[k]:.2f}x wall")


if __name__ == "__main__":
    main()
