"""DSIR scale probe: importance-weight a synthetic corpus far larger
than the toy tables and check the cost structure the operator promises:

- model state bounded at B buckets (broadcast both models, never the
  corpus);
- scoring linear in corpus token count (one explode + broadcast join +
  one id-keyed re-group);
- doubling the corpus ~doubles wall clock (no superlinear term);
- Gumbel top-k adds only a TakeOrdered on the B-bounded weight table.

Usage: python tools/probe_dsir.py [n_docs] [buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.operators import dsir as ds

WORDS = [
    "market", "price", "earnings", "stock", "quarter", "revenue",
    "cat", "dog", "bird", "house", "tree", "river", "cloud", "stone",
    "model", "data", "train", "token", "sample", "weight",
]


def synth(spark, n, sources):
    """n docs of ~24 words drawn deterministically from WORDS; source
    cycles so a target slice exists."""
    w = F.array(*[F.lit(x) for x in WORDS])
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % sources)).alias("source"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        w,
                        (
                            F.xxhash64(F.col("id") * 31 + F.lit(i))
                            .bitwiseAND(F.lit(0x7FFFFFFF))
                            % ((F.col("id") % 3 + 1) * 6 + 2)
                        ).cast("int")
                        + 1,
                    )
                    for i in range(24)
                ],
            ).alias("text"),
        )
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    for scale in (n, 2 * n):
        docs = synth(spark, scale, sources=20).persist()
        docs.count()
        target = docs.filter(F.col("source") == "src0")
        t0 = time.time()
        w = ds.dsir_weights(docs, target, buckets=buckets)
        n_w = w.count()
        t_weights = time.time() - t0
        t0 = time.time()
        sel = ds.dsir_topk(docs, target, k=1000, buckets=buckets)
        n_sel = sel.count()
        t_topk = time.time() - t0
        model_rows = ds.hashed_ngram_counts(docs, buckets=buckets).count()
        print(
            f"docs={scale} buckets=2^{buckets.bit_length()-1} "
            f"model_rows={model_rows} weights={n_w} "
            f"t_weights={t_weights:.2f}s topk={n_sel} t_topk={t_topk:.2f}s"
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
