"""Scale probe: candidates→verify vs all-pairs embedding near-dup.

At the toy bench scale (2k vectors) the O(n²) all-pairs join is actually
FASTER than candidates→verify — 2M pairs is nothing, and the LSH path
pays signature + join-back overhead. This probe shows why the default
flipped anyway (VERDICT r2 item 3): replicate the corpus and the
all-pairs wall grows ~quadratically while the candidates path tracks the
(data-dependent) candidate count. The crossover is already inside this
machine's reach.

Usage: python tools/probe_embedding_neardup.py [mults] (default "2 5 10 20")
       all-pairs is skipped above ALLPAIRS_MAX_MULT=10 (it would dominate
       the probe's runtime — which is the point).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import dedup as dd
from metadata_driven_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
ALLPAIRS_MAX_MULT = 10


def replicated(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = base.count()
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    return (
        base.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * n).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("copy") * (i + F.lit(1)) % 97).cast("float") * 1e-4,
            ).alias("embedding"),
        )
    )


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["2", "5", "10", "20"])]
    spark = get_spark(app_name="probe-embedding-neardup",
                      shuffle_partitions=32)
    for mult in mults:
        emb = replicated(spark, mult).persist()
        n = emb.count()
        t0 = time.time()
        n_cand = dd.embedding_neardup_pairs(
            emb, threshold=0.95, dim=DIM
        ).count()
        t_cand = time.time() - t0
        line = f"mult={mult} n={n} candidates_path: {n_cand} pairs {t_cand:.1f}s"
        if mult <= ALLPAIRS_MAX_MULT:
            t0 = time.time()
            n_all = dd._verify_all_pairs(emb, threshold=0.95).count()
            t_all = time.time() - t0
            assert n_all == n_cand, (n_all, n_cand)
            line += f" | all_pairs: {t_all:.1f}s ({n*(n-1)//2} pairs scored)"
        print(line)
        emb.unpersist()


if __name__ == "__main__":
    main()
