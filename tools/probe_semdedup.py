"""Scale probe for semdedup_pairs sub-blocking (BASELINE.md methodology).

Replicates the sf0.1 embeddings table (2,000 × 64-dim) with perturbed
copies to n = 2k/10k/40k vectors, then times the within-cluster pair join
with and without sub-blocking at small k — the regime where the join key
count (k) used to cap parallelism. The sub-blocked plan replaces k join
keys with Σ_c nblocks_c·(nblocks_c+1)/2 (cluster, block_i, block_j) keys,
so a 40k-vector / k=8 run fans out to ~dozens of task-sized units instead
of 8 giant ones.

Usage: python tools/probe_semdedup.py [mults] (default "5 20")
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import similarity as sim
from metadata_driven_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, mult: int):
    """mult perturbed copies of the embeddings table with distinct ids
    (same adversarial scheme as the round-1 probe: every vector has
    mult-1 near-copies, so pair output is maximal)."""
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


def run_case(spark, emb, k: int, block_size: int, label: str) -> None:
    centroids = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cluster_id"),
                F.col("embedding").alias("centroid"))
    )
    t0 = time.time()
    pairs = sim.semdedup_pairs(
        emb, centroids, threshold=0.8, block_size=block_size
    )
    n_pairs = pairs.count()
    dt = time.time() - t0
    print(f"{label}: k={k} block_size={block_size} "
          f"pairs={n_pairs} wall={dt:.1f}s", flush=True)


def main():
    mults = [int(m) for m in (sys.argv[1:] or ["5", "20"])]
    spark = get_spark(app_name="probe_semdedup", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    for mult in mults:
        emb = replicated(spark, mult).persist()
        n = emb.count()
        print(f"--- corpus: {n} vectors (x{mult}) ---", flush=True)
        # small-k regime: the old plan had exactly k parallel units
        run_case(spark, emb, k=8, block_size=1 << 40, label="unblocked")
        run_case(spark, emb, k=8, block_size=2048, label="sub-blocked")
        # k grown with n (the semdedup_auto policy) for reference
        k = max(8, n // 1250)
        run_case(spark, emb, k=k, block_size=2048, label="k-scaled ")
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
