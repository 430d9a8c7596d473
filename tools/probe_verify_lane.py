"""Verify-lane probe (r3 verdict item 6): on the adversarial 20x dup
graph (sf0.1 documents replicated 20x -> ~100k docs, ~1M LSH candidate
pairs) the per-pair Jaccard-verify join dominates `neardup_groups` wall
(59 s total, BASELINE.md). Measures the verify stage alone under both
shingle lanes:

- text lane (oracle): `array_intersect` over shingle TEXT arrays
- xxhash64 lane (production): shingles hashed to 8-byte longs before the
  pair join — less shuffle, long-vs-long intersection

Candidates are generated ONCE and persisted so the comparison isolates
the verify stage. Pair sets must be identical between lanes.

Usage: python tools/probe_verify_lane.py [sf_dir] [replication]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.operators import dedup as dd


def replicate(docs, times: int):
    n = docs.count()
    reps = docs.sparkSession.range(times).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n * 10)
        .drop("rep")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    times = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark()
    docs = (
        replicate(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            times,
        )
        .persist()
    )
    n = docs.count()
    t0 = time.time()
    cand = dd.minhash_lsh_candidates(docs).persist()
    n_pairs = cand.count()
    print(f"docs={n}, candidates={n_pairs} ({time.time()-t0:.1f}s)")

    walls = {}
    counts = {}
    for label, lane in [("text", None), ("xxhash64", "xxhash64")]:
        t0 = time.time()
        out = dd.jaccard_verify_pairs(
            docs, cand, threshold=0.8, shingle_hash=lane
        )
        counts[label] = out.count()
        walls[label] = time.time() - t0
        dd.release_persisted()
        print(f"  verify[{label}]: {counts[label]} pairs "
              f"in {walls[label]:.1f}s")
    assert counts["text"] == counts["xxhash64"], counts
    print(f"speedup: {walls['text'] / walls['xxhash64']:.2f}x "
          f"(identical {counts['text']} verified pairs)")


if __name__ == "__main__":
    main()
