"""Bloom-prefilter probe: quantify the incremental-dedup win in the
regime the filter exists for — a fingerprint index far larger than the
ingestion batch, too big to broadcast (autoBroadcastJoinThreshold is
disabled to stand in for the billions-row case).

The index lives where it would in production: parquet on disk, sorted
by fingerprint (layout/compaction sort_by), never persisted in RAM.
Per batch, three plans produce identical survivor sets:

- plain:    incremental_dedup LEFT ANTI — shuffles the WHOLE index
            every batch (the cost that explodes at 100 TB)
- bloom:    bitarray-probe prefilter (packed words broadcast once per
            index generation), then a map-side semi SCAN of the index
            for the tiny candidate set — no index shuffle
- bloom+pd: same prefilter, confirm via IN-pushdown into the sorted
            parquet scan — file/row-group pruning turns the confirm
            into point lookups when |candidates| < file count
- bloom+auto: confirm_pushdown_max='auto' — the cap derived from the
            index's BYTE size at call time (clamp(bytes/96KiB, 1024,
            65536); see the r5 calibration in BASELINE.md — file count
            does not track the crossover); must match whichever manual
            lane wins at this candidate volume

Each lane runs twice: rep1 includes one-time costs (python-worker
broadcast shipping), rep2 is the steady-state per-batch cost the
daily-ingest loop actually pays. Results in BASELINE.md.

Usage: python tools/probe_bloom.py [index_keys] [batch_keys] [dup_frac]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.operators import dedup as dd
from metadata_driven_data_pipeline_spark.operators import sketch as sk


def main():
    n_index = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.001
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    idx_path = "/tmp/probe_bloom_index"
    shutil.rmtree(idx_path, ignore_errors=True)
    (
        spark.range(n_index)
        .select(F.md5(F.concat(F.lit("k"), F.col("id"))).alias("fingerprint"))
        .repartitionByRange(64, "fingerprint")
        .sortWithinPartitions("fingerprint")
        .write.parquet(idx_path)
    )
    index = spark.read.parquet(idx_path)

    n_dup = int(n_batch * dup_frac)
    batch = (
        spark.range(n_batch)
        .withColumn(
            "src_id",
            F.when(F.col("id") < n_dup, F.col("id") * 37 % n_index)
            .otherwise(F.col("id") + n_index),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("k"), F.col("src_id")).alias("text"),
        )
    )
    batch.persist().count()

    m_bits = 1 << max(16, (n_index * 10).bit_length())
    t0 = time.time()
    bloom = sk.bloom_build(index, "fingerprint", m_bits=m_bits, k=5,
                           hash_fn="xxhash64")
    bloom.persist().count()
    packed = sk.bloom_pack(spark, bloom, m_bits)
    t_build = time.time() - t0

    def timed(fn):
        reps = []
        counts = []
        for _ in range(2):
            t0 = time.time()
            counts.append(fn().count())
            reps.append(time.time() - t0)
        assert counts[0] == counts[1]
        return reps, counts[0]

    t_plain, n_plain = timed(
        lambda: dd.incremental_dedup(batch, index, normalize=False)
    )
    t_bloom, n_bloom = timed(
        lambda: sk.bloom_prefilter_dedup(
            batch, index, bloom, text_col="text", m_bits=m_bits, k=5,
            hash_fn="xxhash64", normalize=False, impl="bitarray",
            packed=packed,
        )
    )
    t_push, n_push = timed(
        lambda: sk.bloom_prefilter_dedup(
            batch, index, bloom, text_col="text", m_bits=m_bits, k=5,
            hash_fn="xxhash64", normalize=False, impl="bitarray",
            packed=packed, confirm_pushdown_max=100_000,
        )
    )
    t_auto, n_auto = timed(
        lambda: sk.bloom_prefilter_dedup(
            batch, index, bloom, text_col="text", m_bits=m_bits, k=5,
            hash_fn="xxhash64", normalize=False, impl="bitarray",
            packed=packed, confirm_pushdown_max="auto",
            index_path=idx_path,
        )
    )

    probed = sk.bloom_probe(
        batch.select(F.md5("text").alias("fp")).distinct(), "fp", bloom,
        m_bits=m_bits, k=5, hash_fn="xxhash64", impl="bitarray",
        packed=packed,
    )
    n_cand = probed.filter("maybe_seen").count()

    print(
        f"index={n_index} batch={n_batch} dup_frac={dup_frac} "
        f"m_bits=2^{m_bits.bit_length()-1} words={bloom.count()} "
        f"build_once={t_build:.2f}s"
    )
    print(
        f"plain_anti reps={[f'{t:.2f}' for t in t_plain]}  "
        f"bloom_scan reps={[f'{t:.2f}' for t in t_bloom]}  "
        f"bloom_pushdown reps={[f'{t:.2f}' for t in t_push]}  "
        f"bloom_auto reps={[f'{t:.2f}' for t in t_auto]}  "
        f"candidates={n_cand} ({100*n_cand/n_batch:.3f}%)  "
        f"survivors={n_plain}/{n_bloom}/{n_push}/{n_auto} "
        f"identical={n_plain == n_bloom == n_push == n_auto}"
    )
    assert n_plain == n_bloom == n_push == n_auto
    shutil.rmtree(idx_path, ignore_errors=True)


if __name__ == "__main__":
    main()
