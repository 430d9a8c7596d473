"""ANN recall@k harness (VERDICT r2 item 7; BASELINE.md methodology).

Measures what a 100 TB ANN deployment is actually judged on — RECALL, not
just oracle-exactness of the happy path: for a replicated corpus (sf0.1
embeddings × mult, perturbed copies, same scheme as probe_semdedup.py),
compare `ann_topk_lsh` (random-hyperplane buckets + multiprobe) and
`ann_topk_ivf` (coarse-cell inverted file, n_probe cells) against the
exact `brute_force_topk` ground truth across their quality knobs.

recall@k = |approx ∩ exact| / |exact| over (query_id, vec_id) pairs,
averaged across queries. Cosine ties at the boundary are broken by vec_id
in both paths, so the intersection is well-defined.

Usage: python tools/probe_ann_recall.py [mult] [n_queries] [k]
       (defaults: 20 → ~41k vectors, 25 queries, k=5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators import similarity as sim
from metadata_driven_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64


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


def topk_set(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    per_q = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
        if hits
    ]
    return sum(per_q) / len(per_q) if per_q else 0.0


def _pq_curve(spark, emb, queries, k: int, results: list, t_brute: float):
    """PQ ADC recall/compression curve over the codebook-size ladder
    k_codes ∈ {16, 64, 128, 256} (FAISS default 256) — pure ADC, no IVF
    pruning, so the curve isolates quantization distortion (r3 verdict
    item 4: measured recall at k=16 was 0.36-0.40, <1 bit/dim).

    Ground truth is exact squared-L2 (ADC's metric). Compression is
    float32 bytes / PQ code bytes at bit-packed width ceil(log2(k))."""
    import math

    from pyspark.sql import Window

    from metadata_driven_data_pipeline_spark.operators.clustering import _sq_l2

    m = 8
    q_named = queries.select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qd = q_named.select(
        "query_id", sim.dvec(F.col("embedding")).alias("__qv")
    )
    cd = emb.select("vec_id", sim.dvec(F.col("embedding")).alias("__cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("vec_id").asc()
    )
    exact_l2 = topk_set(
        cd.join(F.broadcast(qd))
        .select("query_id", "vec_id",
                _sq_l2(F.col("__qv"), F.col("__cv")).alias("__d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    for k_codes in [16, 64, 128, 256]:
        t0 = time.time()
        cb = sim.train_pq_codebooks(
            emb, m=m, dim=DIM, k=k_codes, iters=2
        ).persist()
        t_train = time.time() - t0
        codes = sim.pq_encode(emb, cb, m=m, dim=DIM).select(
            "vec_id", "codes"
        ).persist()
        codes.count()
        t0 = time.time()
        approx = topk_set(
            sim.pq_adc_topk(codes, cb, q_named, m=m, dim=DIM, k=k)
        )
        code_bytes = m * math.ceil(math.log2(k_codes)) / 8
        results.append(
            {
                "variant": "pq_adc",
                "params": {"m": m, "k_codes": k_codes, "iters": 2},
                "recall_at_k": round(recall(approx, exact_l2), 4),
                "compression_x": round(DIM * 4 / code_bytes, 1),
                "train_sec": round(t_train, 1),
                "search_sec": round(time.time() - t0, 1),
            }
        )
        print(json.dumps(results[-1]))
        # refine rung: ADC shortlist -> exact rerank (IndexRefineFlat) —
        # recall now tracks shortlist hit-rate, not code fidelity
        for shortlist in ([25, 50, 100] if k_codes in (16, 256) else []):
            t0 = time.time()
            approx = topk_set(
                sim.pq_adc_rerank(
                    codes, cb, emb, q_named, m=m, dim=DIM, k=k,
                    shortlist=shortlist,
                )
            )
            results.append(
                {
                    "variant": "pq_adc_rerank",
                    "params": {"m": m, "k_codes": k_codes,
                               "shortlist": shortlist},
                    "recall_at_k": round(recall(approx, exact_l2), 4),
                    "search_sec": round(time.time() - t0, 1),
                }
            )
            print(json.dumps(results[-1]))
        cb.unpersist()
        codes.unpersist()
    print(json.dumps({"brute_wall_sec": round(t_brute, 1),
                      "results": results}))


def main() -> None:
    pq_only = "--pq-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(args[0]) if len(args) > 0 else 20
    n_queries = int(args[1]) if len(args) > 1 else 25
    k = int(args[2]) if len(args) > 2 else 5

    spark = get_spark(app_name="probe-ann-recall", shuffle_partitions=32)
    emb = replicated(spark, mult).persist()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries).persist()
    queries.count()
    print(f"corpus n={n}, dim={DIM}, queries={n_queries}, k={k}")

    t0 = time.time()
    exact = topk_set(sim.brute_force_topk(emb, queries, k=k))
    t_brute = time.time() - t0
    print(f"brute-force ground truth: {t_brute:.1f}s")

    results = []
    if pq_only:
        _pq_curve(spark, emb, queries, k, results, t_brute)
        return
    for bits, multiprobe, tables in [
        (8, 0, 1), (8, 1, 1), (8, 2, 1),
        (8, 1, 4), (8, 1, 8), (8, 2, 8), (10, 1, 8), (8, 1, 16),
    ]:
        t0 = time.time()
        approx = topk_set(
            sim.lsh_bucket_topk(
                emb, queries, dim=DIM, k=k, bits=bits,
                multiprobe=multiprobe, tables=tables,
            )
        )
        results.append(
            {
                "variant": "lsh",
                "params": {"bits": bits, "multiprobe": multiprobe,
                           "tables": tables},
                "recall_at_k": round(recall(approx, exact), 4),
                "wall_sec": round(time.time() - t0, 1),
            }
        )
        print(json.dumps(results[-1]))

    trained: dict[int, list[list[float]]] = {}
    for n_cells, n_probe, centroids in [
        (8, 1, "random"), (8, 2, "random"), (8, 4, "random"),
        (16, 2, "random"), (16, 4, "random"),
        (8, 2, "trained"), (16, 2, "trained"), (16, 4, "trained"),
    ]:
        cents = None
        if centroids == "trained":
            if n_cells not in trained:
                t0 = time.time()
                trained[n_cells] = sim.train_ivf_centroids(
                    emb, dim=DIM, n_cells=n_cells
                )
                print(f"trained {n_cells} cells in {time.time()-t0:.1f}s")
            cents = trained[n_cells]
        t0 = time.time()
        approx = topk_set(
            sim.ivf_topk(
                emb, queries, dim=DIM, k=k, n_cells=n_cells,
                n_probe=n_probe, centroids=cents,
            )
        )
        results.append(
            {
                "variant": "ivf",
                "params": {"n_cells": n_cells, "n_probe": n_probe,
                           "centroids": centroids},
                "recall_at_k": round(recall(approx, exact), 4),
                "wall_sec": round(time.time() - t0, 1),
            }
        )
        print(json.dumps(results[-1]))

    # --- IVF+PQ: recall of the compressed-search composition ------------
    # ground truth switches to exact squared-L2 (ADC's metric): the
    # comparison must not conflate metric mismatch with quantization loss
    from metadata_driven_data_pipeline_spark.operators.clustering import _sq_l2
    from pyspark.sql import Window

    q_named = queries.select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qd = q_named.select(
        "query_id", sim.dvec(F.col("embedding")).alias("__qv")
    )
    cd = emb.select("vec_id", sim.dvec(F.col("embedding")).alias("__cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("vec_id").asc()
    )
    t0 = time.time()
    exact_l2 = topk_set(
        cd.join(F.broadcast(qd))
        .select("query_id", "vec_id",
                _sq_l2(F.col("__qv"), F.col("__cv")).alias("__d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    print(f"brute L2 ground truth: {time.time()-t0:.1f}s")

    init_cb = sim.slice_subvectors(
        emb.filter(F.col("vec_id") < 16), m=8, dim=DIM
    ).select(
        "subspace", F.col("vec_id").cast("int").alias("code"),
        F.col("subvec").alias("centroid"),
    ).persist()
    t0 = time.time()
    trained_cb = sim.train_pq_codebooks(emb, m=8, dim=DIM, k=16, iters=2)
    trained_cb = trained_cb.persist()
    print(f"trained PQ codebooks in {time.time()-t0:.1f}s")
    t0 = time.time()
    trained_cb64 = sim.train_pq_codebooks(
        emb, m=8, dim=DIM, k=64, iters=2
    ).persist()
    print(f"trained k=64 PQ codebooks in {time.time()-t0:.1f}s")
    for cb_name, cb in [
        ("init", init_cb), ("trained", trained_cb),
        ("trained_k64", trained_cb64),
    ]:
        for n_cells, n_probe in [(8, 2), (8, 4), (16, 4)]:
            t0 = time.time()
            approx = topk_set(
                sim.ivf_pq_topk(
                    emb, cb, q_named, dim=DIM, m=8, k=k,
                    n_cells=n_cells, n_probe=n_probe,
                )
            )
            results.append(
                {
                    "variant": "ivf_pq",
                    "params": {"n_cells": n_cells, "n_probe": n_probe,
                               "codebooks": cb_name},
                    "recall_at_k": round(recall(approx, exact_l2), 4),
                    "wall_sec": round(time.time() - t0, 1),
                }
            )
            print(json.dumps(results[-1]))

    print(json.dumps({"brute_wall_sec": round(t_brute, 1), "results": results}))


if __name__ == "__main__":
    main()
