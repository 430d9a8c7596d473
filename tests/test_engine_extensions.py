"""Extension transform types (chunk / sample / gap_fill / kmeans_assign /
semdedup) driven declaratively through the Engine — the metadata-compiled
surface, not direct operator calls."""

from __future__ import annotations

import duckdb

from metadata_driven_data_pipeline_spark.engine import Engine

SF = "/root/testdata/sf0.001"


def _run(spark, root: str, transformations: list, sources: list, sink_input: str):
    meta = {
        "processing_mode": "full",
        "dataflows": [
            {
                "name": "ext-flow",
                "sources": sources,
                "transformations": transformations,
                "sinks": [
                    {
                        "name": "out",
                        "input": sink_input,
                        "path": f"{root}/out",
                        "format": "parquet",
                        "saveMode": "overwrite",
                    }
                ],
            }
        ],
    }
    log = Engine(spark, meta, run_id="ext-1").run()
    assert log["status"] == "success"
    return spark.read.parquet(f"{root}/out")


def test_chunk_transform(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "chunks", "type": "chunk",
             "params": {"input": "documents", "chunkSize": 64, "stride": 48}},
        ],
        sink_input="chunks",
    )
    assert set(out.columns) == {"doc_id", "chunk_idx", "chunk_len", "chunk_hash"}
    assert out.count() > 0
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet') "
        "WHERE text IS NOT NULL AND trim(text) != ''"
    ).fetchone()[0]
    # every non-empty doc yields >= 1 chunk
    assert out.select("doc_id").distinct().count() == n_docs


def test_sample_and_split_transforms(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "sampled", "type": "sample",
             "params": {"input": "documents", "mode": "hash",
                        "keyCol": "doc_id", "fraction": 0.5}},
            {"name": "split", "type": "sample",
             "params": {"input": "sampled", "mode": "split",
                        "keyCol": "doc_id", "testFraction": 0.2}},
        ],
        sink_input="split",
    )
    total = out.count()
    assert 0 < total
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "test"}
    # determinism: running the identical flow yields identical membership
    out2 = _run(
        spark,
        str(tmp_path / "again"),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "sampled", "type": "sample",
             "params": {"input": "documents", "mode": "hash",
                        "keyCol": "doc_id", "fraction": 0.5}},
            {"name": "split", "type": "sample",
             "params": {"input": "sampled", "mode": "split",
                        "keyCol": "doc_id", "testFraction": 0.2}},
        ],
        sink_input="split",
    )
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in out2.select("doc_id", "split").collect()}
    assert a == b


def test_gap_fill_transform(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "events", "path": f"{SF}/events.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "purchases", "type": "sql",
             "params": {"statement":
                        "SELECT user_id, timestamp_micros(ts div 1000) AS ts "
                        "FROM events WHERE event_type = 'purchase'"}},
            {"name": "dense", "type": "gap_fill",
             "params": {"input": "purchases", "keyCol": "user_id", "tsCol": "ts",
                        "aggregations": [{"expr": "COUNT(*)", "alias": "n"}]}},
        ],
        sink_input="dense",
    )
    assert set(out.columns) == {"user_id", "bucket_ts", "n"}
    # grid is contiguous: per user, row count == hours between min and max + 1
    import pyspark.sql.functions as F

    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("rows"),
        ((F.unix_timestamp(F.max("bucket_ts"))
          - F.unix_timestamp(F.min("bucket_ts"))) / 3600 + 1).alias("span"),
    )
    bad = per_user.filter(F.col("rows") != F.col("span")).count()
    assert bad == 0


def test_kmeans_and_semdedup_transforms(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "centroids", "type": "sql",
             "params": {"statement": "SELECT vec_id AS cluster_id, embedding AS centroid "
                                 "FROM embeddings WHERE vec_id < 4"}},
            {"name": "assigned", "type": "kmeans_assign",
             "params": {"input": "embeddings", "centroids": "centroids"}},
        ],
        sink_input="assigned",
    )
    assert set(out.columns) == {"vec_id", "cluster_id", "dist2"}
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert out.count() == n_emb
    assert out.filter("cluster_id < 0 OR cluster_id > 3").count() == 0

    pairs = _run(
        spark,
        str(tmp_path / "sd"),
        sources=[{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "centroids", "type": "sql",
             "params": {"statement": "SELECT vec_id AS cluster_id, embedding AS centroid "
                                 "FROM embeddings WHERE vec_id < 4"}},
            {"name": "dups", "type": "semdedup",
             "params": {"input": "embeddings", "centroids": "centroids",
                        "threshold": 0.0}},
        ],
        sink_input="dups",
    )
    assert set(pairs.columns) == {"cluster_id", "id_a", "id_b", "cosine"}
    assert pairs.filter("id_a >= id_b").count() == 0
