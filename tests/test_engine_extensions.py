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
                        "SELECT user_id, CAST(ts AS TIMESTAMP) AS ts "
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


def test_cli_dry_run_valid_and_invalid(tmp_path, capsys):
    """--dry-run compiles without Spark: valid metadata prints the topo
    plan and exits 0; a dangling input reference exits 1 with the error."""
    import json

    from metadata_driven_data_pipeline_spark.__main__ import main

    good = tmp_path / "good.json"
    good.write_text(json.dumps({
        "processing_mode": "full",
        "dataflows": [{
            "name": "f",
            "sources": [{"name": "documents", "path": f"{SF}/documents.parquet",
                         "format": "parquet"}],
            "transformations": [
                {"name": "b", "type": "filter",
                 "params": {"input": "a", "condition": "1=1"}},
                {"name": "a", "type": "filter",
                 "params": {"input": "documents", "condition": "1=1"}},
            ],
            "sinks": [{"name": "o", "input": "b", "path": str(tmp_path / "o"),
                       "format": "parquet"}],
        }],
    }))
    assert main(["--metadata", str(good), "--dry-run"]) == 0
    out = json.loads(capsys.readouterr().out)
    # declaration order b,a is re-ordered topologically to a,b
    assert out["plan"]["f"]["transform_order"] == ["a", "b"]

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({
        "processing_mode": "full",
        "dataflows": [{
            "name": "f",
            "sources": [{"name": "s", "path": "/x", "format": "parquet"}],
            "transformations": [{"name": "t", "type": "filter",
                                 "params": {"input": "NOPE", "condition": "1=1"}}],
            "sinks": [{"name": "o", "input": "t", "path": "/tmp/o",
                       "format": "parquet"}],
        }],
    }))
    assert main(["--metadata", str(bad), "--dry-run"]) == 1
    assert "NOPE" in capsys.readouterr().out


def test_text_dedup_transform_modes(spark, tmp_path):
    """Metadata-declared corpus dedup: exact and keep_best modes through
    the engine (same operators the query surface certifies)."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "aug", "type": "sql",
             "params": {"statement":
                        "SELECT doc_id, text FROM documents "
                        "UNION ALL "
                        "SELECT doc_id + 10000, text || ' extra' "
                        "FROM documents WHERE doc_id < 10"}},
            {"name": "canon", "type": "text_dedup",
             "params": {"input": "aug", "mode": "keep_best",
                        "jaccardThreshold": 0.7}},
        ],
        sink_input="canon",
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    base = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(ids) < base + 10  # some dup groups collapsed
    assert len(ids) > 0


def test_text_dedup_exact_transform(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "dup", "type": "sql",
             "params": {"statement":
                        "SELECT doc_id, text FROM documents "
                        "UNION ALL SELECT doc_id + 10000, text FROM documents"}},
            {"name": "uniq", "type": "text_dedup",
             "params": {"input": "dup", "mode": "exact"}},
        ],
        sink_input="uniq",
    )
    # exact copies collapse: every surviving fingerprint is unique and the
    # survivor is the lowest id (original, not +10000) except null texts
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == len(set(ids))
    assert all(i < 10000 for i in ids)


def test_text_analyze_transform(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "ent", "type": "text_analyze",
             "params": {"input": "documents", "mode": "entropy"}},
        ],
        sink_input="ent",
    )
    assert set(out.columns) == {"doc_id", "n_bigrams", "n_distinct",
                                "entropy_bits"}
    assert out.count() == spark.read.parquet(f"{SF}/documents.parquet").count()


def test_embedding_dedup_transform_modes(spark, tmp_path):
    """embedding_dedup transform: 'pairs' emits verified cosine pairs,
    'dedup' removes the higher-id member of each pair — the declarative
    form of the candidates→verify near-dup path."""
    from metadata_driven_data_pipeline_spark.operators import dedup as dd

    src = [{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
            "format": "parquet"}]
    pairs_out = _run(
        spark,
        str(tmp_path / "p"),
        sources=src,
        transformations=[
            {"name": "pairs", "type": "embedding_dedup",
             "params": {"input": "embeddings", "mode": "pairs",
                        "threshold": 0.8, "dim": 64}},
        ],
        sink_input="pairs",
    )
    assert set(pairs_out.columns) == {"id_a", "id_b", "cosine"}
    got = {(r["id_a"], r["id_b"]) for r in pairs_out.collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    truth = {
        (r["id_a"], r["id_b"])
        for r in dd._verify_all_pairs(emb, threshold=0.8).collect()
    }
    assert got == truth  # recall 1.0 + exact precision through the engine

    dedup_out = _run(
        spark,
        str(tmp_path / "d"),
        sources=src,
        transformations=[
            {"name": "survivors", "type": "embedding_dedup",
             "params": {"input": "embeddings", "mode": "dedup",
                        "threshold": 0.8, "dim": 64}},
        ],
        sink_input="survivors",
    )
    survivor_ids = {r["vec_id"] for r in dedup_out.select("vec_id").collect()}
    losers = {b for _, b in truth}
    assert survivor_ids == (
        {r["vec_id"] for r in emb.select("vec_id").collect()} - losers
    )


def test_text_dedup_xxhash_lane_via_metadata(spark, tmp_path):
    """hashFn is drivable from the metadata document (production lane)."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "deduped", "type": "text_dedup",
             "params": {"input": "documents", "mode": "minhash",
                        "hashFn": "xxhash64"}},
        ],
        sink_input="deduped",
    )
    assert 0 < out.count() <= spark.read.parquet(
        f"{SF}/documents.parquet"
    ).count()


def test_span_and_incremental_dedup_transforms(spark, tmp_path):
    """Round-3 curation modes through the engine: span-granular dedup and
    batch-vs-index incremental dedup declared in metadata."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "spans", "type": "text_dedup",
             "params": {"input": "documents", "mode": "span",
                        "spanTokens": 16}},
        ],
        sink_input="spans",
    )
    assert {"doc_id", "n_spans", "n_kept", "dedup_text"} <= set(out.columns)
    assert out.count() == spark.read.parquet(f"{SF}/documents.parquet").count()

    out2 = _run(
        spark,
        str(tmp_path / "inc"),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "seen", "type": "sql",
             "params": {"statement":
                        "SELECT md5(regexp_replace(trim(lower(text)), "
                        "'\\\\s+', ' ')) AS fingerprint "
                        "FROM documents WHERE doc_id < 250"}},
            {"name": "batch", "type": "sql",
             "params": {"statement":
                        "SELECT doc_id, text FROM documents"}},
            {"name": "fresh", "type": "text_dedup",
             "params": {"input": "batch", "mode": "incremental",
                        "indexInput": "seen"}},
        ],
        sink_input="fresh",
    )
    ids = {r["doc_id"] for r in out2.select("doc_id").collect()}
    assert ids and all(i >= 250 for i in ids)  # indexed docs all dropped

    # minhash_incremental needs a signature table as indexInput; drive it
    # directly through the transform registry with a prepared catalog
    from metadata_driven_data_pipeline_spark.operators import dedup as DD
    from metadata_driven_data_pipeline_spark.operators.relational import (
        TRANSFORM_TYPES,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    catalog = {
        "batch": docs.filter("doc_id >= 250").select("doc_id", "text")
        .unionByName(
            docs.filter("doc_id < 20")
            .selectExpr("doc_id + 10000 AS doc_id", "text")
        ),
        "sigs": DD.minhash_index(
            docs.filter("doc_id < 250").select("doc_id", "text")
        ),
    }
    res = TRANSFORM_TYPES["text_dedup"](
        catalog,
        {"input": "batch", "mode": "minhash_incremental",
         "indexInput": "sigs"},
        {"name": "fresh"},
    )["fresh"]
    ids3 = {r["doc_id"] for r in res.select("doc_id").collect()}
    DD.release_persisted()
    # exact copies of indexed docs agree on every minhash component ->
    # all +10000 rows dropped by the sketch probe; originals survive
    assert ids3 and all(i < 10000 for i in ids3)


def test_gopher_and_classifier_transforms(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "gated", "type": "text_analyze",
             "params": {"input": "documents", "mode": "gopher",
                        # distinct-stopword rule (Rae A1.1): the word-soup
                        # testdata carries only 'the' from the list
                        "minWords": 30, "minStopwordHits": 1}},
            {"name": "kept", "type": "filter",
             "params": {"input": "gated", "condition": "gopher_keep"}},
            {"name": "scored", "type": "text_analyze",
             "params": {"input": "kept", "mode": "classifier",
                        "weights": [0.5, -0.5, 0.25, -0.25],
                        "threshold": -1.0}},
        ],
        sink_input="scored",
    )
    assert {"logit", "keep", "gopher_keep"} <= set(out.columns)
    assert 0 < out.count() <= 500


def test_domain_mix_and_corpus_diff_transforms(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "mixed", "type": "sample",
             "params": {"input": "documents", "mode": "domain_mix",
                        "keyCol": "doc_id", "domainCol": "source",
                        "weights": {"src0": 0.5, "src1": 0.5}}},
            {"name": "diff", "type": "corpus_diff",
             "params": {"input": "mixed", "oldInput": "documents"}},
        ],
        sink_input="diff",
    )
    statuses = {r["status"] for r in out.select("status").distinct().collect()}
    # mixed is a subset of documents: nothing added/changed, some removed
    assert "removed" in statuses and statuses <= {"removed", "unchanged"}


def test_embedding_index_transform_modes(spark, tmp_path):
    """The index-build ladder (SQ8 / PQ / IVF cells) declared in metadata."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "sq", "type": "embedding_index",
             "params": {"input": "embeddings", "mode": "quantize"}},
        ],
        sink_input="sq",
    )
    assert {"vec_id", "scale", "codes"} <= set(out.columns)

    out2 = _run(
        spark,
        str(tmp_path / "pq"),
        sources=[{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "pq", "type": "embedding_index",
             "params": {"input": "embeddings", "mode": "pq_encode",
                        "dim": 64, "m": 8, "trainK": 8, "iters": 1}},
        ],
        sink_input="pq",
    )
    rows = out2.collect()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["codes"])

    out3 = _run(
        spark,
        str(tmp_path / "ivf"),
        sources=[{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "cells", "type": "embedding_index",
             "params": {"input": "embeddings", "mode": "ivf_build",
                        "dim": 64, "nCells": 8}},
            {"name": "cell_counts", "type": "sql",
             "params": {"statement":
                        "SELECT __cell, COUNT(*) AS n FROM cells "
                        "GROUP BY __cell"}},
        ],
        sink_input="cell_counts",
    )
    cells = {r["__cell"] for r in out3.collect()}
    assert cells <= set(range(8)) and len(cells) > 1


def test_vocab_and_encode_transforms(spark, tmp_path):
    """Declarative tokenize-to-ids: vocabulary build + id encoding chained
    in metadata."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "vocab", "type": "text_analyze",
             "params": {"input": "documents", "mode": "vocab",
                        "minCount": 3}},
            {"name": "encoded", "type": "text_analyze",
             "params": {"input": "documents", "mode": "encode",
                        "vocabInput": "vocab"}},
        ],
        sink_input="encoded",
    )
    rows = out.collect()
    assert len(rows) == 500
    assert all(r["n_tokens"] == len(r["ids"]) for r in rows)
    assert all(r["n_unk"] <= r["n_tokens"] for r in rows)


def test_keyword_search_transform(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "hits", "type": "text_analyze",
             "params": {"input": "documents", "mode": "search",
                        "terms": ["spark", "table"], "k": 5}},
        ],
        sink_input="hits",
    )
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert 0 < len(rows) <= 5
    assert all(r["score"] > 0 for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_corpus_prep_example_runs_end_to_end(spark, tmp_path, monkeypatch):
    """The shipped examples/corpus_prep.json must actually run: env
    substitution, every declared transform chain, and all five sinks
    producing output (guards example drift — e.g. the corrected Gopher
    stopword rule would have silently emptied the pipeline without its
    minStopwordHits override)."""
    import os as _os

    from metadata_driven_data_pipeline_spark.config import load_metadata
    from metadata_driven_data_pipeline_spark.engine import Engine

    monkeypatch.setenv("DATA_ROOT", str(tmp_path))
    monkeypatch.setenv("TESTDATA", SF)
    metadata = load_metadata("examples/corpus_prep.json")
    Engine(
        spark, metadata, run_id="example-smoke",
        manifest_path=str(tmp_path / "manifest.json"),
    ).run()
    for sink in ("chunks", "splits", "diversity", "span_clean"):
        out = spark.read.parquet(str(tmp_path / sink))
        assert out.count() > 0, f"sink {sink} empty"
    # semantic near-dup pairs: random sf0.001 embeddings legitimately may
    # have none above threshold — assert the sink wrote with the right
    # schema rather than a row floor
    dup = spark.read.parquet(str(tmp_path / "dup_pairs"))
    assert set(dup.columns) == {"cluster_id", "id_a", "id_b", "cosine"}


def test_profile_and_drift_transforms(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "old", "type": "sql",
             "params": {"statement":
                        "SELECT doc_id, lang, n_chars FROM documents "
                        "WHERE doc_id % 2 = 0"}},
            {"name": "new", "type": "sql",
             "params": {"statement":
                        "SELECT doc_id, lang, "
                        "CASE WHEN doc_id % 5 = 0 THEN NULL "
                        "ELSE n_chars END AS n_chars FROM documents"}},
            {"name": "report", "type": "profile",
             "params": {"input": "new", "mode": "drift", "against": "old"}},
        ],
        sink_input="report",
    )
    rows = {r["column"]: r["status"] for r in out.collect()}
    assert rows["n_chars"] == "null_rate_drift"
    # the snapshot doubled (evens -> all): doc_id distinct count yields a
    # 1.0 relative change, correctly flagged; lang keeps its value set
    assert rows["doc_id"] == "distinct_drift"
    assert rows["lang"] == "ok"


def test_sample_per_group_and_epoch_transforms(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "per_lang", "type": "sample",
             "params": {"input": "documents", "mode": "per_group",
                        "groupCol": "lang", "k": 7, "keyCol": "doc_id"}},
            {"name": "ordered", "type": "sample",
             "params": {"input": "per_lang", "mode": "epoch",
                        "keyCol": "doc_id", "epoch": 2}},
        ],
        sink_input="ordered",
    )
    import pyspark.sql.functions as F

    counts = out.groupBy("lang").agg(F.count("*").alias("c")).collect()
    assert all(r["c"] <= 7 for r in counts)
    n = out.count()
    positions = sorted(r["position"] for r in out.select("position").collect())
    assert positions == list(range(1, n + 1))


def test_zorder_sink_option(spark, tmp_path):
    import os as _os

    import pyspark.sql.functions as F

    meta = {
        "processing_mode": "full",
        "dataflows": [{
            "name": "zflow",
            "sources": [{"name": "lineitem", "path": f"{SF}/lineitem.parquet",
                         "format": "parquet"}],
            "transformations": [
                {"name": "keys", "type": "select",
                 "params": {"input": "lineitem",
                            "columns": ["l_orderkey", "l_partkey",
                                        "l_suppkey"]}},
            ],
            "sinks": [{
                "name": "zout", "input": "keys",
                "path": str(tmp_path / "zout"), "format": "parquet",
                "zorderBy": ["l_partkey", "l_suppkey"],
                "zorderBits": 8, "zorderFiles": 8,
            }],
        }],
    }
    log = Engine(spark, meta, run_id="z-1").run()
    assert log["status"] == "success"
    files = [f for f in _os.listdir(str(tmp_path / "zout"))
             if f.endswith(".parquet")]
    assert 1 <= len(files) <= 8
    back = spark.read.parquet(str(tmp_path / "zout"))
    orig = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert back.count() == orig.count()
    assert (back.agg(F.sum("l_partkey")).collect()[0][0]
            == orig.agg(F.sum("l_partkey")).collect()[0][0])


def test_sketch_transform_hll_roundtrip(spark, tmp_path):
    """Declarative incremental-distinct: shard sketches built and merged
    through the Engine; the estimate must equal the exact distinct (the
    sf0.001 cardinality is far below 2^12 — HLL sparse mode is exact)."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "events", "path": f"{SF}/events.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "shards", "type": "sketch",
             "params": {"input": "events", "mode": "hll_shards",
                        "keyCol": "user_id", "shardCol": "event_type"}},
            {"name": "est", "type": "sketch",
             "params": {"input": "shards", "mode": "hll_estimate"}},
        ],
        sink_input="est",
    )
    row = out.collect()[0]
    exact = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert row.est == exact


def test_sketch_transform_cms_estimate(spark, tmp_path):
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "grid", "type": "sketch",
             "params": {"input": "documents", "mode": "cms_build",
                        "width": 512}},
            {"name": "freqs", "type": "sketch",
             "params": {"input": "grid", "mode": "cms_estimate",
                        "terms": ["the", "data"], "width": 512}},
        ],
        sink_input="freqs",
    )
    got = {r.term: r.est for r in out.collect()}
    assert set(got) == {"the", "data"} and all(v >= 0 for v in got.values())


def test_tokenize_transform_bpe(spark, tmp_path):
    """Declarative BPE: train on documents, encode with the learned
    table, both through the Engine; every doc gets an encoding row."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "merges", "type": "tokenize",
             "params": {"input": "documents", "mode": "bpe_train",
                        "nMerges": 8, "minFreq": 2}},
            {"name": "enc", "type": "tokenize",
             "params": {"input": "documents", "mode": "bpe_encode",
                        "merges": "merges"}},
        ],
        sink_input="enc",
    )
    n_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert out.count() == n_docs
    assert set(out.columns) == {"doc_id", "bpe_tokens", "n_bpe_tokens"}
    assert out.filter("n_bpe_tokens <= 0").count() == 0


def test_sketch_transform_bloom_probe(spark, tmp_path):
    """Declarative membership: build a bloom over seen-corpus doc ids,
    probe the whole corpus through the Engine — every seen key must be
    maybe_seen (no false negatives)."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "seen", "type": "filter",
             "params": {"input": "documents",
                        "condition": "doc_id % 2 = 0"}},
            {"name": "bloom", "type": "sketch",
             "params": {"input": "seen", "mode": "bloom_build",
                        "keyCol": "doc_id", "mBits": 65536}},
            {"name": "probed", "type": "sketch",
             "params": {"input": "documents", "mode": "bloom_probe",
                        "keyCol": "doc_id", "bloom": "bloom",
                        "mBits": 65536}},
        ],
        sink_input="probed",
    )
    rows = out.collect()
    misses = [r for r in rows if r.doc_id % 2 == 0 and not r.maybe_seen]
    assert misses == []


def test_sketch_transform_qhist_quantiles(spark, tmp_path):
    """Declarative mergeable quantiles: shard grids → merge → P50
    through the Engine, within one bin width of exact."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "orders", "path": f"{SF}/orders.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "grids", "type": "sketch",
             "params": {"input": "orders", "mode": "qhist_shards",
                        "valueCol": "o_totalprice",
                        "shardCol": "o_orderpriority",
                        "lo": 0.0, "hi": 600000.0, "bins": 600}},
            {"name": "grid", "type": "sketch",
             "params": {"input": "grids", "mode": "qhist_merge"}},
            {"name": "p50", "type": "sketch",
             "params": {"input": "grid", "mode": "qhist_quantiles",
                        "qs": [0.5], "lo": 0.0, "hi": 600000.0,
                        "bins": 600}},
        ],
        sink_input="p50",
    )
    est = out.collect()[0].est
    exact = duckdb.connect().execute(
        "SELECT quantile_cont(o_totalprice, 0.5) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) <= 1000.0


def test_secondary_input_orders_transform_dag(spark, tmp_path):
    """Regression: params that name a second relation (bloom here, also
    oldInput/merges) must count as DAG edges — the consumer is declared
    FIRST and still has to run after its producer."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "probed", "type": "sketch",
             "params": {"input": "documents", "mode": "bloom_probe",
                        "keyCol": "doc_id", "bloom": "bloom",
                        "mBits": 65536}},
            {"name": "bloom", "type": "sketch",
             "params": {"input": "documents", "mode": "bloom_build",
                        "keyCol": "doc_id", "mBits": 65536}},
        ],
        sink_input="probed",
    )
    rows = out.collect()
    assert rows and all(r.maybe_seen for r in rows)


def test_embedding_index_pca_transform(spark, tmp_path):
    """Declarative PCA: reduce embeddings to 4 dims through the Engine."""
    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "embeddings", "path": f"{SF}/embeddings.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "reduced", "type": "embedding_index",
             "params": {"input": "embeddings", "mode": "pca",
                        "nComponents": 4}},
        ],
        sink_input="reduced",
    )
    rows = out.collect()
    assert rows and all(len(r.pca) == 4 for r in rows)


def test_dsir_sample_transforms(spark, tmp_path):
    """Declarative DSIR: weight the corpus against a target relation and
    select the Gumbel top-k, all driven from metadata."""
    import pyspark.sql.functions as F

    out = _run(
        spark,
        str(tmp_path),
        sources=[{"name": "documents", "path": f"{SF}/documents.parquet",
                  "format": "parquet"}],
        transformations=[
            {"name": "target", "type": "sql",
             "params": {"statement":
                        "SELECT * FROM documents WHERE source = 'src0'"}},
            {"name": "weighted", "type": "sample",
             "params": {"input": "documents", "mode": "dsir_weights",
                        "target": "target", "buckets": 4096}},
            {"name": "selected", "type": "sample",
             "params": {"input": "documents", "mode": "dsir",
                        "target": "target", "k": 25, "buckets": 4096}},
        ],
        sink_input="selected",
    )
    assert out.count() == 25
    assert set(out.columns) == {"doc_id", "weight", "gumbel_key"}
    # library-level equivalence: the declarative lane must reproduce the
    # direct operator call exactly
    from metadata_driven_data_pipeline_spark.operators import dsir as DS

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = DS.dsir_topk(
        docs, docs.filter(F.col("source") == "src0"), k=25, buckets=4096
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in want.collect()
    )
