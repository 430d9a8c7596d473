"""Multimodal column plumbing: image/audio/video as opaque binary columns.

LLM-pipeline extension surface (not in the reference). The contract:

- modality payloads are ``binary`` columns + a typed metadata struct
  (mime_type, width/height/duration, codec, ...);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators so payload bytes stay columnar end-to-end and
  each task processes a batch, not a row;
- the actual codec work is STUBBED: this container ships no image/audio
  libraries, so decoders raise ``NotImplementedError`` unless
  ``fake=True`` (deterministic fake features for plumbing tests). The
  Spark-side shapes — schema, batching, partitioning — are real and tested.

Scale notes: binary payloads dominate row size; keep
``spark.sql.files.maxPartitionBytes`` sized so a task's Arrow batch of
payloads fits executor memory, and project metadata-only columns for any
filtering BEFORE the decode stage so pushdown skips undecodable rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime_type", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': md5-seeded feature vector. Stands in
    for a real image/audio encoder so plumbing is testable in-container."""
    out = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def extract_features(
    df: DataFrame,
    dim: int = 16,
    fake: bool = False,
    batch_note: dict[str, Any] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=False`` raises NotImplementedError per batch (no codec libs in
    this container — clearly-marked stub); ``fake=True`` produces
    deterministic md5-derived vectors exercising the exact same plumbing
    (schema, batch iteration, null payloads)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_note is not None:
                batch_note["batches"] = batch_note.get("batches", 0) + 1
            if not fake:
                raise NotImplementedError(
                    "Real media decode requires image/audio codecs not present "
                    "in this environment; run with fake=True for plumbing tests"
                )
            feats = []
            status = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    status.append("null_payload")
                else:
                    feats.append(_fake_feature(bytes(payload), dim))
                    status.append("ok")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame.

    Real implementation needs a video codec; the fake path emits
    ``duration_ms / every_ms`` deterministic frame fingerprints so the
    row-expansion shape (1 row in → N rows out via mapInPandas) is tested.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_fingerprint", T.StringType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "Real frame sampling requires a video codec; "
                    "run with fake=True for plumbing tests"
                )
            rows = {"media_id": [], "frame_idx": [], "frame_fingerprint": []}
            for _, row in pdf.iterrows():
                duration = (row["meta"] or {}).get("duration_ms") or 0
                payload = row["payload"] or b""
                payload_md5 = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(max(0, duration // every_ms)):
                    rows["media_id"].append(row["media_id"])
                    rows["frame_idx"].append(i)
                    # md5(md5(payload) || ':' || i): deterministic AND
                    # reproducible from ANSI SQL (string concat, no
                    # byte-order dependence) for the oracle harness
                    rows["frame_fingerprint"].append(
                        hashlib.md5(f"{payload_md5}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub — raises until a codec is available (documented
    stub per task spec; the operator registration and signature are the
    deliverable)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "Image resize requires an image codec not present in this environment"
        )
        yield  # pragma: no cover

    return df.mapInPandas(op, MEDIA_SCHEMA)
