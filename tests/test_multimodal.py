"""Multimodal binary-column plumbing (decode stubbed per task spec)."""

import pytest
from pyspark.sql import Row

from metadata_driven_data_pipeline_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, payload=b"\x89PNG fake bytes 1",
            meta=Row(mime_type="image/png", width=64, height=64, duration_ms=None)),
        Row(media_id=2, payload=b"RIFF fake wav",
            meta=Row(mime_type="audio/wav", width=None, height=None, duration_ms=3500)),
        Row(media_id=3, payload=None,
            meta=Row(mime_type="image/png", width=8, height=8, duration_ms=None)),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_feature_extract_fake_path(spark, media):
    out = M.extract_features(media, dim=16, fake=True).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["feature"]) == 16
    assert by_id[1]["decode_status"] == "ok"
    assert by_id[3]["feature"] is None and by_id[3]["decode_status"] == "null_payload"
    # deterministic
    again = {r["media_id"]: r for r in M.extract_features(media, dim=16, fake=True).collect()}
    assert again[1]["feature"] == by_id[1]["feature"]


def test_feature_extract_real_path_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        M.extract_features(media, fake=False).collect()


def test_frame_sample_row_expansion(spark, media):
    out = M.frame_sample(media, every_ms=1000, fake=True).collect()
    # only media 2 has duration (3500ms) -> 3 frames
    assert len(out) == 3
    assert {r["frame_idx"] for r in out} == {0, 1, 2}
    assert all(r["media_id"] == 2 for r in out)


def test_resize_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        M.resize_images(media, 32, 32).collect()


def test_binaryfile_source_through_engine_to_features(spark, tmp_path):
    """Multimodal ingestion end-to-end: raw media files on disk → engine
    binaryFile source (path/length metadata + content) → Arrow-batched
    feature extraction. Completes the binary-column story from ingestion
    rather than from a pre-built DataFrame."""
    import os

    from pyspark.sql import functions as F

    from metadata_driven_data_pipeline_spark.operators.multimodal import (
        extract_features,
    )
    from metadata_driven_data_pipeline_spark.sources.reader import read_source

    media = tmp_path / "media"
    os.makedirs(media)
    (media / "a.bin").write_bytes(b"\x00\x01\x02payload-a" * 10)
    (media / "b.bin").write_bytes(b"payload-b" * 3)

    res = read_source(
        spark,
        {"name": "media", "path": str(media), "format": "binaryFile"},
    )
    assert res.status == "success"
    df = res.df.select(
        F.xxhash64("path").alias("media_id"),
        F.col("length"),
        F.col("content").alias("payload"),
    )
    out = extract_features(df.select("media_id", "payload"), dim=8, fake=True)
    rows = out.collect()
    assert len(rows) == 2
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["decode_status"] == "ok" for r in rows)
    # deterministic: same bytes -> same features on re-read
    out2 = extract_features(
        read_source(
            spark, {"name": "media", "path": str(media), "format": "binaryFile"}
        ).df.select(F.xxhash64("path").alias("media_id"), F.col("content").alias("payload")),
        dim=8,
        fake=True,
    ).collect()
    assert {tuple(r["feature"]) for r in rows} == {tuple(r["feature"]) for r in out2}


def test_real_decoder_gating():
    """_real_decoder returns a callable only when an optional codec library
    (Pillow / soundfile) imports; in this container neither exists, which
    is exactly the documented stub regime."""
    from metadata_driven_data_pipeline_spark.operators.multimodal import (
        _real_decoder,
    )

    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    try:
        import soundfile  # noqa: F401
        has_sf = True
    except ImportError:
        has_sf = False

    decoder = _real_decoder(16)
    if has_pil or has_sf:
        assert callable(decoder)
        assert decoder(b"not-a-real-image") is None  # undecodable → None
    else:
        assert decoder is None
