"""Multimodal column plumbing: image/audio/video as opaque binary columns.

LLM-pipeline extension surface (not in the reference). The contract:

- modality payloads are ``binary`` columns + a typed metadata struct
  (mime_type, width/height/duration, codec, ...);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators so payload bytes stay columnar end-to-end and
  each task processes a batch, not a row;
- decode is REAL even in this container: Pillow / soundfile are preferred
  when importable (broad format coverage), and a pure-stdlib lane
  (``operators/codecs.py``: PNG via zlib/struct, PCM WAV via ``wave``)
  decodes actual bytes otherwise, so ``extract_features(fake=False)``,
  ``resize_images`` and ``frame_sample(fake=False)`` (uncompressed-DIB
  AVI via a stdlib RIFF walk) run end-to-end in-sandbox — no decode
  stage is environment-stubbed anymore. ``fake=True`` keeps the
  md5-derived deterministic vectors whose values an ANSI-SQL oracle can
  reproduce (real pixel math is not expressible in the DuckDB oracle).

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
    for a real image/audio encoder so plumbing is testable in-container.

    The per-digest suffix is ASCII (``:0``, ``:1`` ...) so an ANSI-SQL
    oracle can reproduce the vector with plain string concat + md5 —
    byte-level suffixes are not expressible in engines whose md5 only
    accepts VARCHAR."""
    out = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + f":{counter}".encode()).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def _image_feature(payload: bytes, dim: int) -> list[float] | None:
    """Real image decode via Pillow when it is installed: decode →
    grayscale → thumbnail to a square grid → normalized pixel intensities.
    Returns None when the payload is not a decodable image."""
    import io

    from PIL import Image  # optional dep; caller guards the import

    side = max(1, int(dim ** 0.5))
    try:
        with Image.open(io.BytesIO(payload)) as img:
            small = img.convert("L").resize((side, side))
            px = list(small.getdata())
    except Exception:
        return None
    out = [p / 255.0 for p in px]
    return (out * ((dim // len(out)) + 1))[:dim] if out else None


def _audio_feature(payload: bytes, dim: int) -> list[float] | None:
    """Real audio decode via soundfile when installed: first ``dim``
    samples of the first channel, clipped to [-1, 1]."""
    import io

    import soundfile as sf  # optional dep; caller guards the import

    try:
        data, _sr = sf.read(io.BytesIO(payload), frames=dim, always_2d=True)
    except Exception:
        return None
    col = [float(max(-1.0, min(1.0, x))) for x in data[:, 0]]
    return col + [0.0] * (dim - len(col)) if col else None


def _stdlib_image_feature(payload: bytes, dim: int) -> list[float] | None:
    """Stdlib PNG decode (operators/codecs.py): pixels → grayscale mean →
    nearest-neighbor square grid → normalized intensities. Same feature
    semantics as the Pillow lane (grayscale thumbnail grid)."""
    from metadata_driven_data_pipeline_spark.operators import codecs

    pixels = codecs.png_decode(payload)
    if pixels is None:
        return None
    gray = pixels[:, :, : min(3, pixels.shape[2])].mean(axis=2)
    side = max(1, int(dim ** 0.5))
    grid = codecs.resize_nearest(gray[:, :, None], side, side)[:, :, 0]
    out = [float(v) / 255.0 for v in grid.reshape(-1)]
    return (out * ((dim // len(out)) + 1))[:dim] if out else None


def _stdlib_audio_feature(payload: bytes, dim: int) -> list[float] | None:
    """Stdlib PCM-WAV decode (operators/codecs.py): first ``dim`` samples
    of channel 0 in [-1, 1], zero-padded — same semantics as the
    soundfile lane."""
    from metadata_driven_data_pipeline_spark.operators import codecs

    data = codecs.wav_decode(payload, max_frames=dim)
    if data is None:
        return None
    col = [float(max(-1.0, min(1.0, x))) for x in data]
    return col + [0.0] * (dim - len(col)) if col else None


def _real_decoder(dim: int):
    """Return a payload→feature callable. Pillow / soundfile are used when
    importable (broad format coverage); otherwise the pure-stdlib PNG/WAV
    codecs decode real bytes, so a decoder always exists. Payloads no lane
    understands map to None → ``decode_status='decode_error'``."""
    decoders = []
    try:
        import PIL.Image  # noqa: F401

        decoders.append(_image_feature)
    except ImportError:
        decoders.append(_stdlib_image_feature)
    try:
        import soundfile  # noqa: F401

        decoders.append(_audio_feature)
    except ImportError:
        decoders.append(_stdlib_audio_feature)

    def decode(payload: bytes) -> list[float] | None:
        for d in decoders:
            feat = d(payload, dim)
            if feat is not None:
                return feat
        return None

    return decode


def extract_features(
    df: DataFrame,
    dim: int = 16,
    fake: bool = False,
    batch_note: dict[str, Any] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=True`` produces deterministic md5-derived vectors exercising the
    exact plumbing (schema, batch iteration, null payloads) with an
    ANSI-SQL-reproducible oracle. ``fake=False`` decodes REAL bytes:
    Pillow / soundfile when importable, else the pure-stdlib PNG/WAV lane
    (``operators/codecs.py``) — payloads no lane accepts get
    ``decode_status='decode_error'``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = None if fake else _real_decoder(dim)
        for pdf in batches:
            if batch_note is not None:
                batch_note["batches"] = batch_note.get("batches", 0) + 1
            feats = []
            status = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    status.append("null_payload")
                elif fake:
                    feats.append(_fake_feature(bytes(payload), dim))
                    status.append("ok")
                else:
                    feat = real(bytes(payload))
                    feats.append(feat)
                    status.append("ok" if feat is not None else "decode_error")
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
    """Video frame sampling: one output row per sampled frame.

    ``fake=True`` emits ``duration_ms / every_ms`` deterministic
    fingerprints (ANSI-SQL-reproducible — the oracle lane) exercising the
    1 row in → N rows out ``mapInPandas`` expansion. ``fake=False``
    decodes REAL video bytes: uncompressed-DIB AVI via the stdlib RIFF
    walk (``operators/codecs.py:avi_decode``) — one frame every
    ``every_ms`` by the container's fps, fingerprint = md5 of the raw
    frame blob; payloads that aren't such an AVI yield no rows (callers
    can anti-join to find them).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_fingerprint", T.StringType(), True),
        ]
    )

    def _real_op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_driven_data_pipeline_spark.operators import codecs

        for pdf in batches:
            ids, idxs, fps = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                vid = codecs.avi_decode(bytes(payload))
                if vid is None:
                    continue
                step = max(1, int(every_ms * 1000 / vid["us_per_frame"]))
                for j, fi in enumerate(range(0, vid["n_frames"], step)):
                    ids.append(media_id)
                    idxs.append(j)
                    fps.append(hashlib.md5(vid["frames"][fi]).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_fingerprint": pd.Series(fps, dtype=object),
                }
            )

    if not fake:
        return df.mapInPandas(_real_op, out_schema)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vectorized 1→N expansion: np.repeat on the row index, one
            # concatenated arange for frame indexes; only the two md5
            # calls per row remain in Python (hashing is inherently
            # per-value)
            n_frames = np.array(
                [
                    max(0, ((m or {}).get("duration_ms") or 0) // every_ms)
                    for m in pdf["meta"]
                ],
                dtype=np.int64,
            )
            payload_md5 = [
                hashlib.md5(bytes(p) if p is not None else b"").hexdigest()
                for p in pdf["payload"]
            ]
            rep = np.repeat(np.arange(len(pdf)), n_frames)
            frame_idx = np.concatenate(
                [np.arange(n) for n in n_frames]
            ) if len(rep) else np.array([], dtype=np.int64)
            # md5(md5(payload) || ':' || i): deterministic AND reproducible
            # from ANSI SQL (string concat, no byte-order dependence)
            fingerprints = [
                hashlib.md5(f"{payload_md5[r]}:{i}".encode()).hexdigest()
                for r, i in zip(rep, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[rep],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_fingerprint": fingerprints,
                }
            )

    return df.mapInPandas(op, out_schema)


RESIZED_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields
    + [T.StructField("resize_status", T.StringType(), False)]
)


def _pillow_resizer(width: int, height: int):
    from PIL import Image  # caller guards the import
    import io

    def resize(payload: bytes) -> bytes | None:
        try:
            with Image.open(io.BytesIO(payload)) as img:
                buf = io.BytesIO()
                img.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
        except Exception:
            return None

    return resize


def _stdlib_resizer(width: int, height: int):
    from metadata_driven_data_pipeline_spark.operators import codecs

    def resize(payload: bytes) -> bytes | None:
        pixels = codecs.png_decode(payload)
        if pixels is None:
            return None
        return codecs.png_encode(codecs.resize_nearest(pixels, width, height))

    return resize


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize (decode → resize → re-encode PNG, metadata updated):
    Pillow when importable, else the pure-stdlib PNG lane
    (``operators/codecs.py``, nearest-neighbor) — real bytes either way.

    Output adds ``resize_status`` ∈ {'ok', 'null_input', 'decode_error'}
    so callers can distinguish a failed resize (payload nulled, ORIGINAL
    meta retained for forensics) from a row that was null on input —
    mirroring ``extract_features``'s ``decode_status`` contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401

            resize = _pillow_resizer(width, height)
        except ImportError:
            resize = _stdlib_resizer(width, height)

        for pdf in batches:
            payloads = []
            metas = []
            statuses = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                meta = dict(meta or {})
                if payload is None:
                    payloads.append(None)
                    metas.append(meta)
                    statuses.append("null_input")
                    continue
                resized = resize(bytes(payload))
                if resized is None:
                    payloads.append(None)
                    statuses.append("decode_error")
                else:
                    payloads.append(resized)
                    meta.update(
                        {"mime_type": "image/png", "width": width,
                         "height": height}
                    )
                    statuses.append("ok")
                metas.append(meta)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads,
                 "meta": metas, "resize_status": statuses}
            )

    return df.mapInPandas(op, RESIZED_SCHEMA)
