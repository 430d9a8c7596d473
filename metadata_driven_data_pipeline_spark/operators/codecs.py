"""Pure-stdlib media codecs: PNG (zlib/struct) and WAV (wave).

This container ships no third-party codec libraries (Pillow, soundfile),
but PNG and WAV are simple enough that the standard library covers them —
which turns the multimodal operators' decode stage from a documented stub
into real bytes→pixels/samples work that runs (and is tested) in-sandbox:

- :func:`png_decode` / :func:`png_encode` — 8-bit gray/gray+alpha/RGB/RGBA,
  non-interlaced PNGs; all five scanline filter types (None/Sub/Up/
  Average/Paeth) are un-applied on decode, encode writes filter 0 rows
  through one ``zlib`` stream.
- :func:`wav_decode` / :func:`wav_encode` — PCM WAV via the ``wave``
  module; 8/16/32-bit widths normalized to float in [-1, 1].
- :func:`avi_decode` / :func:`avi_encode` — uncompressed-DIB AVI via a
  plain RIFF chunk walk (``struct`` only): frame blobs + fps metadata,
  enough for real video frame sampling without a codec library.

Decoders return ``None`` for anything they don't understand (wrong magic,
unsupported bit depth, truncated stream) — callers map that to a
``decode_error`` status, never an exception. numpy is used for pixel
arrays (baked into the environment); everything else is stdlib.

These back the fallback lane of ``operators/multimodal.py``'s
``extract_features`` / ``resize_images``: Pillow/soundfile are preferred
when importable (broader format coverage), the stdlib lane otherwise.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray | None:
    """Reverse PNG scanline filtering -> (height, width*channels) uint8."""
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        return None
    bpp = channels  # 8-bit depth: bytes per pixel == channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int32)
        pos += stride + 1
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x
            cur = row
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = row
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def png_decode(payload: bytes) -> np.ndarray | None:
    """Decode an 8-bit non-interlaced PNG to ``(H, W, channels)`` uint8,
    or None if the payload is not such a PNG."""
    if not payload.startswith(_PNG_SIG):
        return None
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            length, typ = struct.unpack(">I4s", payload[pos : pos + 8])
            pos += 8
            data = payload[pos : pos + length]
            if len(data) < length:
                return None
            pos += length + 4  # skip CRC
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif typ == b"IDAT":
                idat.extend(data)
            elif typ == b"IEND":
                break
        if ihdr is None or not idat:
            return None
        width, height, depth, color, comp, filt, interlace = ihdr
        channels = _CHANNELS.get(color)
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or channels is None:
            return None
        if width == 0 or height == 0:
            return None
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    grid = _unfilter(raw, width, height, channels)
    if grid is None:
        return None
    return grid.reshape(height, width, channels)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode ``(H, W)`` gray or ``(H, W, {1,2,3,4})`` uint8 pixels as a
    non-interlaced 8-bit PNG (filter 0 scanlines, one zlib stream)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride_rows = [b"\x00" + arr[y].tobytes() for y in range(height)]
    idat = zlib.compress(b"".join(stride_rows), 6)
    return b"".join(
        [_PNG_SIG, _chunk(b"IHDR", ihdr), _chunk(b"IDAT", idat), _chunk(b"IEND", b"")]
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of ``(H, W, C)`` pixels to (height, width).
    Standard block-center mapping: src = floor((dst + 0.5) · src_len /
    dst_len), clipped — deterministic, no interpolation arithmetic."""
    src_h, src_w = pixels.shape[:2]
    ys = np.clip(
        np.floor((np.arange(height) + 0.5) * src_h / height), 0, src_h - 1
    ).astype(np.int64)
    xs = np.clip(
        np.floor((np.arange(width) + 0.5) * src_w / width), 0, src_w - 1
    ).astype(np.int64)
    return pixels[ys][:, xs]


def wav_decode(payload: bytes, max_frames: int | None = None) -> np.ndarray | None:
    """Decode a PCM WAV payload to float64 samples of channel 0 in
    [-1, 1] (first ``max_frames`` frames), or None if not a readable WAV."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            n_channels = wf.getnchannels()
            sampwidth = wf.getsampwidth()
            n = wf.getnframes() if max_frames is None else min(
                wf.getnframes(), max_frames
            )
            frames = wf.readframes(n)
    except (wave.Error, EOFError, struct.error):
        return None
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
    if dtype is None:
        return None
    data = np.frombuffer(frames, dtype=dtype)
    if n_channels > 1:
        data = data[: (len(data) // n_channels) * n_channels]
        data = data.reshape(-1, n_channels)[:, 0]
    if sampwidth == 1:  # 8-bit WAV is unsigned
        return (data.astype(np.float64) - 128.0) / 128.0
    scale = float(2 ** (8 * sampwidth - 1))
    return data.astype(np.float64) / scale


def wav_encode(
    samples: np.ndarray, framerate: int = 16000, sampwidth: int = 2
) -> bytes:
    """Encode float samples in [-1, 1] as mono PCM WAV (16-bit default)."""
    arr = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 2:
        pcm = np.round(arr * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 4:
        pcm = np.round(arr * 2147483647.0).astype("<i4").tobytes()
    else:
        raise ValueError("sampwidth must be 2 or 4")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(framerate)
        wf.writeframes(pcm)
    return buf.getvalue()


# --- AVI (RIFF) with uncompressed DIB frames --------------------------------

def avi_decode(payload: bytes, max_frames: int | None = None) -> dict | None:
    """Parse an uncompressed-DIB AVI (RIFF container): returns
    ``{"width", "height", "us_per_frame", "n_frames", "frames": [bytes]}``
    with raw frame byte blobs from the ``00db`` movi chunks, or None for
    anything that is not such an AVI. Compressed codecs (``00dc`` with a
    non-DIB fourcc) are rejected — no codec work here, just the RIFF walk.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    width = height = us_per_frame = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> bool:
        nonlocal width, height, us_per_frame
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = pos + 8
            if body + size > len(buf):
                return False
            if fourcc == b"LIST":
                walk(buf, body + 4, body + size)
            elif fourcc == b"avih" and size >= 40:
                us_per_frame, = struct.unpack("<I", buf[body : body + 4])
                width, height = struct.unpack(
                    "<II", buf[body + 32 : body + 40]
                )
            elif fourcc in (b"00db", b"00dc"):
                if max_frames is None or len(frames) < max_frames:
                    frames.append(buf[body : body + size])
            pos = body + size + (size & 1)  # chunks are word-aligned
        return True

    try:
        if not walk(payload, 12, len(payload)):
            return None
    except struct.error:
        return None
    if width is None or us_per_frame in (None, 0) or not frames:
        return None
    return {
        "width": int(width),
        "height": int(height),
        "us_per_frame": int(us_per_frame),
        "n_frames": len(frames),
        "frames": frames,
    }


def avi_encode(
    frames: list[bytes], width: int, height: int, us_per_frame: int = 40000
) -> bytes:
    """Assemble raw frame byte blobs into a minimal uncompressed AVI
    (RIFF → hdrl(avih) → movi(00db...)). Enough container structure for
    :func:`avi_decode` and any RIFF-aware tool to walk it."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<10I", us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height
    ) + b"\x00" * 16
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00db", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
