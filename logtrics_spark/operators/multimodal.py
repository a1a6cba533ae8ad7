"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages.

Decode is REAL for every format expressible with the standard library
plus numpy — netpbm P5/P6 images, uncompressed 24/32-bit BMP, and RIFF
WAV audio (PCM 8/16/24/32-bit and IEEE float) — see ``decode_image`` /
``decode_audio``.  Only codec-bound formats (PNG/JPEG/GIF, MP3/OGG/
FLAC, and all video containers) remain behind the
``NotImplementedError`` seam (``_require_decoder``): their decoders
need compression libraries not baked into this container.  The
deterministic fake decoder (``fake_decode=True``) remains for plumbing
tests and the driver oracle, whose expected features must be
closed-form.

Layout convention mirrors the token table: payloads are the "huge
column" and must be pruned out of any scan that doesn't decode
(same rule as ``tokens`` in operators/extract.py).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _require_decoder(what: str) -> None:
    """Codec-bound formats (PNG/JPEG, MP3/OGG, video containers) need a
    compression library not baked into this container."""
    raise NotImplementedError(
        f"{what} decoding requires a codec library not baked into this "
        "environment; supported container-free formats: netpbm P5/P6, "
        "uncompressed BMP, PCM/float WAV"
    )


# --------------------------------------------------------------------------
# Real decode kernels — stdlib + numpy only.  Each returns plain ndarrays so
# the Arrow-batched feature/resize stages stay vectorized per payload.
# --------------------------------------------------------------------------

def _pnm_header(p: bytes) -> tuple[list[int], int]:
    """Parse ``width height maxval`` after a P5/P6 magic, honoring
    ``#`` comments; returns (values, raster offset).  The netpbm spec
    mandates exactly one whitespace byte between maxval and raster."""
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(p) and p[pos : pos + 1].isspace():
            pos += 1
        if p[pos : pos + 1] == b"#":
            while pos < len(p) and p[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(p) and not p[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        vals.append(int(p[start:pos]))
    return vals, pos + 1


def decode_image(payload: bytes) -> np.ndarray:
    """binary payload -> (H, W, C) uint8 array.  C=1 grayscale, C=3 RGB.

    Real decode for netpbm P5 (gray) / P6 (RGB), including 16-bit
    maxval (rescaled to 8-bit), and uncompressed bottom-up or top-down
    24/32-bit BMP (BGR(A) -> RGB, 4-byte row padding stripped).
    PNG/JPEG/GIF/WebP raise the codec seam; anything else is rejected
    as unrecognized.
    """
    p = bytes(payload or b"")
    if p[:2] in (b"P5", b"P6"):
        (w, h, maxval), off = _pnm_header(p)
        ch = 1 if p[:2] == b"P5" else 3
        if w <= 0 or h <= 0 or maxval <= 0:
            raise ValueError(f"bad netpbm dimensions {w}x{h} maxval={maxval}")
        if maxval < 256:
            arr = np.frombuffer(p, np.uint8, count=w * h * ch, offset=off)
        else:  # two bytes per sample, big-endian per spec
            raw = np.frombuffer(p, ">u2", count=w * h * ch, offset=off)
            arr = (raw.astype(np.float64) * 255.0 / maxval + 0.5).astype(np.uint8)
        return arr.reshape(h, w, ch).copy()
    if p[:2] == b"BM":
        off = int.from_bytes(p[10:14], "little")
        w = int.from_bytes(p[18:22], "little", signed=True)
        h = int.from_bytes(p[22:26], "little", signed=True)
        bpp = int.from_bytes(p[28:30], "little")
        comp = int.from_bytes(p[30:34], "little")
        if comp != 0 or bpp not in (24, 32):
            raise NotImplementedError(
                f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
                f"compression={comp})"
            )
        top_down, h = h < 0, abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(p, np.uint8, count=stride * h, offset=off)
        px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        if not top_down:
            px = px[::-1]
        return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) -> RGB
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        _require_decoder("PNG")
    if p[:2] == b"\xff\xd8":
        _require_decoder("JPEG")
    if p[:4] in (b"GIF8",) or p[8:12] == b"WEBP":
        _require_decoder("GIF/WebP")
    raise NotImplementedError(
        f"unrecognized image format (magic {p[:4]!r}); supported: "
        "netpbm P5/P6, uncompressed BMP"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """binary payload -> (mono float64 samples in [-1, 1], sample_rate).

    Real decode for RIFF WAV: PCM 8/16/24/32-bit int and IEEE float32/
    float64, mono or multi-channel (channels averaged to mono), plus
    WAVE_FORMAT_EXTENSIBLE wrapping either.  Compressed codecs inside
    WAV (MP3/ADPCM/...) and non-WAV containers raise the codec seam.
    """
    p = bytes(payload or b"")
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unrecognized audio format (magic {p[:4]!r}); supported: RIFF WAV"
        )
    fmt = data = None
    pos = 12
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        body = p[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE: real tag in GUID
        audio_format = struct.unpack_from("<H", fmt, 24)[0]
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, np.uint8)
            b = b[: len(b) // 3 * 3].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
            x = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float64)
    elif audio_format == 3 and bits == 64:
        x = np.frombuffer(data, "<f8").astype(np.float64)
    else:  # 85 = MP3-in-WAV, 2/17 = ADPCM, ...
        _require_decoder(f"WAV codec (format tag {audio_format})")
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, int(rate)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 1|3) uint8 -> netpbm P5/P6 bytes (decode_image inverse)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"encode_ppm needs 1 or 3 channels, got {c}")
    magic = b"P5" if c == 1 else b"P6"
    return magic + b"\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """mono float samples in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = (np.clip(np.asarray(samples, np.float64), -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(int(rate))
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def image_feature(arr: np.ndarray, dim: int = 16) -> np.ndarray:
    """Decoded pixels -> fixed-dim descriptor: [h, w, c, mean, std,
    aspect, 8-bin luminance histogram], zero-padded/truncated to dim."""
    h, w, c = arr.shape
    x = arr.astype(np.float64) / 255.0
    if c == 3:
        luma = 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]
    else:
        luma = x[..., 0]
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    vals = [float(h), float(w), float(c), x.mean(), x.std(), w / h]
    vals += (hist / luma.size).tolist()
    out = np.zeros(dim, np.float32)
    out[: min(dim, len(vals))] = np.asarray(vals[:dim], np.float32)
    return out


def audio_feature(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Decoded samples -> fixed-dim descriptor: [duration_s, rms, peak,
    zero-crossing rate, spectral centroid (fraction of Nyquist), 8
    octave-band energy fractions], zero-padded/truncated to dim."""
    x = np.asarray(samples, np.float64)
    n = len(x)
    if n == 0:
        return np.zeros(dim, np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    power = spec * spec
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = float(power.sum())
    centroid = float((freqs * power).sum() / total / (rate / 2.0)) if total > 0 else 0.0
    # 8 octave bands up from Nyquist/256: edges double each band
    edges = (rate / 2.0) / (2.0 ** np.arange(8, -1, -1.0))
    band = np.histogram(freqs, bins=edges, weights=power)[0]
    bands = (band / total).tolist() if total > 0 else [0.0] * 8
    vals = [n / rate, rms, peak, zcr, centroid] + bands
    out = np.zeros(dim, np.float32)
    out[: min(dim, len(vals))] = np.asarray(vals[:dim], np.float32)
    return out


def _real_feature(payload: bytes, modality: str, dim: int) -> np.ndarray:
    if modality == "image":
        return image_feature(decode_image(payload), dim)
    if modality == "audio":
        samples, rate = decode_audio(payload)
        return audio_feature(samples, rate, dim)
    _require_decoder(f"{modality} (video container)")
    raise AssertionError("unreachable")


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: bytes -> seeded pseudo-embedding."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    fake_decode: bool = True,
    errors: str = "raise",
    batch_size_hint: int | None = None,
) -> DataFrame:
    """media rows -> (media_id, modality, n_bytes, feature:array<float>).

    Arrow-batched; payload bytes never surface to the driver.  With
    ``fake_decode=False`` payloads are REALLY decoded (netpbm/BMP
    images, WAV audio — see ``decode_image``/``decode_audio``); codec
    formats and video raise NotImplementedError from inside the
    executor batch (the codec-library seam).  ``errors="null"`` keeps
    undecodable rows with ``feature=NULL`` instead of failing the job —
    at fleet scale a corrupt payload must quarantine, not kill 1000
    executors; the null rows stay visible to the caller (no silent
    drop).
    """
    if errors not in ("raise", "null"):
        raise ValueError(f"errors must be 'raise' or 'null', got {errors!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats: list = []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(p) if p is not None else b""
                if fake_decode:
                    feats.append(_fake_feature(raw, dim))
                elif errors == "raise":
                    feats.append(_real_feature(raw, str(m), dim))
                else:
                    try:
                        feats.append(_real_feature(raw, str(m), dim))
                    except (NotImplementedError, ValueError):
                        feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.select("media_id", "modality", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (deterministic, pure index math)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[yi][:, xi]


def resize_images(
    df: DataFrame, width: int, height: int, errors: str = "raise"
) -> DataFrame:
    """image rows -> (media_id, payload=resized netpbm, width, height).

    Real decode -> nearest-neighbor resize -> P5/P6 re-encode, one
    Arrow batch at a time.  Output payloads round-trip through
    ``decode_image`` (tested), so resized corpora stay self-describing.
    ``errors="null"`` quarantines undecodable rows as NULL payloads.
    """
    if errors not in ("raise", "null"):
        raise ValueError(f"errors must be 'raise' or 'null', got {errors!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out_payloads: list = []
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                try:
                    out_payloads.append(
                        encode_ppm(resize_image(decode_image(raw), width, height))
                    )
                except (NotImplementedError, ValueError):
                    if errors == "raise":
                        raise
                    out_payloads.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "width": [width if p is not None else None for p in out_payloads],
                    "height": [height if p is not None else None for p in out_payloads],
                }
            )

    slim = df.where(F.col("modality") == "image").select("media_id", "payload")
    return slim.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(
    df: DataFrame, every_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """video rows -> one row per sampled frame timestamp (plumbing only).

    Frame *timestamps* come from metadata (duration_ms), so the sampling
    plan is real; frame pixel decode is behind the same stub seam.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake_decode:
                _require_decoder("video")
            # vectorized sampling plan: frame counts -> repeat ids/payloads,
            # one arange per row for timestamps.  Only the decode kernel
            # itself (the stubbed per-frame hash) stays per-frame — that is
            # the seam a real frame decoder plugs into.
            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            n_frames = -(-np.clip(dur, 0, None) // every_ms)  # ceil
            if n_frames.sum() == 0:
                continue
            ids = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            payloads = np.repeat(pdf["payload"].to_numpy(), n_frames)
            frame_ms = np.concatenate(
                [np.arange(0, d, every_ms, dtype=np.int64) for d in dur if d > 0]
            )
            feats = [
                _fake_feature((bytes(p) if p is not None else b"") + int(t).to_bytes(8, "little"), 8)
                for p, t in zip(payloads, frame_ms)
            ]
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": frame_ms, "frame_feature": feats}
            )

    slim = df.where(F.col("modality") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return slim.mapInPandas(run, out_schema)


def gen_media(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    rows = []
    rng = np.random.default_rng(seed)
    modalities = ["image", "audio", "video"]
    for i in range(n_rows):
        m = modalities[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = {
            "width": 640 if m == "image" else None,
            "height": 480 if m == "image" else None,
            "duration_ms": 3000 + (i % 7) * 500 if m in ("audio", "video") else None,
            "sample_rate": 16000 if m == "audio" else None,
        }
        rows.append((f"media{i:06d}", m, f"application/x-{m}", payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def gen_media_real(spark, n_rows: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic media table whose image/audio payloads REALLY
    decode: P6 gradient images and 16-bit PCM WAV sine tones (video
    payloads stay opaque — the codec seam).  Used by the real-decode
    tests; formulas are index-based so reruns are byte-identical."""
    rows = []
    modalities = ["image", "audio", "video"]
    rng = np.random.default_rng(seed)
    for i in range(n_rows):
        m = modalities[i % 3]
        if m == "image":
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 4
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    np.full_like(xx, (i * 37) % 256),
                ],
                axis=-1,
            ).astype(np.uint8)
            payload = encode_ppm(px)
            meta = {"width": w, "height": h, "duration_ms": None, "sample_rate": None}
        elif m == "audio":
            rate = 8000
            dur_ms = 250 + (i % 5) * 125
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            freq = 220.0 * (1 + i % 7)
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
            meta = {
                "width": None, "height": None,
                "duration_ms": dur_ms, "sample_rate": rate,
            }
        else:
            payload = bytes(rng.integers(0, 256, size=96, dtype=np.uint8))
            meta = {
                "width": None, "height": None,
                "duration_ms": 2000 + (i % 4) * 500, "sample_rate": None,
            }
        rows.append((f"media{i:06d}", m, f"application/x-{m}", payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
