"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages.  The decode kernels
themselves are STUBS in this container (no image/audio libraries
baked in — see ``_require_decoder``): the Spark-side contract (schema,
partitioning, UDF signature, batch shape) is real and tested with the
deterministic fake decoder.

Layout convention mirrors the token table: payloads are the "huge
column" and must be pruned out of any scan that doesn't decode
(same rule as ``tokens`` in operators/extract.py).
"""

from __future__ import annotations

import hashlib
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
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _require_decoder(modality: str) -> None:
    """Real decoders (PIL/av/soundfile) are not in this container."""
    raise NotImplementedError(
        f"real {modality} decoding requires an image/audio library not "
        "baked into this environment; use fake_decode=True for the "
        "deterministic test decoder"
    )


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
    batch_size_hint: int | None = None,
) -> DataFrame:
    """media rows -> (media_id, modality, n_bytes, feature:array<float>).

    Arrow-batched; payload bytes never surface to the driver.  With
    fake_decode=False this raises NotImplementedError from inside the
    executor batch (the real-library seam).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake_decode:
                _require_decoder(str(pdf["modality"].iloc[0]))
            feats = [
                _fake_feature(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.select("media_id", "modality", "payload").mapInPandas(run, FEATURE_SCHEMA)


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
