"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque ``binary`` columns with typed metadata structs —
the interleaved-document model's media spans are the source. The Spark
side (schemas, Arrow batching, mapInPandas shape, partitioning) is real
and tested; the actual codec calls are stubbed: this container has no
image/audio libraries (SURVEY.md env facts), so ``decode_image`` &c.
dispatch to a clearly-marked deterministic fake unless a real backend is
importable (Pillow seam). A cluster deployment swaps `_REAL_BACKENDS`
only — no plan shape changes.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)

FEATURE_DIM = 16

try:  # real backend seam — absent in this container
    from PIL import Image as _PIL  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _fake_decode(payload: bytes, out_dim: int = FEATURE_DIM) -> np.ndarray:
    """DETERMINISTIC FAKE decoder: derives a feature vector from the
    payload's sha256. Stands in for decode→resize→embed until a real
    codec backend is present; stable across runs and partitionings."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((out_dim * 4) // len(digest) + 1))[: out_dim * 4], np.uint32)
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def decode_image(payload: bytes, resize: tuple[int, int] = (64, 64)) -> np.ndarray:
    """Image decode+resize. Real backend when available, else explicit stub."""
    if _HAS_PIL:  # pragma: no cover - not installed here
        raise NotImplementedError("PIL backend wiring lands with a real cluster image")
    return _fake_decode(payload, resize[0] * resize[1] // 256 or FEATURE_DIM)


def extract_media_features(media: DataFrame, payload_col: str = "payload", ref_col: str = "media_ref") -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Batch shape is the contract under test: one Arrow batch in → one
    pandas frame out with a fixed-dim float feature column; payloads
    never leave the executor, no shuffle.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = [_fake_decode(p).tolist() for p in payloads]
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "media_type": "image",
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, payload_col: str = "payload", ref_col: str = "media_ref") -> DataFrame:
    """Video frame sampling plumbing: emits (media_ref, frame_idx, frame_sha).

    Frames are synthesized deterministically from the payload (stub codec:
    frame i = sha256(payload || i)); a real backend replaces the inner
    loop with actual demux/decode, same output schema.
    """
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha", T.StringType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, shas = [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                n_frames = max(1, len(payload) // 4096)
                for i in range(0, n_frames, every_n):
                    refs.append(ref)
                    idxs.append(i)
                    shas.append(hashlib.sha256(payload + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({"media_ref": refs, "frame_idx": pd.array(idxs, dtype="int32"), "frame_sha": shas})

    return media.mapInPandas(sample, schema)
