"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` UDFs. The
actual codec step is STUBBED (image/audio libraries are not in this
container): ``decode_stub`` produces a deterministic fake feature vector
from the bytes, so the Spark-side plumbing — schema, batching, partitioning,
UDF signature — is real and tested while the codec is swappable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, features array<float>"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload column from the text (stand-in
    for real image/audio bytes) plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            F.length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode + feature extract': 8 floats from the
    sha256 of the payload. A real deployment swaps this for PIL/librosa/
    ffmpeg decode; everything around it is unchanged.
    """
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:FEATURE_DIM * 4], dtype=np.uint32).astype(np.float32) / np.float32(2**32)


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return with_payload.mapInPandas(fn, schema=FEATURES_SCHEMA)


def decode_real(payload: bytes, media_type: str):
    """Placeholder for the real codec path."""
    raise NotImplementedError(
        "real image/audio/video decoding requires codec libraries not "
        "available in this environment; use _fake_decode for plumbing tests"
    )
