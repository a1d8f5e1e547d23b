"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow ``mapInPandas``
kernels. The decode step itself is STUBBED — this container ships no
image/audio libraries — behind ``decoder=`` hooks: the default deterministic
fake parses a small self-describing header (see :func:`fake_media`), and a
real deployment injects Pillow/torchaudio/PyAV callables with the identical
batch signature. Everything Spark-side (schema, partitioning, UDF signature,
Arrow batch shape) is real and tested (tests/test_multimodal.py).

Scale notes: payloads never pass through a shuffle — metadata extraction
projects narrow columns first, and feature vectors (fixed-size float arrays)
are the only thing wide operators ever see.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

_MAGIC = b"FAKE"


def fake_media(media_id: int, kind: str = "image", width: int = 64, height: int = 48, n_frames: int = 1) -> bytes:
    """Deterministic fake payload: 4-byte magic + header + seeded bytes."""
    header = _MAGIC + struct.pack(">4sIII", kind.encode()[:4].ljust(4), width, height, n_frames)
    body_seed = blake2b(header + str(media_id).encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(body_seed, "big"))
    body = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return header + body


def _decode_header(payload: bytes) -> tuple[str, int, int, int]:
    if payload is None or len(payload) < 20 or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this container; inject a decoder via the decoder= hook"
        )
    kind, w, h, nf = struct.unpack(">4sIII", payload[4:20])
    return kind.rstrip(b"\x00").decode(), w, h, nf


def extract_media_meta(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], tuple[str, int, int, int]] = _decode_header,
) -> DataFrame:
    """binary payload -> typed metadata struct columns (Arrow-batched)."""
    src = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("_p"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                kind, w, h, nf = decoder(bytes(payload))
                rows.append((int(mid), kind, w, h, nf, len(payload)))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=MEDIA_META_SCHEMA)


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(FloatType(), False), True),
    ]
)


def media_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """payload -> fixed-dim feature vector (deterministic fake: byte-histogram
    folded to ``dim`` buckets, L2-normalized). A real deployment swaps the
    body for a model forward pass; batch shape and output schema are frozen."""
    src = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("_p"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                body = np.frombuffer(bytes(payload)[20:], dtype=np.uint8)
                hist = np.bincount(body % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm > 0 else hist).astype(np.float32))
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return src.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_nth: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for video-kind payloads: one output row per kept frame.

    The fake decoder treats the body as ``n_frames`` equal slices; a real
    deployment swaps in a container demuxer. Output is (media_id, frame_idx,
    frame_bytes) — the 1->N row shape the downstream per-frame UDFs expect.
    """
    src = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("_p"))
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_bytes", LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                kind, w, h, nf = _decode_header(bytes(payload))
                body_len = len(payload) - 20
                per = body_len // max(nf, 1)
                for i in range(0, nf, every_nth):
                    rows.append((int(mid), i, per))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return src.mapInPandas(kernel, schema=out_schema)
