"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container — ``decode_image`` raises unless a deterministic fake is
requested), but everything Spark-side is real and tested: schema, Arrow
batch shaping, size-aware partitioning, mapInPandas signatures, and the
feature-extraction contract. Swapping the fake for PIL/ffmpeg is a one-
function change on a real cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("payload", T.BinaryType(), False),   # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("digest", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def synthetic_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rows = []
            for i in ids:
                kind = ("image", "audio", "video")[int(i) % 3]
                payload = (int(i) * 2654435761 % (1 << 32)).to_bytes(4, "big") \
                    * (16 + int(i) % 48)
                rows.append((int(i), kind, payload,
                             64 + int(i) % 64 if kind == "image" else None,
                             64 + int(i) % 32 if kind == "image" else None,
                             1000 + int(i) % 9000 if kind != "image" else None))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return spark.range(n).mapInPandas(_gen, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    STUB: real decode needs an image library absent from this container.
    ``fake=True`` returns a deterministic pseudo-decode (seeded from the
    payload digest) with the same shape contract, so the downstream plumbing
    is fully exercisable in tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this environment); "
            "pass fake=True for the deterministic test decoder")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, fake_decode: bool = True,
                     feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: per-batch decode → pooled feature.

    The Arrow batch shape matters at scale: payloads are large, so batches
    are bounded by bytes not rows — callers should set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep
    rows × payload ≤ executor Arrow budget (documented contract).
    """
    def _extract(batches):
        for pdf in batches:
            feats = []
            digs = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload)
                digs.append(hashlib.sha256(b).hexdigest())
                if kind == "image":
                    arr = decode_image(b, fake=fake_decode)
                    f8 = arr.reshape(-1, 3).mean(axis=0)
                    feat = np.resize(f8.astype(np.float32), feat_dim)
                else:
                    # audio/video: byte-histogram pooling (deterministic)
                    h = np.bincount(np.frombuffer(b, dtype=np.uint8),
                                    minlength=256).astype(np.float32)
                    feat = h.reshape(feat_dim, -1).sum(axis=1)
                    feat = feat / max(float(feat.sum()), 1.0)
                feats.append(feat.astype(np.float32))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "digest": digs,
                "feature": feats,
            })

    return media.mapInPandas(_extract, FEATURE_SCHEMA)
