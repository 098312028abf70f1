"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
exactly as the pages table treats ``html``. The Spark-side plumbing —
schemas, Arrow batch shapes, partition sizing for large blobs, UDF
signatures — is real and tested; the actual decode step is a clearly-marked
stub (the decode libraries are not available in this container): decoding
raises ``NotImplementedError`` unless ``deterministic_fake=True``, which
produces a seeded fake feature vector derived from the payload bytes so
downstream operators (similarity, dedup) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id:bigint,kind:string,payload:binary,"
    "meta:struct<mime:string,width:int,height:int,duration_ms:int>"
)

FEATURE_DIM = 64


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: real implementation would decode via PIL/opencv (not available
    in this container). The fake path is deterministic in the payload bytes."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; pass deterministic_fake=True "
            "for the seeded stand-in"
        )
    seed = zlib.crc32(payload or b"")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def frame_sample_offsets(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Video frame-sampling schedule (pure metadata math, no decode)."""
    if duration_ms <= 0:
        return []
    return list(range(0, duration_ms, every_ms))


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """media table → (media_id, kind, feature: array<float>, content_hash).

    One narrow mapInPandas stage; payload bytes never shuffle (the feature
    vector and hash are the only outputs). Partitioning note: blobs are large
    — keep spark.sql.files.maxPartitionBytes at the default 128 MB so a task
    holds only a few payloads in memory, and never .collect() this table."""

    def run(batches):
        for pdf in batches:
            feats, hashes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                feats.append(
                    decode_image(b, deterministic_fake=deterministic_fake).tolist()
                )
                hashes.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "content_hash": hashes,
                }
            )

    return media.mapInPandas(
        run,
        schema="media_id:bigint,kind:string,feature:array<float>,content_hash:string",
    )


def synth_media_table(spark, n: int = 50, seed: int = 3):
    """Deterministic fake media table for tests (built via the Arrow
    local-data path — a plain row list goes through the separate pickle
    worker pool; see operators/graph.py)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    mids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        mids.append(i)
        kinds.append(kind)
        payloads.append(rng.integers(0, 256, size=256, dtype=np.uint8).tobytes())
        metas.append(
            {
                "mime": {
                    "image": "image/png",
                    "audio": "audio/wav",
                    "video": "video/mp4",
                }[kind],
                "width": 64 if kind == "image" else 0,
                "height": 64 if kind == "image" else 0,
                "duration_ms": 5000 if kind != "image" else 0,
            }
        )
    pdf = pd.DataFrame(
        {"media_id": mids, "kind": kinds, "payload": payloads, "meta": metas}
    )
    return spark.createDataFrame(pdf, MEDIA_SCHEMA)
