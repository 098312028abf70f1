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


def pil_image_decoder():
    """Import-try for the real image decode path: PIL → 8×8 grayscale
    thumbnail → 64-dim float vector. Returns the decoder callable, or None
    when PIL is not installed (this container). The Spark-side plumbing is
    identical either way — a decoder is just ``fn(payload: bytes) ->
    np.ndarray(FEATURE_DIM, float32)``."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    def decode(payload: bytes) -> np.ndarray:
        img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        return (
            np.asarray(img, dtype=np.float32).reshape(FEATURE_DIM) / 255.0
        )

    return decode


def resolve_decoder(decoder=None):
    """Decoder resolution order: explicit injection → PIL (if installed) →
    None. The explicit argument is how a real decoder drops in on a
    cluster: the callable is captured by the mapInPandas closure and ships
    to executors via cloudpickle, so no module install is required on the
    workers beyond the decode library itself."""
    if decoder is not None:
        return decoder
    return pil_image_decoder()


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: seeded by the payload bytes so downstream
    operators (similarity, dedup) are exercised end-to-end without decode
    libraries."""
    seed = zlib.crc32(payload or b"")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_image(
    payload: bytes, deterministic_fake: bool = False, decoder=None
) -> np.ndarray:
    """Decode one image payload to a FEATURE_DIM vector. Resolution:
    injected/PIL decoder → the seeded fake (when ``deterministic_fake``) →
    NotImplementedError (decode libraries absent and no fake requested)."""
    fn = resolve_decoder(decoder)
    if fn is not None:
        return fn(payload)
    if deterministic_fake:
        return fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not in this container) or an "
        "injected decoder; pass deterministic_fake=True for the seeded "
        "stand-in"
    )


def frame_sample_offsets(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Video frame-sampling schedule (pure metadata math, no decode)."""
    if duration_ms <= 0:
        return []
    return list(range(0, duration_ms, every_ms))


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, decoder=None
) -> DataFrame:
    """media table → (media_id, kind, feature: array<float>, content_hash).

    ``decoder``: optional real decode callable (see ``resolve_decoder``) —
    captured by the closure and shipped to executors, so injecting one
    switches the whole stage off the fake path with no other change.

    One narrow mapInPandas stage; payload bytes never shuffle (the feature
    vector and hash are the only outputs). Partitioning note: blobs are large
    — keep spark.sql.files.maxPartitionBytes at the default 128 MB so a task
    holds only a few payloads in memory, and never .collect() this table."""

    def run(batches):
        # resolve once per task, not per payload (the PIL import-try runs
        # on the worker, where decode-library presence actually matters)
        fn = resolve_decoder(decoder)
        for pdf in batches:
            feats, hashes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if fn is not None:
                    v = fn(b)
                elif deterministic_fake:
                    v = fake_decode(b)
                else:
                    raise NotImplementedError(
                        "no image decoder available (see decode_image)"
                    )
                feats.append(np.asarray(v, dtype=np.float32).tolist())
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
