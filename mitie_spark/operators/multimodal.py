"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
exactly as the pages table treats ``html``. The Spark-side plumbing —
schemas, Arrow batch shapes, partition sizing for large blobs, UDF
signatures — is real and tested. Decode is REAL for raw-container formats
(BMP/PGM/PPM/WAV via the pure-NumPy codecs in operators/media_codecs.py),
for PNG and baseline+progressive JPEG (operators/jpeg.py), for GIF incl.
animation/interlace/transparency (operators/gif.py), and for the
MP4 CONTAINER layer (operators/mp4.py: sample tables + keyframe byte
extraction; only the codec bitstream stays behind the seam), plus
anything an injected decoder or PIL handles; compressed formats
without a decoder raise ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a seeded fake feature vector
derived from the payload bytes so downstream operators (similarity, dedup)
are exercised end-to-end either way.
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

# single source of truth for the feature width — the built-in codecs pool
# to this same shape, and mixed widths inside one extract_features run
# would make downstream np.stack/cosine stages crash on ragged arrays
from mitie_spark.operators.media_codecs import FEATURE_DIM  # noqa: F401


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
    the pure-NumPy built-in codecs (BMP/PGM/PPM/PNG/JPEG/GIF/WAV —
    operators/media_codecs.py + operators/jpeg.py + operators/gif.py; real
    decode, no libraries needed). The explicit argument is how an additional decoder
    drops in on a cluster: the callable is captured by the mapInPandas
    closure and ships to executors via cloudpickle, so no module install is
    required on the workers beyond the decode library itself. The resolved
    callable raises media_codecs.UnsupportedMediaError for formats it
    cannot handle (MP4, arithmetic-coded JPEG) — per-payload
    fallback happens in ``extract_features``."""
    if decoder is not None:
        return decoder
    pil = pil_image_decoder()
    from mitie_spark.operators.media_codecs import (
        UnsupportedMediaError,
        builtin_decoder,
    )

    if pil is None:
        return builtin_decoder

    def decode(payload: bytes) -> np.ndarray:
        # raw-container formats decode bit-deterministically in NumPy;
        # compressed formats go to PIL
        try:
            return builtin_decoder(payload)
        except UnsupportedMediaError:
            return pil(payload)

    return decode


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: seeded by the payload bytes so downstream
    operators (similarity, dedup) are exercised end-to-end without decode
    libraries."""
    seed = zlib.crc32(payload or b"")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def _decode_with_policy(fn, payload: bytes, deterministic_fake: bool):
    """THE per-payload fallback policy (single-payload decode_image and the
    corpus-scale extract_features loop both route through here): an
    unsupported format or a corrupt payload (truncated PNG handed to PIL,
    malformed header in an injected decoder, ...) degrades to the seeded
    fake when ``deterministic_fake`` — one bad blob must not kill a
    corpus-scale task — and fails loudly otherwise."""
    from mitie_spark.operators.media_codecs import UnsupportedMediaError

    try:
        return fn(payload)
    except UnsupportedMediaError as e:
        if deterministic_fake:
            return fake_decode(payload)
        raise NotImplementedError(
            f"{e}; compressed formats need PIL/opencv or an injected "
            "decoder — pass deterministic_fake=True for the seeded stand-in"
        ) from e
    except Exception:
        if deterministic_fake:
            return fake_decode(payload)
        raise


def decode_image(
    payload: bytes, deterministic_fake: bool = False, decoder=None
) -> np.ndarray:
    """Decode one payload to a FEATURE_DIM vector. Resolution: injected →
    PIL → built-in NumPy codecs (BMP/PNM/WAV decode for real); an
    unsupported compressed format falls to the seeded fake (when
    ``deterministic_fake``) or raises NotImplementedError."""
    return _decode_with_policy(
        resolve_decoder(decoder), payload, deterministic_fake
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
                v = _decode_with_policy(fn, b, deterministic_fake)
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
    """Deterministic media table for tests: REAL payloads where the
    built-in codecs reach (images are actual BMP files, audio is actual
    16-bit PCM WAV — operators/media_codecs.py), plus mp4-magic video
    blobs that exercise the unsupported-format fallback. Built via the
    Arrow local-data path — a plain row list goes through the separate
    pickle worker pool; see operators/graph.py."""
    import pandas as pd

    from mitie_spark.operators.media_codecs import encode_bmp, encode_wav

    rng = np.random.default_rng(seed)
    mids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        mids.append(i)
        kinds.append(kind)
        if kind == "image":
            px = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
            payloads.append(encode_bmp(px))
        elif kind == "audio":
            t = np.arange(8000) / 16000.0
            f = float(rng.integers(200, 2000))
            payloads.append(
                encode_wav(0.5 * np.sin(2 * np.pi * f * t), rate=16000)
            )
        else:
            # a REAL spec-valid MP4 container (operators/mp4.py) holding
            # seeded opaque frame bytes: the container/sample-table layer
            # parses for real (sample_video_frames extracts exact coded
            # frame bytes); only codec decode hits the fallback path
            from mitie_spark.operators.mp4 import encode_mp4

            frames = [
                rng.integers(0, 256, size=int(rng.integers(40, 120)),
                             dtype=np.uint8).tobytes()
                for _ in range(12)
            ]
            payloads.append(encode_mp4(frames, fps=4, sync_every=3))
        metas.append(
            {
                "mime": {
                    "image": "image/bmp",
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
