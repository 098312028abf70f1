"""WebP decode entry point (placeholder — VP8L implementation lands in
this round; until then every WebP payload routes to the injected-decoder
seam via UnsupportedMediaError)."""

from __future__ import annotations

from mitie_spark.operators.media_codecs import UnsupportedMediaError


def decode_webp(payload: bytes):
    raise UnsupportedMediaError("WebP decode not implemented")
