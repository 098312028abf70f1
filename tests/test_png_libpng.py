"""libpng differential for the PNG decoder (operators/media_codecs.py).

Mirrors the libtiff/giflib pattern: the PNG suite in test_media_codecs.py
inverts filters against an independent scalar implementation that lives
in the tests — this file anchors both that implementation and the
decoder to the real producer via libpng's simplified API (ctypes,
skipped if absent):

1. libpng WRITES PNGs (its adaptive per-row filter chooser exercises
   real-world filter sequences no fixed test cycle does) → our decoder
   must reproduce the pixels exactly.
2. libpng READS our payloads — the product ``encode_png`` writer, the
   hand-built fixed-filter payloads, Adam7 and sub-byte ones — and must
   see the same pixels, so the self-roundtrip tests can't be passing on
   a self-consistent wrong filter/interlace convention.

No Spark session needed — everything is pure NumPy/stdlib + ctypes.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from mitie_spark.operators.media_codecs import decode_png, encode_png

from tests.test_media_codecs import _build_png, _build_png_adam7, _pack_row

# ---------------------------------------------------------------------------
# libpng simplified-API binding (tests-only)
# ---------------------------------------------------------------------------

_PNG_IMAGE_VERSION = 1
_FMT_GRAY = 0x00
_FMT_RGB = 0x02
_FMT_RGBA = 0x03
_FMT_COLORMAP_RGB = 0x02 | 0x08


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _load_libpng():
    for name in ("libpng16.so.16", "libpng.so", ctypes.util.find_library("png")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.png_image_write_to_memory.restype = ctypes.c_int
            lib.png_image_write_to_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
            ]
            lib.png_image_begin_read_from_memory.restype = ctypes.c_int
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.png_image_finish_read.restype = ctypes.c_int
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_void_p,
            ]
            lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
        except AttributeError:
            continue
        return lib
    return None


_PNGLIB = _load_libpng()
needs_libpng = pytest.mark.skipif(_PNGLIB is None, reason="libpng not available")


def libpng_write(arr: np.ndarray, fmt: int, colormap: np.ndarray | None = None) -> bytes:
    """Encode pixels through the system libpng (8-bit formats)."""
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.height, img.width = arr.shape[:2]
    img.format = fmt
    cmap_buf = None
    if colormap is not None:
        img.colormap_entries = len(colormap)
        cmap_buf = np.ascontiguousarray(colormap, dtype=np.uint8).tobytes()
    buf = np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    size = ctypes.c_size_t(0)
    ok = _PNGLIB.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, buf, 0, cmap_buf)
    assert ok, img.message
    out = ctypes.create_string_buffer(size.value)
    ok = _PNGLIB.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0, buf, 0, cmap_buf)
    assert ok, img.message
    return out.raw[: size.value]


def libpng_read(payload: bytes, fmt: int) -> np.ndarray:
    """Decode a PNG through the system libpng, requesting 8-bit ``fmt``."""
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    ok = _PNGLIB.png_image_begin_read_from_memory(
        ctypes.byref(img), payload, len(payload))
    assert ok, img.message
    img.format = fmt
    channels = {_FMT_GRAY: 1, _FMT_RGB: 3, _FMT_RGBA: 4}[fmt]
    buf = ctypes.create_string_buffer(img.width * img.height * channels)
    ok = _PNGLIB.png_image_finish_read(ctypes.byref(img), None, buf, 0, None)
    assert ok, img.message
    out = np.frombuffer(buf.raw, dtype=np.uint8).reshape(
        img.height, img.width, channels)
    return out[:, :, 0] if channels == 1 else out


_RNG = np.random.default_rng(55)
# a smooth gradient makes libpng's adaptive chooser pick Sub/Up/Avg/Paeth
# rows; pure noise tends to pick None — use both
_GRAD = (
    np.arange(24)[:, None, None] * 7
    + np.arange(31)[None, :, None] * 5
    + np.arange(3)[None, None, :] * 11
).astype(np.uint8)
_NOISE_RGB = _RNG.integers(0, 256, (17, 23, 3), dtype=np.uint8)
_NOISE_GRAY = _RNG.integers(0, 256, (19, 29), dtype=np.uint8)


# ---------------------------------------------------------------------------
# direction 1: libpng writes, our decoder reads
# ---------------------------------------------------------------------------


@needs_libpng
@pytest.mark.parametrize(
    "arr,fmt",
    [(_NOISE_GRAY, _FMT_GRAY), (_NOISE_RGB, _FMT_RGB), (_GRAD, _FMT_RGB),
     (_GRAD[:, :, 0], _FMT_GRAY)],
    ids=["gray-noise", "rgb-noise", "rgb-gradient", "gray-gradient"],
)
def test_libpng_written_pngs_decode(arr, fmt):
    got, maxval = decode_png(libpng_write(arr, fmt))
    assert maxval == 255
    np.testing.assert_array_equal(got, arr)


@needs_libpng
def test_libpng_written_rgba_alpha_dropped():
    rgba = _RNG.integers(0, 256, (11, 13, 4), dtype=np.uint8)
    got, _ = decode_png(libpng_write(rgba, _FMT_RGBA))
    np.testing.assert_array_equal(got, rgba[:, :, :3])


@needs_libpng
def test_libpng_written_palette_decodes():
    idx = _RNG.integers(0, 41, (14, 9), dtype=np.uint8)
    cmap = _RNG.integers(0, 256, (41, 3), dtype=np.uint8)
    got, maxval = decode_png(libpng_write(idx, _FMT_COLORMAP_RGB, colormap=cmap))
    assert maxval == 255
    np.testing.assert_array_equal(got, cmap[idx])


# ---------------------------------------------------------------------------
# direction 2: our writers, libpng reads
# ---------------------------------------------------------------------------


@needs_libpng
def test_libpng_reads_product_encoder():
    for arr, fmt in [(_NOISE_GRAY, _FMT_GRAY), (_NOISE_RGB, _FMT_RGB)]:
        got = libpng_read(encode_png(arr), fmt)
        np.testing.assert_array_equal(got, arr)


@needs_libpng
def test_libpng_reads_every_fixed_filter():
    # one payload per filter type, every row forced to that filter
    rows = [_NOISE_RGB[r].tobytes() for r in range(len(_NOISE_RGB))]
    for f in range(5):
        payload = _build_png(rows, color=2, filters=[f] * len(rows))
        got = libpng_read(payload, _FMT_RGB)
        np.testing.assert_array_equal(got, _NOISE_RGB)


@needs_libpng
def test_libpng_reads_our_adam7():
    for arr, color, fmt in [
        (_NOISE_RGB, 2, _FMT_RGB),
        (_NOISE_GRAY[..., None], 0, _FMT_GRAY),
        (_GRAD, 2, _FMT_RGB),
    ]:
        payload = _build_png_adam7(arr, color=color)
        got = libpng_read(payload, fmt)
        np.testing.assert_array_equal(got, arr.reshape(got.shape))


@needs_libpng
@pytest.mark.parametrize("bitd", [1, 2, 4])
def test_libpng_reads_our_subbyte_gray(bitd):
    # libpng expands d-bit gray by bit replication: v * (255 / (2**d - 1))
    vals = _RNG.integers(0, 1 << bitd, (9, 21), dtype=np.uint8)
    rows = [_pack_row(vals[r], bitd) for r in range(len(vals))]
    payload = _build_png(rows, color=0, bitd=bitd, width=vals.shape[1],
                         filters=[r % 5 for r in range(len(vals))])
    got = libpng_read(payload, _FMT_GRAY)
    np.testing.assert_array_equal(got, vals * (255 // ((1 << bitd) - 1)))
    # and our own decoder agrees on the raw values
    ours, maxval = decode_png(payload)
    assert maxval == (1 << bitd) - 1
    np.testing.assert_array_equal(ours, vals)
