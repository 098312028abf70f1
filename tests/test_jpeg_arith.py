"""Arithmetic-coded JPEG decode tests (operators/jpeg_arith.py).

Differential gate built on the system libjpeg (jpeglib.h + -ljpeg,
compiled test probe — skipped when the toolchain or library is absent):
the probe encodes the SAME pixels twice with identical settings, once
with Huffman entropy coding and once with arithmetic coding. Entropy
coding is lossless over the quantized DCT coefficients, so this repo's
decoder must produce BIT-IDENTICAL output for both files — the Huffman
path is already golden-tested against an independent scalar encoder,
which transitively pins the QM-coder, the DC/AC statistical models, and
the progressive decision sequences.

The matrix covers: gray/RGB (4:2:0 subsampling), sequential (SOF9) and
progressive (SOF10), restart intervals, multiple quality levels (vary
coefficient sparsity → different decision mixes), and image families
(noise = dense ACs, smooth = long zero runs/EOBs, constant = the
degenerate empty-stream flush).
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from mitie_spark.operators.jpeg import decode_jpeg
from mitie_spark.operators.media_codecs import UnsupportedMediaError

REPO = Path(__file__).resolve().parent.parent
REFBUILD = REPO / ".refbuild"
PROBE_SRC = REPO / "tests" / "cross_engine" / "probe_jpegarith.c"


def _build_probe():
    if shutil.which("gcc") is None:
        return None
    exe = REFBUILD / "probe_jpegarith"
    if exe.exists() and exe.stat().st_mtime >= PROBE_SRC.stat().st_mtime:
        return exe
    REFBUILD.mkdir(exist_ok=True)
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(PROBE_SRC), "-ljpeg"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        return None
    return exe


_PROBE = _build_probe()
needs_probe = pytest.mark.skipif(
    _PROBE is None, reason="gcc/libjpeg not available to build the probe"
)


def _encode(tmpdir: Path, img: np.ndarray, quality: int, arith: bool,
            progressive: bool, restart: int) -> bytes:
    magic = b"P6" if img.ndim == 3 else b"P5"
    h, w = img.shape[:2]
    pnm = tmpdir / "in.pnm"
    pnm.write_bytes(magic + b"\n%d %d\n255\n" % (w, h) + img.tobytes())
    out = tmpdir / "out.jpg"
    subprocess.run(
        [str(_PROBE), "enc", str(pnm), str(out), str(quality),
         str(int(arith)), str(int(progressive)), str(restart)],
        check=True,
    )
    return out.read_bytes()


def _families():
    rng = np.random.default_rng(77)
    smooth = np.clip(
        np.add.outer(np.arange(41) * 3, np.arange(50) * 2) % 256, 0, 255
    ).astype(np.uint8)
    rgb = rng.integers(0, 256, (25, 30, 3), dtype=np.uint8)
    grad_rgb = np.stack(
        [smooth[:25, :30], smooth.T[:25, :30], 255 - smooth[:25, :30]], -1
    ).astype(np.uint8)
    return {
        "noise_gray": rng.integers(0, 256, (24, 33), dtype=np.uint8),
        "noise_rgb": rgb,
        "smooth_gray": smooth,
        "grad_rgb": grad_rgb,
        "const_gray": np.full((16, 16), 128, np.uint8),
    }


@needs_probe
@pytest.mark.parametrize("progressive", [False, True])
@pytest.mark.parametrize("restart", [0, 2])
@pytest.mark.parametrize("name", sorted(_families()))
def test_arith_equals_huffman(tmp_path, name, progressive, restart):
    img = _families()[name]
    huff = _encode(tmp_path, img, 85, False, progressive, restart)
    arith = _encode(tmp_path, img, 85, True, progressive, restart)
    # sanity: the arithmetic file really is SOF9/SOF10 with a DAC segment
    want_sof = b"\xff\xca" if progressive else b"\xff\xc9"
    assert want_sof in arith and b"\xff\xcc" in arith
    ah, mh = decode_jpeg(huff)
    aa, ma = decode_jpeg(arith)
    assert mh == ma == 255
    np.testing.assert_array_equal(aa, ah)


@needs_probe
@pytest.mark.parametrize("quality", [30, 60, 95])
def test_arith_quality_sweep(tmp_path, quality):
    """Different qualities change coefficient sparsity → different mixes
    of EOB / run / magnitude decisions and adaptation trajectories."""
    img = _families()["noise_rgb"]
    for progressive in (False, True):
        huff = _encode(tmp_path, img, quality, False, progressive, 0)
        arith = _encode(tmp_path, img, quality, True, progressive, 0)
        np.testing.assert_array_equal(decode_jpeg(arith)[0], decode_jpeg(huff)[0])


@needs_probe
def test_arith_larger_image_deep_adaptation(tmp_path):
    """A bigger photo-like image pushes the probability-estimation state
    machine through many transitions (incl. switch states) and exercises
    the deferred-renormalization byte feed across hundreds of bytes."""
    rng = np.random.default_rng(3)
    yy, xx = np.meshgrid(np.arange(96), np.arange(120), indexing="ij")
    img = np.stack(
        [
            128 + 70 * np.sin(yy / 7.0) + 40 * np.cos(xx / 11.0),
            100 + 80 * np.sin((xx + yy) / 13.0),
            xx * 2 % 256,
        ],
        -1,
    ).astype(np.uint8)
    img = np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)
    for progressive in (False, True):
        huff = _encode(tmp_path, img, 80, False, progressive, 4)
        arith = _encode(tmp_path, img, 80, True, progressive, 4)
        np.testing.assert_array_equal(decode_jpeg(arith)[0], decode_jpeg(huff)[0])


# ---------------------------------------------------------------------------
# hostile-input contracts
# ---------------------------------------------------------------------------


@needs_probe
def test_truncated_arith_decodes_or_fails_cleanly(tmp_path):
    """Truncation mid-stream must either decode (the QM feed reads zeros
    past the end — valid by construction) or raise UnsupportedMediaError,
    never a parse-layer exception."""
    img = _families()["noise_gray"]
    payload = _encode(tmp_path, img, 85, True, False, 0)
    for cut in range(len(payload) - 40, len(payload)):
        try:
            decode_jpeg(payload[:cut])
        except UnsupportedMediaError:
            pass


@needs_probe
def test_arith_mutation_fuzz(tmp_path):
    img = _families()["smooth_gray"]
    for progressive in (False, True):
        payload = np.frombuffer(
            _encode(tmp_path, img, 85, True, progressive, 2), dtype=np.uint8
        )
        rng = np.random.default_rng(11 + progressive)
        for _ in range(120):
            q = payload.copy()
            op = int(rng.integers(0, 3))
            if op == 0:
                pos = rng.integers(0, len(q), int(rng.integers(1, 9)))
                q[pos] = rng.integers(0, 256, len(pos))
            elif op == 1:
                q = q[: int(rng.integers(1, len(q)))]
            else:
                at = int(rng.integers(0, len(q) + 1))
                ins = rng.integers(0, 256, int(rng.integers(1, 33))).astype(np.uint8)
                q = np.concatenate([q[:at], ins, q[at:]])
            try:
                decode_jpeg(q.tobytes())
            except UnsupportedMediaError:
                pass


def test_bad_dac_rejected():
    # hand-built: SOI + DAC with an invalid AC Kx of 0
    payload = b"\xff\xd8\xff\xcc" + struct.pack(">H", 4) + bytes([0x10, 0x00])
    with pytest.raises(UnsupportedMediaError, match="DAC"):
        decode_jpeg(payload + b"\xff\xd9")


def test_lossless_arithmetic_still_rejected():
    # SOF11 (lossless arithmetic) keeps routing to the seam
    payload = (
        b"\xff\xd8\xff\xcb" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(UnsupportedMediaError, match="not supported"):
        decode_jpeg(payload + b"\xff\xd9")


# ---------------------------------------------------------------------------
# consumer differential: our decoded PIXELS vs libjpeg's own decoder
#
# Everything above validates entropy decode (arith file == huffman file
# through OUR decoder) and the Huffman path is golden-tested against an
# independent scalar encoder — but no test compared final pixels against
# the ecosystem's consumer. T.81 does not mandate a bit-exact IDCT, so
# the pin is a tolerance: gray is IDCT-only (measured max |diff| = 1 vs
# libjpeg's islow across quality/mode sweeps), RGB 4:4:4 adds the YCbCr
# rounding stack (measured max 3). 4:2:0 is deliberately NOT
# pixel-compared: the chroma upsampling filter is the decoder's choice
# per the spec (libjpeg uses a triangular filter, this repo uses
# replication inside its vectorized pipeline), so full-res chroma is the
# convention-free comparison surface.
# ---------------------------------------------------------------------------


def _libjpeg_decode(tmpdir: Path, payload: bytes) -> np.ndarray:
    jpg = tmpdir / "cons.jpg"
    jpg.write_bytes(payload)
    out = tmpdir / "cons.pnm"
    subprocess.run([str(_PROBE), "dec", str(jpg), str(out)], check=True)
    raw = out.read_bytes()
    magic, dims, _maxv, data = raw.split(b"\n", 3)
    w, h = map(int, dims.split())
    arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape(h, w, 3) if magic == b"P6" else arr.reshape(h, w)


def _encode_444(tmpdir: Path, img: np.ndarray, quality: int, arith: bool,
                progressive: bool) -> bytes:
    magic = b"P6" if img.ndim == 3 else b"P5"
    h, w = img.shape[:2]
    pnm = tmpdir / "in444.pnm"
    pnm.write_bytes(magic + b"\n%d %d\n255\n" % (w, h) + img.tobytes())
    out = tmpdir / "out444.jpg"
    subprocess.run(
        [str(_PROBE), "enc", str(pnm), str(out), str(quality),
         str(int(arith)), str(int(progressive)), "0", "0"],
        check=True,
    )
    return out.read_bytes()


@needs_probe
@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("progressive", [False, True])
@pytest.mark.parametrize("name", ["noise_gray", "smooth_gray"])
def test_pixels_match_libjpeg_gray(tmp_path, name, progressive, arith):
    img = _families()[name]
    for quality in (30, 85, 95):
        payload = _encode(tmp_path, img, quality, arith, progressive, 0)
        ours, maxval = decode_jpeg(payload)
        assert maxval == 255
        theirs = _libjpeg_decode(tmp_path, payload)
        diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
        assert diff.max() <= 1, f"q={quality}: max pixel diff {diff.max()}"


@needs_probe
@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("progressive", [False, True])
def test_pixels_match_libjpeg_rgb444(tmp_path, progressive, arith):
    for name in ("noise_rgb", "grad_rgb"):
        img = _families()[name]
        for quality in (30, 85):
            payload = _encode_444(tmp_path, img, quality, arith, progressive)
            # really 4:4:4: exactly one scan geometry where every component
            # is full resolution (sampling byte 0x11 for all three)
            ours, _ = decode_jpeg(payload)
            theirs = _libjpeg_decode(tmp_path, payload)
            diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
            assert diff.max() <= 3, (
                f"{name} q={quality}: max pixel diff {diff.max()}")
