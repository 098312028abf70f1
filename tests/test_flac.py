"""FLAC decoder tests — operators/flac.py.

Gate pattern: no codec library exists in this sandbox (unlike
libjpeg/libpng/libwebp, there is no system libFLAC), so like the
JPEG suite the evidence is (1) round trips through the module's own
independent encoder across the full option matrix, (2) a hand-assembled
known-answer frame whose bits are laid out longhand HERE (independent
of both the encoder's and the decoder's bit plumbing), (3) tamper tests
proving CRC-8 / CRC-16 / MD5 are actually enforced, and (4) the
corruption fuzz contract shared by every decoder in operators/.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from mitie_spark.operators.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)
from mitie_spark.operators.media_codecs import UnsupportedMediaError


def _signal(n=3000, seed=42):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    left = (3000 * np.sin(t / 25) + rng.integers(-200, 200, n)).astype(np.int64)
    right = (2500 * np.cos(t / 31) + rng.integers(-200, 200, n)).astype(np.int64)
    return np.stack([left, right], axis=1)


def _expect(pcm, bps):
    return (pcm.mean(axis=1) / float(1 << (bps - 1))).astype(np.float32)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
@pytest.mark.parametrize(
    "sub", ["verbatim", "fixed0", "fixed2", "fixed4", "lpc"]
)
def test_round_trip_stereo_matrix(mode, sub):
    pcm = _signal()
    blob = encode_flac(
        pcm, rate=16000, bps=16, block_size=1024, stereo_mode=mode, subframe=sub
    )
    mono, rate = decode_flac(blob)
    assert rate == 16000
    assert np.array_equal(mono, _expect(pcm, 16))


def test_round_trip_variants():
    m = (1000 * np.sin(np.arange(5000) / 10)).astype(np.int64)
    cases = [
        (m, dict(partition_order=2)),  # 4 rice partitions
        (m, dict(escape=True)),  # escape-to-raw partitions
        (m, dict(rice_method=1)),  # 5-bit rice2 parameters
        (m * 4, dict(wasted_bits=2)),  # declared wasted bits
        (m, dict(variable_blocking=True)),  # sample-number coded headers
        (m, dict(bps=24)),
        (m, dict(bps=12)),  # non-byte sample size (MD5 packs 2 bytes)
        (m, dict(rate=44100)),  # table sample-rate code
        (m, dict(rate=12345)),  # 16-bit Hz sample rate at header end
        (np.full(500, -3, np.int64), dict(subframe="constant", block_size=192)),
        (m, dict(block_size=576)),  # last frame shorter than the rest
    ]
    for x, kw in cases:
        bps = kw.pop("bps", 16)
        rate = kw.pop("rate", 16000)
        kw.setdefault("block_size", 1000)
        mono, r = decode_flac(encode_flac(x, rate=rate, bps=bps, **kw))
        assert r == rate
        assert np.array_equal(mono, (x / float(1 << (bps - 1))).astype(np.float32)), kw


def test_multibyte_coded_frame_numbers():
    # >127 frames forces the UTF-8-style 2-byte coded number path
    x = np.arange(200 * 256, dtype=np.int64) % 97
    blob = encode_flac(x, block_size=256)
    mono, _ = decode_flac(blob)
    assert np.array_equal(mono, (x / 32768.0).astype(np.float32))


# ---------------------------------------------------------------------------
# Hand-assembled known-answer stream: every bit laid out longhand, no
# shared plumbing with either the encoder or the decoder.
# ---------------------------------------------------------------------------


def _bits_to_bytes(bits: str) -> bytes:
    assert len(bits) % 8 == 0
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_hand_assembled_fixed1_frame():
    """Mono 8-bit, block size 192 (code 0001), 44.1 kHz (code 1001),
    FIXED order-1 subframe: warmup sample 10, then 191 residuals of +1
    rice-coded with k=0 (each '01' = zigzag(1)) -> samples 10..201?
    No: 8-bit range caps at 127, so use residual 0 ('1' after zigzag)
    -> constant ramp stays at 10."""
    # frame header: sync(14)=11111111111110, reserved(1)=0, blocking(1)=0,
    # blocksize(4)=0001 (192), samplerate(4)=1001 (44100),
    # channels(4)=0000 (mono), samplesize(3)=001 (8-bit), reserved(1)=0
    hdr_bits = "11111111111110" + "0" + "0" + "0001" + "1001" + "0000" + "001" + "0"
    head = _bits_to_bytes(hdr_bits) + bytes([0])  # coded frame number 0
    head += bytes([crc8(head)])
    # subframe: pad(1)=0, type(6)=001001 (FIXED order 1), wasted(1)=0,
    # warmup sample 10 in 8 bits, residual: method(2)=00, porder(4)=0000,
    # rice k(4)=0000, then 191 residuals of zigzag(0)='1' (unary 0)
    body_bits = "0" + "001001" + "0" + format(10, "08b")
    body_bits += "00" + "0000" + "0000" + "1" * 191
    body_bits += "0" * (-len(body_bits) % 8)  # frame padding to byte
    frame = head + _bits_to_bytes(body_bits)
    frame += struct.pack(">H", crc16(frame))

    acc = (44100 << 44) | (0 << 41) | (7 << 36) | 192
    streaminfo = (
        struct.pack(">HH", 192, 192) + b"\x00" * 6 + acc.to_bytes(8, "big")
        + b"\x00" * 16  # md5 unset -> not checked
    )
    blob = (
        b"fLaC"
        + (1 << 31 | len(streaminfo)).to_bytes(4, "big")
        + streaminfo
        + frame
    )
    mono, rate = decode_flac(blob)
    assert rate == 44100
    assert np.array_equal(mono, np.full(192, 10 / 128.0, dtype=np.float32))


# ---------------------------------------------------------------------------
# Integrity enforcement + hostile inputs
# ---------------------------------------------------------------------------


def test_crc_and_md5_are_enforced():
    x = (100 * np.sin(np.arange(1000) / 5)).astype(np.int64)
    blob = bytearray(encode_flac(x, block_size=1000))
    # STREAMINFO is 4+4 bytes in; md5 sits at its bytes 18..34
    md5_off = 8 + 18
    tampered = bytearray(blob)
    tampered[md5_off] ^= 0xFF
    with pytest.raises(UnsupportedMediaError, match="MD5"):
        decode_flac(bytes(tampered))
    # flip a bit deep in the frame body -> CRC-16 (or header CRC-8)
    tampered = bytearray(blob)
    tampered[-10] ^= 0x10
    with pytest.raises(UnsupportedMediaError, match="CRC|FLAC"):
        decode_flac(bytes(tampered))
    # truncation
    with pytest.raises(UnsupportedMediaError):
        decode_flac(bytes(blob[: len(blob) // 2]))
    with pytest.raises(UnsupportedMediaError, match="not a FLAC"):
        decode_flac(b"fLaX" + bytes(blob[4:]))


def test_corruption_never_hangs_or_leaks():
    rng = random.Random(7)
    seed = encode_flac(_signal(4000), block_size=1024, stereo_mode="mid_side")
    for _ in range(800):
        blob = bytearray(seed)
        for _ in range(rng.randrange(1, 5)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            blob = blob[: rng.randrange(len(blob))]
        try:
            mono, rate = decode_flac(bytes(blob))
            assert len(mono) <= 8000
        except UnsupportedMediaError:
            pass  # the only exception type the contract allows


# ---------------------------------------------------------------------------
# Feature-path integration: FLAC and WAV of the same samples must
# produce the SAME 64-dim audio feature through builtin_decoder.
# ---------------------------------------------------------------------------


def test_builtin_decoder_flac_equals_wav():
    from mitie_spark.operators.media_codecs import builtin_decoder, sniff_kind

    x = (5000 * np.sin(np.arange(4000) / 40)).astype(np.int64)
    flac = encode_flac(x, rate=16000, bps=16, block_size=1024)
    pcm = x.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    assert sniff_kind(flac) == "flac"
    assert sniff_kind(wav) == "wav"
    f1, f2 = builtin_decoder(flac), builtin_decoder(wav)
    assert f1.shape == (64,)
    assert np.array_equal(f1, f2)
