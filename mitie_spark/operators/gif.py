"""Pure-Python/NumPy GIF decoder (GIF87a/GIF89a): LZW entropy decode,
interlacing, local/global palettes, transparency, and animation frame
composition (disposal methods 0-3).

This closes the largest remaining real-web image seam in the multimodal
column pipeline (operators/multimodal.py): after baseline+progressive JPEG
(operators/jpeg.py) and PNG incl. Adam7 (operators/media_codecs.py), GIF is
the next most common image payload in a web crawl. The reference engine
(mit-nlp/MITIE) has no image path at all — this module exists for the
LLM-training-data mandate (multimodal columns), not reference parity, so
there is no reference citation; the format itself is public (CompuServe
GIF89a specification, 1990; LZW per Welch 1984).

Design notes, mirroring operators/jpeg.py's conventions:

- Fail-fast contract: every malformed/hostile/unsupported payload raises
  ``UnsupportedMediaError`` (never a bare struct/index error), so
  corpus-scale tasks degrade per-payload to the documented fallback seam
  instead of dying.
- Decompression-bomb guards: declared screen dimensions are capped like
  PNG's (64M pixels), and an animation's TOTAL composed pixels are capped
  at 4x that, so a 1 KB payload declaring ten thousand full-screen frames
  cannot allocate unbounded memory.
- The LZW inner loop is scalar Python by necessity (each code's table
  entry depends on the previous code — inherently sequential, exactly like
  the JPEG Huffman scan), while everything per-pixel after entropy decode
  (palette lookup, deinterlace scatter, transparency masking, frame
  compositing) is vectorized NumPy.
- Determinism: no floats anywhere; output is the palette bytes verbatim,
  so decode is bit-exact by construction.
"""

from __future__ import annotations

import struct

import numpy as np

from mitie_spark.operators.media_codecs import UnsupportedMediaError

# Same declared-dimension sanity cap as the PNG path (media_codecs.py:
# _PNG_MAX_PIXELS): 64M pixels per logical screen. An animation may
# compose at most 4x that across ALL rendered frames before it is treated
# as hostile (a real banner ad is a handful of small frames; a 1 KB bomb
# declaring 10k full-screen frames is not).
_GIF_MAX_PIXELS = 64 * 1024 * 1024
_GIF_MAX_TOTAL_PIXELS = 4 * _GIF_MAX_PIXELS
_GIF_MAX_FRAMES = 10_000

# GIF interlace row schedule (GIF89a spec appendix E): four passes over
# rows (start, step) = (0,8),(4,8),(2,4),(1,2). Rows arrive in the LZW
# stream in pass order; _deinterlace scatters them back.
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF data sub-block chain (length byte + bytes,
    terminated by a zero length byte). Returns (data, position past the
    terminator)."""
    n_total = len(payload)
    parts = []
    while True:
        if pos >= n_total:
            raise UnsupportedMediaError("truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > n_total:
            raise UnsupportedMediaError("truncated GIF sub-block")
        parts.append(payload[pos : pos + n])
        pos += n


def _lzw_decode(data: bytes, mcs: int, npix: int) -> bytes:
    """Decode a GIF LZW stream (LSB-first variable-width codes, 12-bit
    cap) to exactly ``npix`` palette indices.

    Handles the standard subtleties: the KwKwK case (code == next table
    slot), width growth when the table reaches 2**width, deferred-clear
    streams (encoder freezes the table at 4096 instead of emitting a
    clear code), and streams that omit the end-of-information code.
    """
    if not (2 <= mcs <= 8):
        # spec range for the minimum code size byte: 2..8 (palettes are
        # at most 256 entries; monochrome images still use 2)
        raise UnsupportedMediaError(f"GIF LZW minimum code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while len(out) < npix:
        while nbits < width:
            if pos >= n:
                raise UnsupportedMediaError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            # first code after a clear must be a literal
            if code >= clear:
                raise UnsupportedMediaError("bad GIF LZW start code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and code < 4096:
            # KwKwK: the code being defined right now
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise UnsupportedMediaError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < npix:
        raise UnsupportedMediaError("GIF LZW stream ended before raster")
    return bytes(out[:npix])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Scatter stream-order rows back to display order (4-pass GIF
    interlace)."""
    h = idx.shape[0]
    order = [y for start, step in _INTERLACE for y in range(start, h, step)]
    out = np.empty_like(idx)
    out[np.asarray(order, dtype=np.int64)] = idx
    return out


def _read_color_table(payload: bytes, pos: int, packed: int) -> tuple[np.ndarray, int]:
    n = 2 << (packed & 0x07)
    end = pos + 3 * n
    if end > len(payload):
        raise UnsupportedMediaError("truncated GIF color table")
    tab = (
        np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        .reshape(n, 3)
        .copy()
    )
    return tab, end


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Decode a GIF to composed RGB frames.

    Returns ``[(delay_ms, frame), ...]`` where each ``frame`` is the full
    logical-screen canvas (H, W, 3) uint8 AFTER compositing that image
    block — i.e. what a viewer would display — honoring transparency and
    the GIF89a disposal methods (1 keep, 2 restore-to-background,
    3 restore-to-previous). ``max_frames`` stops parsing early (the
    first-frame fast path for feature extraction also tolerates
    truncated animation tails that way, matching how browsers render
    partially-downloaded GIFs).
    """
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMediaError("not a GIF payload")
    W, H = struct.unpack_from("<HH", payload, 6)
    packed, bg_index = payload[10], payload[11]
    if W == 0 or H == 0:
        raise UnsupportedMediaError("empty GIF logical screen")
    if W * H > _GIF_MAX_PIXELS:
        raise UnsupportedMediaError(
            f"GIF declares {W}x{H} (> {_GIF_MAX_PIXELS} pixel cap)"
        )
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, packed)

    # canvas starts as the declared background color (spec intent; the
    # common browser behavior of "transparent" has no meaning for an
    # opaque RGB feature pipeline)
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    bg_rgb = np.zeros(3, dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
        canvas[:] = bg_rgb

    frames: list[tuple[int, np.ndarray]] = []
    transparent: int | None = None
    delay_ms = 0
    disposal = 0
    prev_canvas: np.ndarray | None = None
    total_pixels = 0
    n_total = len(payload)
    while True:
        if pos >= n_total:
            raise UnsupportedMediaError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n_total:
                raise UnsupportedMediaError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            body, pos = _subblocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                disposal = (body[0] >> 2) & 0x07
                delay_ms = int.from_bytes(body[1:3], "little") * 10
                transparent = body[3] if (body[0] & 0x01) else None
            # 0xFE comment / 0xFF application / 0x01 plain text: skipped
            continue
        if block != 0x2C:
            raise UnsupportedMediaError(f"unknown GIF block 0x{block:02x}")

        # image descriptor
        if pos + 9 > n_total:
            raise UnsupportedMediaError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > W or top + h > H:
            raise UnsupportedMediaError(
                f"GIF frame rect {left},{top} {w}x{h} outside {W}x{H} screen"
            )
        lct = gct
        if ipacked & 0x80:
            lct, pos = _read_color_table(payload, pos, ipacked)
        if lct is None:
            raise UnsupportedMediaError("GIF frame with no color table")
        if pos >= n_total:
            raise UnsupportedMediaError("truncated GIF image data")
        mcs = payload[pos]
        pos += 1
        data, pos = _subblocks(payload, pos)
        total_pixels += w * h
        if total_pixels > _GIF_MAX_TOTAL_PIXELS or len(frames) >= _GIF_MAX_FRAMES:
            raise UnsupportedMediaError("GIF animation exceeds pixel budget")

        idx = np.frombuffer(_lzw_decode(data, mcs, w * h), dtype=np.uint8)
        idx = idx.reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        draw = (
            np.ones((h, w), dtype=bool)
            if transparent is None
            else idx != transparent
        )
        drawn = idx[draw]
        if drawn.size and int(drawn.max()) >= len(lct):
            raise UnsupportedMediaError("GIF palette index out of range")
        if disposal == 3:
            prev_canvas = canvas.copy()
        region = canvas[top : top + h, left : left + w]
        # clip-then-mask: transparent slots may legally index past the
        # table, so the lookup is clamped and only drawn pixels land
        region[draw] = lct[np.minimum(idx, len(lct) - 1)][draw]
        frames.append((delay_ms, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent, delay_ms, disposal = None, 0, 0
    if not frames:
        raise UnsupportedMediaError("GIF with no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composed frame as (H, W, 3) uint8 RGB — the feature-pipeline
    entry point (builtin_decoder in media_codecs.py)."""
    return decode_gif_frames(payload, max_frames=1)[0][1]
