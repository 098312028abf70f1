"""Pure-NumPy media codecs: real decode for BMP / PGM / PPM / PNG / WAV.

The container has no PIL/opencv/ffmpeg, but these formats need no codec
library at all — BMP (BI_RGB), binary PNM (P5/P6), and RIFF/WAVE PCM are
plain headers over raw sample arrays, and PNG is stdlib zlib inflate plus
a NumPy byte-defilter (non-interlaced and Adam7). Baseline AND progressive JPEG decode in
the sibling module (operators/jpeg.py, dispatched from builtin_decoder).
These decoders make the multimodal path (operators/multimodal.py) REAL
for those formats: payload bytes → pixel/sample arrays → deterministic
feature vectors.  MP4 container parsing (boxes, sample tables, frame
byte-range extraction) is real too — operators/mp4.py — so only the
codec BITSTREAMS (H.264/HEVC/AAC, arithmetic-coded JPEG) route to an
injected decoder or the documented fallback.

Everything is deterministic and vectorized (header parse in ``struct``,
pixel/sample math in NumPy) — safe inside Arrow-batched UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

FEATURE_DIM = 64


class UnsupportedMediaError(ValueError):
    """Payload is not a format the built-in codecs handle."""


# ---------------------------------------------------------------------------
# format sniffing
# ---------------------------------------------------------------------------


def sniff_kind(payload: bytes) -> str | None:
    """Magic-byte detection: 'bmp' | 'pnm' | 'wav' | 'flac' | 'png' |
    'jpeg' | 'gif' | 'tiff' | 'webp' | 'mp4' | None."""
    if not payload or len(payload) < 12:
        return None
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] in (b"II*\x00", b"MM\x00*") or (
        payload[:2] in (b"II", b"MM") and payload[2:4] in (b"+\x00", b"\x00+")
    ):
        return "tiff"  # incl. BigTIFF (decoder rejects it explicitly)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] in (b"P5", b"P6") and payload[2:3] in b" \t\r\n":
        return "pnm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return None


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB uncompressed; 8-bit palette / 24 / 32 bpp)
# ---------------------------------------------------------------------------


def _bmp_palette(payload: bytes, hdr_size: int, bpp: int) -> np.ndarray:
    """→ (n, 4) BGRA palette entries after the info header."""
    n_colors = struct.unpack_from("<I", payload, 46)[0] or (1 << bpp)
    if not 1 <= n_colors <= 256:
        raise UnsupportedMediaError(f"bad BMP palette size {n_colors}")
    off = 14 + hdr_size
    if len(payload) < off + n_colors * 4:
        raise UnsupportedMediaError("truncated BMP palette")
    return np.frombuffer(payload, dtype=np.uint8, count=n_colors * 4, offset=off).reshape(
        n_colors, 4
    )


def _bmp_palette_lookup(pal: np.ndarray, idx: np.ndarray) -> np.ndarray:
    if int(idx.max(initial=0)) >= len(pal):
        # hostile index past ColorsUsed would IndexError the gather
        raise UnsupportedMediaError("BMP palette index out of range")
    return pal[idx, 2::-1].copy()  # BGRA entries → RGB


def _bmp_decode_rle(data: bytes, H: int, W: int, four: bool) -> np.ndarray:
    """BI_RLE8/BI_RLE4 → (H, W) palette indices (bottom-up flipped here).
    Stream grammar: (count>0, value) = encoded run (RLE4 alternates the
    value's two nibbles); (0, 0) = end of line; (0, 1) = end of bitmap;
    (0, 2, dx, dy) = cursor delta; (0, n>=3) = literal run of n pixels,
    padded to a 16-bit boundary. Out-of-frame writes are clipped, so a
    hostile stream can waste its own bytes but cannot write out of
    bounds or fail the task."""
    out = np.zeros((H, W), dtype=np.uint8)
    x = y = 0
    i, n = 0, len(data)
    while i + 2 <= n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y < H:
                if four:
                    pair = np.array([val >> 4, val & 15], dtype=np.uint8)
                    run = np.tile(pair, (cnt + 1) // 2)[:cnt]
                else:
                    run = np.full(cnt, val, dtype=np.uint8)
                end = min(x + cnt, W)
                if x < W:
                    out[y, x:end] = run[: end - x]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 2 > n:
                break
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # literal ("absolute") run of `val` pixels
            if four:
                nbytes = (val + 1) // 2
                chunk = np.frombuffer(data, np.uint8, min(nbytes, n - i), i)
                i += nbytes + (nbytes & 1)
                pix = np.empty(2 * len(chunk), dtype=np.uint8)
                pix[0::2] = chunk >> 4
                pix[1::2] = chunk & 15
                pix = pix[:val]
            else:
                pix = np.frombuffer(data, np.uint8, min(val, n - i), i)
                i += val + (val & 1)
            if y < H and x < W:
                end = min(x + len(pix), W)
                out[y, x:end] = pix[: end - x]
            x += val
    return out[::-1]  # RLE bitmaps are always bottom-up


def decode_bmp(payload: bytes) -> np.ndarray:
    """→ (H, W, 3) uint8 RGB. Handles bottom-up (positive height) and
    top-down (negative height) rows, 4-byte row padding, 1/4/8-bit
    palette (incl. BI_RLE8/BI_RLE4 runs), 16-bit RGB555 and arbitrary
    BI_BITFIELDS masks (16/32), 24-bit BGR and 32-bit BGRA."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    if len(payload) < 54:
        raise UnsupportedMediaError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression not in (0, 1, 2, 3):
        raise UnsupportedMediaError(f"compressed BMP (method {compression})")
    if (
        bpp not in (1, 4, 8, 16, 24, 32)
        or (compression == 1 and bpp != 8)
        or (compression == 2 and bpp != 4)
        or (compression == 3 and bpp not in (16, 32))
    ):
        raise UnsupportedMediaError(f"unsupported BMP bpp {bpp}/method {compression}")
    top_down = height < 0
    H, W = abs(height), width
    if H == 0 or W <= 0:
        raise UnsupportedMediaError("empty BMP")
    if H * W > _PNG_MAX_PIXELS:  # same hostile-dims cap as PNG
        raise UnsupportedMediaError(f"BMP dimensions {W}x{H} exceed the pixel cap")
    if compression in (1, 2):  # RLE: bottom-up only, data runs to payload end
        if top_down:
            raise UnsupportedMediaError("top-down RLE BMP is invalid")
        if data_off >= len(payload):
            raise UnsupportedMediaError("truncated BMP pixel data")
        idx = _bmp_decode_rle(payload[data_off:], H, W, four=compression == 2)
        return _bmp_palette_lookup(_bmp_palette(payload, hdr_size, bpp), idx)
    row_bytes = ((W * bpp + 31) // 32) * 4  # rows pad to 4 bytes
    need = data_off + row_bytes * H
    if len(payload) < need:
        raise UnsupportedMediaError("truncated BMP pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * H, offset=data_off)
    rows = raw.reshape(H, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp in (1, 4):  # packed MSB-first, same layout as sub-byte PNG
        idx = _unpack_subbyte(np.ascontiguousarray(rows), H, W, bpp)
        return _bmp_palette_lookup(_bmp_palette(payload, hdr_size, bpp), idx)
    if bpp == 8:
        pal = _bmp_palette(payload, hdr_size, bpp)
        return _bmp_palette_lookup(pal, rows[:, :W])
    if bpp == 24 or (bpp == 32 and compression == 0):
        ch = bpp // 8
        px = rows[:, : W * ch].reshape(H, W, ch)
        return px[..., 2::-1].copy()  # BGR(A) → RGB
    # 16-bit (default RGB555) or BI_BITFIELDS: mask-extract each channel
    # and rescale to 8 bits by its own mask width
    if compression == 3:
        if len(payload) < 66:
            raise UnsupportedMediaError("truncated BMP bitfields masks")
        masks = struct.unpack_from("<III", payload, 54)
    else:
        masks = (0x7C00, 0x03E0, 0x001F)
    nb = bpp // 8
    v = rows[:, : W * nb].reshape(H, W, nb).astype(np.uint32)
    val = v[..., 0]
    for k in range(1, nb):
        val = val | (v[..., k] << (8 * k))  # little-endian samples
    chans = []
    for mask in masks:
        mask &= 0xFFFFFFFF if nb == 4 else 0xFFFF
        if mask == 0:
            chans.append(np.zeros((H, W), dtype=np.uint8))
            continue
        shift = (mask & -mask).bit_length() - 1
        maxv = mask >> shift
        c = ((val & mask) >> shift).astype(np.uint64)  # *255 would wrap u32
        chans.append((c * 255 // maxv).astype(np.uint8))
    return np.stack(chans, axis=-1)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    H, W, _ = arr.shape
    row_bytes = (W * 3 + 3) & ~3
    img = np.zeros((H, row_bytes), dtype=np.uint8)
    img[:, : W * 3] = arr[::-1, :, ::-1].reshape(H, W * 3)  # bottom-up BGR
    data = img.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + info + data


# ---------------------------------------------------------------------------
# binary PNM (P5 grayscale / P6 RGB)
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes):
    """Parse magic + dims + maxval, skipping '#' comments; returns
    (magic, W, H, maxval, data_offset)."""
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise UnsupportedMediaError("truncated PNM header")
        tok = payload[start:pos]
        if not tok.isdigit() or len(tok) > 10:
            # non-numeric garbage (or an absurd magnitude) in a header
            # token must route to the seam, not raise ValueError
            raise UnsupportedMediaError("malformed PNM header token")
        vals.append(int(tok))
    pos += 1  # single whitespace after maxval
    if not 1 <= vals[2] <= 65535:
        # the spec range; maxval=0 would divide-by-zero the feature scale
        # and negative values sign-flip it — malformed web-scale payloads
        # must degrade via UnsupportedMediaError, not crash the task
        raise UnsupportedMediaError(f"PNM maxval {vals[2]} out of range")
    return payload[:2], vals[0], vals[1], vals[2], pos


def decode_pnm(payload: bytes, header=None) -> np.ndarray:
    """P5 → (H, W) uint8/uint16; P6 → (H, W, 3). 16-bit samples are
    big-endian per the spec. ``header``: an already-parsed _pnm_header
    tuple, so callers that need the maxval themselves parse once."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise UnsupportedMediaError("not a binary PNM payload")
    magic, W, H, maxval, off = header or _pnm_header(payload)
    if W <= 0 or H <= 0:
        raise UnsupportedMediaError("empty PNM")
    ch = 3 if magic == b"P6" else 1
    dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    n = W * H * ch
    if len(payload) - off < n * dt.itemsize:
        raise UnsupportedMediaError("truncated PNM pixel data")
    data = np.frombuffer(payload, dtype=dt, count=n, offset=off)
    arr = data.reshape((H, W, 3)) if ch == 3 else data.reshape((H, W))
    return arr.astype(np.uint16) if maxval > 255 else arr.copy()


def encode_pnm(arr: np.ndarray) -> bytes:
    """(H, W) → P5, (H, W, 3) → P6 (8-bit)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic, (H, W) = b"P5", arr.shape
    else:
        magic, (H, W, _) = b"P6", arr.shape
    return magic + b"\n%d %d\n255\n" % (W, H) + arr.tobytes()


# ---------------------------------------------------------------------------
# PNG (stdlib zlib inflate + NumPy defilter; 1/2/4/8/16-bit,
# gray/RGB/palette/alpha, non-interlaced and Adam7)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Declared-dimension sanity cap: 64M pixels (a 8192x8192 RGBA16 image is
# ~512 MB decoded — already generous for web-corpus thumbnails/photos).
# Anything larger is treated as hostile and routed to the fallback seam.
_PNG_MAX_PIXELS = 64 * 1024 * 1024

# Adam7 interlace pass geometry (PNG spec §8.2): (x0, y0, xstep, ystep).
# Pass k is the sub-image of pixels at (x0+i*xstep, y0+j*ystep); each pass
# is scanline-filtered INDEPENDENTLY (its own filter bytes, its own
# "previous row"), so defiltering reuses _png_defilter per pass.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_dims(W: int, H: int) -> list[tuple[int, int, int, int, int, int]]:
    """→ [(x0, y0, xs, ys, pass_w, pass_h)] for the non-empty Adam7 passes."""
    out = []
    for x0, y0, xs, ys in _ADAM7:
        pw = (W - x0 + xs - 1) // xs if W > x0 else 0
        ph = (H - y0 + ys - 1) // ys if H > y0 else 0
        if pw > 0 and ph > 0:
            out.append((x0, y0, xs, ys, pw, ph))
    return out


def _png_defilter(raw: np.ndarray, H: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-row byte filters (spec §9: None/Sub/Up/Average/Paeth).

    ``raw`` is the inflated stream: H rows of (1 filter byte + stride
    bytes). Filters operate on BYTES with a lag of ``bpp`` bytes per pixel,
    independent of bit depth. Sub rows collapse to a cumsum per byte lane
    (mod 256); Up is one vector add; Average/Paeth carry a true
    left-dependency, so those rows walk pixel-positions with the bpp lanes
    vectorized."""
    if raw.size != H * (1 + stride):
        raise UnsupportedMediaError("PNG pixel data size mismatch")
    rows = raw.reshape(H, 1 + stride)
    filters = rows[:, 0]
    if filters.max(initial=0) > 4:
        raise UnsupportedMediaError(f"bad PNG filter type {int(filters.max())}")
    out = np.zeros((H, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    npix = stride // bpp
    for r in range(H):
        f = int(filters[r])
        cur = rows[r, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: x[i] = raw[i] + x[i-bpp]  → per-lane cumsum
            lanes = cur[: npix * bpp].reshape(npix, bpp)
            cur[: npix * bpp] = (
                (np.cumsum(lanes.astype(np.uint64), axis=0) & 0xFF)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif f == 2:  # Up
            cur += prev  # uint8 wraps mod 256, exactly the spec
        elif f == 3:  # Average: x[i] = raw[i] + (left + up)//2
            p = prev.astype(np.uint16)
            for i in range(npix):
                s = slice(i * bpp, (i + 1) * bpp)
                left = cur[i * bpp - bpp : i * bpp].astype(np.uint16) if i else 0
                cur[s] = (cur[s] + ((left + p[s]) >> 1)).astype(np.uint8)
        else:  # Paeth
            p16 = prev.astype(np.int16)
            for i in range(npix):
                s = slice(i * bpp, (i + 1) * bpp)
                a = cur[i * bpp - bpp : i * bpp].astype(np.int16) if i else np.zeros(bpp, np.int16)
                b = p16[s]
                c = (
                    prev[i * bpp - bpp : i * bpp].astype(np.int16)
                    if i
                    else np.zeros(bpp, np.int16)
                )
                pa = np.abs(b - c)
                pb = np.abs(a - c)
                pc = np.abs(a + b - 2 * c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                cur[s] = (cur[s].astype(np.int16) + pred).astype(np.uint8)
        out[r] = cur
        prev = cur
    return out


def _unpack_subbyte(px: np.ndarray, H: int, W: int, bitd: int) -> np.ndarray:
    """(H, rowbytes) packed MSB-first 1/2/4-bit samples (PNG spec §7.2:
    low-depth scanlines pack left-to-right from the high bit, last byte
    zero-padded) → (H, W) uint8 sample values."""
    bits = np.unpackbits(px, axis=1)[:, : W * bitd].reshape(H, W, bitd)
    weights = (1 << np.arange(bitd - 1, -1, -1)).astype(np.uint8)
    return (bits * weights[None, None, :]).sum(axis=2, dtype=np.uint16).astype(np.uint8)


def decode_png(payload: bytes) -> tuple[np.ndarray, int]:
    """→ ((H, W) gray or (H, W, 3) RGB array, maxval). Pure stdlib+NumPy:
    chunk walk, zlib inflate, byte defilter. Supports the full spec depth
    table (§11.2.2: gray at 1/2/4/8/16, palette at 1/2/4/8, RGB/alpha at
    8/16), both non-interlaced and Adam7-interlaced streams (each Adam7
    pass defilters independently, then scatters into the frame via strided
    slicing). Sub-byte scanlines defilter as bytes with a one-byte lag
    (§9: filters are byte-wise regardless of depth) and then unpack
    MSB-first; gray maxval is (1<<depth)-1 so callers scale by the header.
    Alpha channels are dropped (features are luma-based), palette rows
    gather through PLTE."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise UnsupportedMediaError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise UnsupportedMediaError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(body) != 13:  # spec-fixed size; unpack is exact-size
                raise UnsupportedMediaError("bad PNG IHDR length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8)
            if len(plte) % 3:
                raise UnsupportedMediaError("bad PLTE length")
            plte = plte.reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + body + crc
    if ihdr is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    W, H, bitd, color, comp, filt, interlace = ihdr
    if W <= 0 or H <= 0:
        raise UnsupportedMediaError("empty PNG")
    if comp != 0 or filt != 0:
        raise UnsupportedMediaError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise UnsupportedMediaError(f"unknown PNG interlace method {interlace}")
    if color not in _PNG_CHANNELS:
        raise UnsupportedMediaError(f"unknown PNG color type {color}")
    # spec §11.2.2 depth table: gray 1/2/4/8/16, palette 1/2/4/8, the
    # multi-channel types 8/16 only
    allowed = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color, (8, 16))
    if bitd not in allowed:
        raise UnsupportedMediaError(f"PNG bit depth {bitd}/color {color} not supported")
    ch = _PNG_CHANNELS[color]
    # filters operate on bytes with a lag of one full pixel, floored to one
    # byte for sub-byte depths (spec §9)
    bpp = max(1, ch * bitd // 8)
    stride = (W * ch * bitd + 7) // 8
    # decompression-bomb guard: IHDR W/H are attacker-controlled in a web
    # corpus, and an unbounded zlib.decompress of a crafted IDAT can
    # allocate gigabytes inside the Arrow UDF (Spark then retries the same
    # partition, so one hostile payload fails the whole job instead of
    # routing to the UnsupportedMediaError fallback). Bound the declared
    # pixel count, inflate at most the exact expected byte count, and
    # reject streams that overflow it.
    if W * H > _PNG_MAX_PIXELS:
        raise UnsupportedMediaError(
            f"PNG dimensions {W}x{H} exceed the {_PNG_MAX_PIXELS}-pixel cap"
        )
    if interlace:
        passes = _adam7_pass_dims(W, H)
        # one filter byte per scanline of each (independently filtered)
        # pass; each pass packs its own scanlines to a byte boundary
        expected = sum(
            ph * (1 + (pw * ch * bitd + 7) // 8) for _, _, _, _, pw, ph in passes
        )
    else:
        passes = []
        expected = H * (1 + stride)  # one filter byte per scanline
    try:
        dec = zlib.decompressobj()
        inflated = dec.decompress(b"".join(idat), expected)
        # anything beyond `expected` is parked in unconsumed_tail; one more
        # capped call tells us whether real pixel bytes remain (a pure
        # zlib trailer yields b"")
        if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
            raise UnsupportedMediaError(
                "PNG IDAT inflates past the declared scanline size"
            )
        if len(inflated) != expected:
            raise UnsupportedMediaError(
                f"PNG IDAT inflated to {len(inflated)} bytes, "
                f"expected {expected}"
            )
        raw = np.frombuffer(inflated, dtype=np.uint8)
    except zlib.error as e:
        raise UnsupportedMediaError(f"PNG inflate failed: {e}") from e
    if interlace and bitd < 8:
        # Sub-byte Adam7: each pass unpacks from its own byte-padded
        # scanlines to per-pixel values, which scatter directly.
        full = np.zeros((H, W), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys, pw, ph in passes:
            rb = (pw * bitd + 7) // 8
            nbytes = ph * (1 + rb)
            sub = _png_defilter(raw[off : off + nbytes], ph, rb, 1)
            full[y0::ys, x0::xs] = _unpack_subbyte(sub, ph, pw, bitd)
            off += nbytes
        arr = full[..., None]
        maxval = (1 << bitd) - 1
    elif interlace:
        # Defilter each Adam7 pass as its own little image, then scatter its
        # pixels into the full frame with strided slicing (spec §8.2).
        full = np.zeros((H, W, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys, pw, ph in passes:
            nbytes = ph * (1 + pw * bpp)
            sub = _png_defilter(raw[off : off + nbytes], ph, pw * bpp, bpp)
            full[y0::ys, x0::xs] = sub.reshape(ph, pw, bpp)
            off += nbytes
        px = full.reshape(H, stride)
    else:
        px = _png_defilter(raw, H, stride, bpp)
    if bitd < 8:
        if not interlace:
            arr = _unpack_subbyte(px, H, W, bitd)[..., None]
        maxval = (1 << bitd) - 1
    elif bitd == 16:
        arr = px.reshape(H, W, ch, 2).astype(np.uint16)
        arr = (arr[..., 0] << 8) | arr[..., 1]  # network byte order
        maxval = 65535
    else:
        arr = px.reshape(H, W, ch)
        maxval = 255
    if color == 3:
        if plte is None:
            raise UnsupportedMediaError("palette PNG missing PLTE")
        idx = arr[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise UnsupportedMediaError("PNG palette index out of range")
        return plte[idx], 255
    if color == 0:
        return arr[..., 0], maxval
    if color == 4:  # gray+alpha → gray
        return arr[..., 0], maxval
    return arr[..., :3], maxval  # RGB / RGBA → RGB


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → non-interlaced 8-bit PNG
    (filter 0 rows, one zlib stream). Round-trip partner of decode_png."""
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        body = a[:, :, None]
    else:
        color, ch = 2, 3
        body = a
    H, W = a.shape[:2]
    rows = np.zeros((H, 1 + W * ch), dtype=np.uint8)
    rows[:, 1:] = body.reshape(H, W * ch)
    comp = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", W, H, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# RIFF/WAVE (PCM 8/16-bit + IEEE float32; any channel count → mono)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (mono float32 samples in [-1, 1], sample_rate). Walks RIFF chunks
    (skips LIST/fact/etc.), supports PCM (format 1) u8/s16/s24/s32, IEEE
    float (format 3) f32/f64, and WAVE_FORMAT_EXTENSIBLE (0xFFFE — the
    required wrapper for >16-bit or multichannel files, whose real format
    code is the first two bytes of the SubFormat GUID at fmt offset 24).
    Multichannel downmixes to mono by mean."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            if len(body) < 16:
                raise UnsupportedMediaError("truncated WAVE fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if len(body) < 26:
                    raise UnsupportedMediaError("truncated WAVE extensible fmt")
                sub = struct.unpack_from("<H", body, 24)[0]
                fmt = (sub,) + fmt[1:]
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("WAVE missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    # tolerate a truncated trailing sample (frombuffer requires whole
    # elements; real-world truncated WAVs are otherwise decodable)
    data = data[: len(data) - len(data) % max(1, bits // 8)]
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 24:
        b = np.frombuffer(data, dtype=np.uint8)
        b = b[: len(b) - len(b) % 3].reshape(-1, 3)
        # little-endian signed 24-bit: sign-extend via int8 on the top byte
        i = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].view(np.int8).astype(np.int32) << 16)
        )
        x = i.astype(np.float32) / 8388608.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_fmt == 3 and bits == 64:
        x = np.frombuffer(data, dtype="<f8").astype(np.float32)
    else:
        raise UnsupportedMediaError(f"WAVE format {audio_fmt}/{bits}bit")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono float32 [-1, 1] → 16-bit PCM WAV bytes."""
    x = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# feature extraction (decode output → FEATURE_DIM vector)
# ---------------------------------------------------------------------------


def _area_pool(gray: np.ndarray, out: int = 8) -> np.ndarray:
    """Exact area-average pooling of a (H, W) float array to (out, out):
    each output cell averages its (possibly fractional) source rectangle —
    the deterministic analog of a box-filter resize."""
    H, W = gray.shape
    ye = np.linspace(0, H, out + 1)
    xe = np.linspace(0, W, out + 1)

    def rect_sum(y0, y1, x0, x1):
        # fractional rectangle via weighted whole-pixel sums
        y0f, y1f, x0f, x1f = (
            int(np.floor(y0)), int(np.ceil(y1)), int(np.floor(x0)), int(np.ceil(x1)),
        )
        sub = gray[y0f:y1f, x0f:x1f].astype(np.float64)
        wy = np.ones(y1f - y0f)
        wy[0] -= y0 - y0f
        wy[-1] -= y1f - y1
        wx = np.ones(x1f - x0f)
        wx[0] -= x0 - x0f
        wx[-1] -= x1f - x1
        return float(wy @ sub @ wx)

    outv = np.empty((out, out), dtype=np.float64)
    for i in range(out):
        for j in range(out):
            area = (ye[i + 1] - ye[i]) * (xe[j + 1] - xe[j])
            outv[i, j] = rect_sum(ye[i], ye[i + 1], xe[j], xe[j + 1]) / area
    return outv


def image_feature(arr: np.ndarray, maxval: int = 255) -> np.ndarray:
    """pixels → 64-dim: ITU-R 601 luma → 8×8 area-average pool → /255
    (mirrors the PIL decoder's convert('L').resize((8, 8)) layout).
    ``maxval`` is the sample range from the container header (PNM maxval;
    255 for BMP/PIL) — scaling by the header, not a data-dependent
    max()>255 probe, keeps features consistent: a 16-bit image whose
    pixels happen to stay ≤255 must not be treated as 8-bit, and a
    maxval-1023 image must not be scaled as if it were 65535."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        gray = a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
    else:
        gray = a
    if maxval != 255:
        gray = gray * (255.0 / maxval)
    return (_area_pool(gray, 8).reshape(FEATURE_DIM) / 255.0).astype(np.float32)


def audio_feature(samples: np.ndarray) -> np.ndarray:
    """mono samples → 64-dim RMS energy profile over equal time segments."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    edges = np.linspace(0, len(x), FEATURE_DIM + 1).astype(np.int64)
    sq = np.concatenate([[0.0], np.cumsum(x * x)])
    seg = sq[edges[1:]] - sq[edges[:-1]]
    n = np.maximum(edges[1:] - edges[:-1], 1)
    return np.sqrt(seg / n).astype(np.float32)


def builtin_decoder(payload: bytes) -> np.ndarray:
    """Format-dispatching real decoder: BMP/PNM/PNG/JPEG/GIF → image
    feature, WAV/FLAC → audio feature. Raises UnsupportedMediaError for formats that need
    a codec library (MP4/unknown) — callers fall back to an injected
    decoder or the documented stub path."""
    kind = sniff_kind(payload or b"")
    try:
        if kind == "bmp":
            return image_feature(decode_bmp(payload))
        if kind == "jpeg":
            from .jpeg import decode_jpeg  # local import: jpeg.py imports us

            arr, maxval = decode_jpeg(payload)
            # maxval is 4095 for 12-bit SOF1/SOF2 frames — scaling by the
            # header keeps features consistent across precisions
            return image_feature(arr, maxval=maxval)
        if kind == "gif":
            from .gif import decode_gif  # local import: gif.py imports us

            return image_feature(decode_gif(payload))
        if kind == "tiff":
            from .tiff import decode_tiff  # local import: tiff.py imports us

            arr, maxval = decode_tiff(payload)
            return image_feature(arr, maxval=maxval)
        if kind == "webp":
            from .webp import decode_webp  # local import: webp.py imports us

            return image_feature(decode_webp(payload))
        if kind == "pnm":
            header = _pnm_header(payload)
            return image_feature(
                decode_pnm(payload, header=header), maxval=header[3]
            )
        if kind == "png":
            arr, maxval = decode_png(payload)
            return image_feature(arr, maxval=maxval)
        if kind == "wav":
            return audio_feature(decode_wav(payload)[0])
        if kind == "flac":
            from .flac import decode_flac  # local import: flac.py imports us

            return audio_feature(decode_flac(payload)[0])
    except UnsupportedMediaError:
        raise
    except (ValueError, IndexError, struct.error, OverflowError) as e:
        # safety net for web-scale garbage: any parse failure a decoder
        # guard missed must degrade to the fallback path, not kill the
        # Spark task (callers only catch UnsupportedMediaError)
        raise UnsupportedMediaError(f"malformed {kind} payload: {e}") from e
    raise UnsupportedMediaError(f"no built-in codec for {kind or 'unknown'} payload")
