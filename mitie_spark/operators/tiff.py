"""Pure-Python/NumPy baseline TIFF decoder (TIFF 6.0, classic format).

TIFF is the remaining still-image container a web crawl surfaces with
any frequency after JPEG/PNG/GIF/BMP (scanned documents, print assets,
some satellite/GIS payloads). The reference engine (mit-nlp/MITIE) has
no image path at all — like operators/gif.py and operators/jpeg.py this
module exists for the LLM-training-data mandate (multimodal columns),
not reference parity; the format is public (Adobe TIFF 6.0
specification, 1992).

Coverage (everything the 6.0 baseline + the two ubiquitous extensions
require):

- both byte orders (``II``/``MM``), first IFD only (a multi-page TIFF
  decodes its first page, which is what a thumbnail/feature pipeline
  wants)
- compressions: 1 (none), 5 (LZW, MSB-first with the spec's
  early-change width bump), 8/32946 (Deflate), 32773 (PackBits)
- photometric 0/1 (bilevel+gray, WhiteIsZero inverted), 2 (RGB, with
  extra samples carried through), 3 (palette → 16-bit RGB)
- bits per sample 1/2/4/8/16, FillOrder 2 (bit-reversed bytes)
- strip AND tile layouts, chunky and planar configuration
- predictor 2 (horizontal differencing) for 8- and 16-bit samples

Unsupported-but-sniffed variants fail fast with
``UnsupportedMediaError`` so corpus tasks degrade per-payload to the
injected-decoder seam: BigTIFF, CCITT/JPEG-in-TIFF compressions,
float/signed SampleFormat, YCbCr/CMYK photometrics, predictor 3.

Design notes mirror the sibling decoders: everything per-pixel after
entropy decode (bit unpack, predictor cumsum, palette gather, plane
interleave) is vectorized NumPy; the LZW inner loop is scalar Python by
necessity (each code's table entry depends on the previous code);
declared dimensions are capped before any allocation, and every
malformed payload raises ``UnsupportedMediaError`` — never a bare
struct/index error.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from mitie_spark.operators.media_codecs import UnsupportedMediaError

# Same declared-dimension sanity cap as the PNG/GIF paths: 64M pixels.
_TIFF_MAX_PIXELS = 64 * 1024 * 1024
_TIFF_MAX_IFD_ENTRIES = 4096

# TIFF field types we materialize → (struct letter, byte size). RATIONALs
# and the signed/float types never carry layout-critical values for the
# supported feature set, so they parse to raw ints we ignore.
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}

_BITREV = np.array(
    [int(f"{b:08b}"[::-1], 2) for b in range(256)], dtype=np.uint8
)


def _read_values(payload: bytes, bo: str, ftype: int, count: int, raw: bytes):
    """Decode one IFD entry's value array (inline when it fits in the
    4-byte slot, else at the pointed-to offset)."""
    size = _TYPE_SIZE.get(ftype)
    if size is None:
        return ()
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(payload):
            raise UnsupportedMediaError("TIFF IFD value past end of file")
        data = payload[off : off + total]
    if ftype in (3, 8):
        return struct.unpack(bo + "%dH" % count, data)
    if ftype in (4, 9, 11):
        return struct.unpack(bo + "%dI" % count, data)
    if ftype in (1, 2, 6, 7):
        return tuple(data)
    return ()  # RATIONAL/DOUBLE: not layout-critical here


def _packbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF compression 32773)."""
    out = bytearray()
    pos, n = 0, len(data)
    while len(out) < expected:
        if pos >= n:
            raise UnsupportedMediaError("truncated TIFF PackBits stream")
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            if pos + h + 1 > n:
                raise UnsupportedMediaError("truncated TIFF PackBits literal")
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if pos >= n:
                raise UnsupportedMediaError("truncated TIFF PackBits repeat")
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op per spec
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW (spec §13): MSB-first variable-width codes, clear=256,
    EOI=257, table capped at 4094 entries, and the *early-change* rule —
    the code width bumps when the NEXT entry index reaches 2**width - 1
    (one code earlier than GIF's LSB-first variant)."""
    clear, eoi = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise UnsupportedMediaError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == clear:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise UnsupportedMediaError("bad TIFF LZW start code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if not entry:
                raise UnsupportedMediaError("bad TIFF LZW code")
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise UnsupportedMediaError("TIFF LZW code past table")
        out += entry
        prev = entry
        # early change (spec §13, matching libtiff's ecosystem-defining
        # convention, cross-checked in tests/test_tiff.py against real
        # libtiff-written streams): the decoder widens when its next free
        # entry index reaches 2**width - 1 — one code earlier than GIF's
        # LSB-first variant, one entry ahead of the matching encoder
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:expected])


def _decompress(data: bytes, compression: int, expected: int) -> bytes:
    if compression == 1:
        if len(data) < expected:
            raise UnsupportedMediaError("truncated TIFF strip/tile data")
        return data[:expected]
    if compression == 5:
        return _lzw_decode(data, expected)
    if compression in (8, 32946):
        try:
            d = zlib.decompressobj()
            out = d.decompress(data, expected)
        except zlib.error as e:
            raise UnsupportedMediaError(f"bad TIFF deflate stream: {e}") from e
        if len(out) < expected:
            raise UnsupportedMediaError("short TIFF deflate stream")
        return out
    if compression == 32773:
        return _packbits(data, expected)
    raise UnsupportedMediaError(f"TIFF compression {compression} not supported")


def _unpack_bits(rows: np.ndarray, width_px: int, bits: int) -> np.ndarray:
    """(nrows, rowbytes) uint8 → (nrows, width_px) sample values for
    sub-byte depths (MSB-first within each byte, per TIFF FillOrder 1)."""
    if bits == 1:
        return np.unpackbits(rows, axis=1)[:, :width_px]
    if bits == 2:
        b = rows[:, :, None]
        quads = np.concatenate(
            [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3], axis=2
        ).reshape(rows.shape[0], -1)
        return quads[:, :width_px]
    # bits == 4
    b = rows[:, :, None]
    nib = np.concatenate([(b >> 4) & 15, b & 15], axis=2).reshape(rows.shape[0], -1)
    return nib[:, :width_px]


def _segment_to_samples(
    raw: bytes, nrows: int, width_px: int, spp: int, bits: int, bo: str,
    predictor: int,
) -> np.ndarray:
    """One decompressed strip/tile → (nrows, width_px, spp) uint8/uint16
    samples (spp here is the samples stored in THIS segment: the full
    count for chunky data, 1 for a planar plane)."""
    row_bytes = (width_px * spp * bits + 7) // 8
    need = row_bytes * nrows
    if len(raw) < need:
        raise UnsupportedMediaError("TIFF strip/tile shorter than its rows")
    rows = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(nrows, row_bytes)
    if bits == 8:
        px = rows[:, : width_px * spp]
    elif bits == 16:
        px = rows[:, : width_px * spp * 2].copy().view(
            np.dtype(("<" if bo == "<" else ">") + "u2")
        )
        px = px.astype(np.uint16)  # native order from here on
    else:
        px = _unpack_bits(rows, width_px * spp, bits)
    px = px.reshape(nrows, width_px, spp)
    if predictor == 2:
        if bits not in (8, 16):
            raise UnsupportedMediaError(
                f"TIFF predictor 2 with {bits}-bit samples"
            )
        # horizontal differencing: each sample stores the delta from its
        # left neighbor (per channel, per row); integer wraparound is
        # part of the format
        px = np.cumsum(px, axis=1, dtype=np.uint64).astype(px.dtype)
    return px


def decode_tiff(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a classic TIFF payload → ``(pixels, maxval)`` where pixels
    is (H, W) grayscale or (H, W, C) with C in {3, 4}, dtype uint8 or
    uint16, and ``maxval`` is the sample range implied by the header
    (palette output is always 16-bit/65535 per the ColorMap definition).
    """
    if len(payload) < 8:
        raise UnsupportedMediaError("not a TIFF payload")
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    elif payload[:2] in (b"II", b"MM") and payload[2:4] in (b"+\x00", b"\x00+"):
        raise UnsupportedMediaError("BigTIFF not supported")
    else:
        raise UnsupportedMediaError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise UnsupportedMediaError("TIFF IFD offset past end of file")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    if not 0 < n_entries <= _TIFF_MAX_IFD_ENTRIES:
        raise UnsupportedMediaError(f"TIFF IFD entry count {n_entries}")
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise UnsupportedMediaError("truncated TIFF IFD")

    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, ftype = struct.unpack_from(bo + "HH", payload, off)
        (count,) = struct.unpack_from(bo + "I", payload, off + 4)
        if count > _TIFF_MAX_PIXELS:
            raise UnsupportedMediaError(f"TIFF tag {tag} count {count}")
        tags[tag] = _read_values(payload, bo, ftype, count, payload[off + 8 : off + 12])

    def tag1(t: int, default=None):
        v = tags.get(t)
        if not v:
            if default is None:
                raise UnsupportedMediaError(f"TIFF missing required tag {t}")
            return default
        return v[0]

    W = tag1(256)
    H = tag1(257)
    if not (0 < W and 0 < H) or W * H > _TIFF_MAX_PIXELS:
        raise UnsupportedMediaError(f"TIFF dimensions {W}x{H}")
    spp = tag1(277, 1)
    if not 1 <= spp <= 8:
        raise UnsupportedMediaError(f"TIFF samples per pixel {spp}")
    bits_arr = tags.get(258, (1,) * spp)
    if len(set(bits_arr)) != 1:
        raise UnsupportedMediaError(f"TIFF mixed bits per sample {bits_arr}")
    bits = bits_arr[0]
    if bits not in (1, 2, 4, 8, 16):
        raise UnsupportedMediaError(f"TIFF {bits}-bit samples not supported")
    compression = tag1(259, 1)
    photometric = tag1(262)
    fill_order = tag1(266, 1)
    planar = tag1(284, 1)
    predictor = tag1(317, 1)
    if predictor not in (1, 2):
        raise UnsupportedMediaError(f"TIFF predictor {predictor} not supported")
    sample_format = tags.get(339, (1,) * spp)
    if any(sf not in (0, 1) for sf in sample_format):
        raise UnsupportedMediaError(
            f"TIFF sample format {sample_format} not supported (uint only)"
        )
    if fill_order not in (1, 2):
        raise UnsupportedMediaError(f"TIFF fill order {fill_order}")
    if planar not in (1, 2):
        raise UnsupportedMediaError(f"TIFF planar configuration {planar}")
    if photometric not in (0, 1, 2, 3):
        raise UnsupportedMediaError(
            f"TIFF photometric {photometric} not supported"
        )
    if photometric == 2 and spp < 3:
        raise UnsupportedMediaError("TIFF RGB with fewer than 3 samples")
    if photometric == 3 and (spp != 1 or 320 not in tags):
        raise UnsupportedMediaError("TIFF palette image without a ColorMap")

    tiled = 322 in tags or 324 in tags
    if tiled:
        tw = tag1(322)
        th = tag1(323)
        offsets = tags.get(324, ())
        counts = tags.get(325, ())
        if not (0 < tw <= W + 4096 and 0 < th <= H + 4096) or tw % 16 or th % 16:
            raise UnsupportedMediaError(f"TIFF tile size {tw}x{th}")
    else:
        tw, th = W, tag1(278, H)
        if th <= 0:
            raise UnsupportedMediaError("TIFF RowsPerStrip <= 0")
        th = min(th, H)
        offsets = tags.get(273, ())
        counts = tags.get(279, ())
    across = (W + tw - 1) // tw
    down = (H + th - 1) // th
    per_plane = across * down
    n_planes = spp if planar == 2 else 1
    seg_spp = 1 if planar == 2 else spp
    if len(offsets) != per_plane * n_planes or len(counts) != len(offsets):
        raise UnsupportedMediaError(
            f"TIFF expects {per_plane * n_planes} segments, "
            f"has {len(offsets)} offsets / {len(counts)} counts"
        )

    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.zeros((H, W, spp), dtype=dtype)
    for plane in range(n_planes):
        for seg in range(per_plane):
            idx = plane * per_plane + seg
            o, c = offsets[idx], counts[idx]
            if o + c > len(payload):
                raise UnsupportedMediaError("TIFF segment past end of file")
            data = payload[o : o + c]
            if fill_order == 2:
                data = _BITREV[np.frombuffer(data, dtype=np.uint8)].tobytes()
            ty, tx = divmod(seg, across)
            y0 = ty * th
            x0 = tx * tw
            rows_here = th if tiled else min(th, H - y0)
            cols_here = tw if tiled else W
            expected = ((cols_here * seg_spp * bits + 7) // 8) * rows_here
            raw = _decompress(data, compression, expected)
            px = _segment_to_samples(
                raw, rows_here, cols_here, seg_spp, bits, bo, predictor
            )
            vis_r = min(rows_here, H - y0)
            vis_c = min(cols_here, W - x0)
            tgt = out[y0 : y0 + vis_r, x0 : x0 + vis_c]
            if planar == 2:
                tgt[:, :, plane] = px[:vis_r, :vis_c, 0]
            else:
                tgt[:, :, :] = px[:vis_r, :vis_c, :]

    maxval = (1 << bits) - 1
    if photometric == 0:  # WhiteIsZero
        out = (maxval - out.astype(np.int64)).astype(dtype)
    if photometric == 3:
        cmap = tags[320]
        n_colors = 1 << bits
        if len(cmap) < 3 * n_colors:
            raise UnsupportedMediaError("TIFF ColorMap shorter than palette")
        pal = np.asarray(cmap[: 3 * n_colors], dtype=np.uint16).reshape(3, n_colors)
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= n_colors:
            raise UnsupportedMediaError("TIFF palette index out of range")
        return np.stack([pal[0][idx], pal[1][idx], pal[2][idx]], axis=-1), 65535
    if spp == 1:
        return out[:, :, 0], maxval
    if spp == 2:  # gray + alpha: feature path wants the gray plane
        return out[:, :, 0], maxval
    if spp > 4:
        out = out[:, :, :4]
    return out, maxval
