"""Dependency-free PNG codec (stdlib zlib + the five scanline filters).

Web image corpora are JPEG+PNG; the reference ingests PNGs through PIL
(SmolDocling-OCR structure_engine.py:319-323). This decoder reads real
PNG streams — all five color types (gray, RGB, palette, gray+alpha,
RGBA), bit depths 1/2/4/8/16, tRNS palette transparency, multi-IDAT —
to an (h, w, 3|4) uint8 array. The unfilter step runs per scanline:
None/Up are pure numpy, Sub is a vectorized per-lane cumulative sum,
Average/Paeth fall back to a per-byte loop (their left+up dependency is
inherently sequential; a production build would drop in a compiled
kernel, the call shape doesn't change).

The ENCODER exists for re-emit (resize writes valid PNG back) and
round-trip tests: 8-bit gray/RGB/RGBA, filter 0 scanlines, one zlib
IDAT — bit-exact round trips because PNG is lossless.

Adam7 interlacing decodes too (seven independently-filtered passes
scattered onto the pixel grid). All corrupt-stream failure modes
normalize to ValueError
so the actor pools' fail-soft path catches them (same contract as
kernels/jpeg.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _corrupt_to_value_error(fn):
    """Normalize every corrupt-stream failure (truncated chunk header,
    bad zlib data, short pixel buffer) to ValueError — the exception the
    actor pools' fail-soft path catches."""
    import functools

    @functools.wraps(fn)
    def wrapper(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except (struct.error, IndexError, KeyError, zlib.error) as e:
            raise ValueError(
                f"corrupt PNG ({type(e).__name__}: {e})") from e
    return wrapper


def _chunks(payload: bytes):
    """(type, data) for each chunk; CRCs are not verified (tolerant
    reader), truncation raises ValueError."""
    if not payload.startswith(_SIG):
        raise ValueError("not a PNG (missing signature)")
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + ln                  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG (no IEND)")


@_corrupt_to_value_error
def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from IHDR — cheap header scan, no inflate."""
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            return w, h
        break                            # IHDR must come first
    raise ValueError("PNG missing IHDR")


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters → (h, stride) uint8."""
    expected = (stride + 1) * h
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    arr = np.frombuffer(raw, np.uint8,
                        count=expected).reshape(h, stride + 1)
    filters = arr[:, 0]
    rows = arr[:, 1:]
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        if f == 0:                       # None
            rec = row.copy()
        elif f == 1:                     # Sub: per-lane cumsum mod 256
            lanes = row.reshape(-1, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(
                np.uint8).reshape(-1)
        elif f == 2:                     # Up (uint8 add wraps mod 256)
            rec = row + prev
        elif f == 3:                     # Average
            r = row.astype(np.int64)
            up = prev.astype(np.int64)
            for x in range(stride):
                left = r[x - bpp] if x >= bpp else 0
                r[x] = (r[x] + ((left + up[x]) >> 1)) & 0xFF
            rec = r.astype(np.uint8)
        elif f == 4:                     # Paeth
            r = row.astype(np.int64)
            up = prev.astype(np.int64)
            for x in range(stride):
                a = r[x - bpp] if x >= bpp else 0
                b = up[x]
                c = up[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc_ else \
                    b if pb <= pc_ else c
                r[x] = (r[x] + pred) & 0xFF
            rec = r.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        recon[y] = rec
        prev = rec
    return recon


def _unpack_subbyte(recon: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride) packed 1/2/4-bit samples → (h, w) int values."""
    bits = np.unpackbits(recon, axis=1)[:, : w * depth]
    groups = bits.reshape(recon.shape[0], w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
    return (groups * weights).sum(axis=2)


def _samples_of(recon: np.ndarray, w: int, ch: int, depth: int,
                stride: int) -> np.ndarray:
    """Unfiltered scanline bytes → (h, w, ch) int64 sample grid."""
    h = recon.shape[0]
    if depth == 8:
        return recon[:, : w * ch].reshape(h, w, ch).astype(np.int64)
    if depth == 16:                      # high byte ≙ 8-bit downsample
        return recon.reshape(h, stride // 2, 2)[:, : w * ch, 0] \
            .reshape(h, w, ch).astype(np.int64)
    return _unpack_subbyte(recon, w, depth)[..., None]


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _deinterlace_adam7(raw: bytes, w: int, h: int, ch: int, depth: int,
                       bpp: int) -> np.ndarray:
    """Adam7: the inflated stream is seven independently-filtered
    sub-images; unfilter each pass and scatter its pixels onto the
    (h, w, ch) grid at the pass's offsets/strides."""
    out = np.zeros((h, w, ch), np.int64)
    offset = 0
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        stride_p = (wp * ch * depth + 7) // 8
        size = (stride_p + 1) * hp
        recon = _unfilter(raw[offset:offset + size], hp, stride_p, bpp)
        offset += size
        out[y0::dy, x0::dx] = _samples_of(recon, wp, ch, depth,
                                          stride_p)
    return out


@_corrupt_to_value_error
def decode_png(payload: bytes) -> np.ndarray:
    """PNG byte stream → (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when the
    stream carries alpha (color types 4/6, or palette with tRNS)."""
    w = h = depth = color = interlace = None
    idat = bytearray()
    palette = None
    trns = None
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack_from(">IIBBBBB", data, 0)
            if comp != 0 or filt != 0:
                raise ValueError("unknown PNG compression/filter method")
        elif ctype == b"PLTE":
            palette = np.frombuffer(
                data[: (len(data) // 3) * 3], np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    ch = _CHANNELS[color]
    if depth not in (1, 2, 4, 8, 16) or \
            (depth < 8 and color not in (0, 3)) or \
            (depth == 16 and color == 3):
        raise ValueError(f"illegal PNG depth {depth} for color {color}")

    raw = zlib.decompress(bytes(idat))
    bpp = max(1, (ch * depth) // 8)
    if interlace:                        # Adam7: seven filtered passes
        samples = _deinterlace_adam7(raw, w, h, ch, depth, bpp)
    else:
        stride = (w * ch * depth + 7) // 8
        recon = _unfilter(raw, h, stride, bpp)
        samples = _samples_of(recon, w, ch, depth, stride)

    if color == 3:                       # palette lookup
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx].astype(np.uint8)
        if trns:
            alpha_lut = np.full(len(palette), 255, np.uint8)
            alpha_lut[: len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha_lut[idx]])
        return rgb
    if color == 0:                       # grayscale → replicate
        g = samples[:, :, 0]
        if depth < 8:                    # scale to full 8-bit range
            g = g * (255 // ((1 << depth) - 1))
        g = g.astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if color == 4:                       # gray + alpha → RGBA
        g = samples[:, :, 0].astype(np.uint8)
        a = samples[:, :, 1].astype(np.uint8)
        return np.dstack([g, g, g, a])
    return samples.astype(np.uint8)      # color 2 (RGB) / 6 (RGBA)


def encode_png(pixels) -> bytes:
    """(h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA uint8 → PNG bytes
    (8-bit, filter-0 scanlines, single zlib IDAT). Lossless: decode ∘
    encode is bit-exact."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    h, w = arr.shape[:2]
    raw = np.zeros((h, 1 + w * ch), np.uint8)   # filter byte 0 per row
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)
                              & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
