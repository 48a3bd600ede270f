"""Dependency-free baseline JPEG codec (the dominant image format of a
100-TB web corpus).

The DECODER is the product surface: it reads arbitrary baseline JFIF/EXIF
streams — SOF0, stream-carried DQT/DHT tables (never assumes the spec's
example tables), any sampling factors (4:4:4 / 4:2:2 / 4:2:0 / grayscale),
restart markers, 0xFF00 byte stuffing — to an (h, w, 3) uint8 RGB array.
Per-block entropy decoding is Python ints (bounded by block count);
dequantize + IDCT + level shift run as ONE vectorized einsum over all
blocks of a component, so the heavy math is numpy.

The ENCODER exists for re-emit (resize writes valid JPEG back, like the
BMP path) and round-trip tests. It writes valid-but-simple canonical
Huffman tables (12 DC symbols @ 5 bits, 162 AC run/size symbols @ 8
bits — generated, not transcribed, so no mistyped spec table can hide) —
~30% larger files than libjpeg's optimized tables, decodable by any
conformant reader. Quality scales the Annex-K-style quant tables with
the libjpeg rule.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError like a missing codec build would.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants ----------------------------------------------------


def _zigzag() -> np.ndarray:
    """Flat block index for each of the 64 zigzag scan positions."""
    out = []
    for d in range(15):
        cells = [(r, d - r) for r in range(8) if 0 <= d - r < 8]
        if d % 2 == 0:          # even diagonals run bottom-left → top-right
            cells.reverse()
        out.extend(r * 8 + c for r, c in cells)
    return np.array(out, dtype=np.int64)


ZZ = _zigzag()

# Annex-K-style base quantization tables (carried in DQT either way)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] /= np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _build_huff_decode(bits: list[int], vals: bytes) -> dict:
    """{(length, code): symbol} canonical Huffman decode table."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# --- header scan ---------------------------------------------------------

_SOF_BASELINE = {0xC0, 0xC1}          # baseline + extended sequential
_SOF_UNSUPPORTED = {0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _corrupt_to_value_error(fn):
    """Corrupt payloads that pass the SOI sniff can still blow up the
    marker walk / entropy decode with struct.error (truncated segment
    header), IndexError (missing restart interval), KeyError (missing
    DHT id), or StopIteration (SOS names an unknown component). The
    actor pools' fail-soft path catches ValueError — normalize here so
    one truncated web-corpus JPEG lands in n_malformed instead of
    killing the Ray task."""
    import functools

    @functools.wraps(fn)
    def wrapper(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except (struct.error, IndexError, KeyError, StopIteration) as e:
            raise ValueError(
                f"corrupt JPEG ({type(e).__name__}: {e})") from e
    return wrapper


@_corrupt_to_value_error
def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the SOF marker — a cheap header scan that
    never entropy-decodes."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xFF:         # spec-legal fill byte before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if marker in _SOF_BASELINE or marker in _SOF_UNSUPPORTED:
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            return w, h
        pos += 2 + seglen
    raise ValueError("no SOF marker found")


# --- decoder -------------------------------------------------------------


class _BitReader:
    """MSB-first reader over a destuffed entropy interval."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = self.buf >> self.nbits
        self.buf &= (1 << self.nbits) - 1
        return v

    def read_huff(self, lut: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _entropy_intervals(payload: bytes, start: int) -> list[bytes]:
    """Destuffed entropy-coded segments of one scan, split at RSTn."""
    out = []
    cur = bytearray()
    pos = start
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            out.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:                      # real marker: end of scan
            break
    out.append(bytes(cur))
    return out


@_corrupt_to_value_error
def decode_jpeg(payload: bytes):
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale replicates)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}      # (class, id) → lut
    comps: list[dict] = []
    W = H = 0
    restart = 0
    scan_comps: list[dict] = []
    entropy_start = -1

    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xFF:         # spec-legal fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2: pos + seglen]
        if marker == 0xDB:                         # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64, dtype=np.int64)
                q[ZZ] = np.frombuffer(seg[i:i + 64], np.uint8)
                qtables[tq] = q
                i += 64
        elif marker == 0xC4:                       # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = seg[i + 17:i + 17 + nv]
                huff[(tc, th)] = _build_huff_decode(bits, vals)
                i += 17 + nv
        elif marker in _SOF_BASELINE:
            prec, H, W, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:                       # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                       # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan_comps.append({**comp, "td": tt >> 4, "ta": tt & 0xF})
            entropy_start = pos + seglen
            break
        pos += seglen

    if not comps or entropy_start < 0:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    # coefficient grids per component: (rows, cols, 64)
    for c in scan_comps:
        c["blocks"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                               dtype=np.int64)
        c["pred"] = 0

    intervals = _entropy_intervals(payload, entropy_start)
    reader = _BitReader(intervals[0])
    interval_i = 0
    since_restart = 0

    for my in range(mcuy):
        for mx in range(mcux):
            if restart and since_restart == restart:
                interval_i += 1
                reader = _BitReader(intervals[interval_i])
                since_restart = 0
                for c in scan_comps:
                    c["pred"] = 0
            for c in scan_comps:
                dc_lut = huff[(0, c["td"])]
                ac_lut = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = reader.read_huff(dc_lut)
                        diff = _extend(reader.read(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(ac_lut)
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16      # ZRL
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(reader.read(sz), sz)
                            k += 1
                        c["blocks"][my * c["v"] + by,
                                    mx * c["h"] + bx] = blk
            since_restart += 1

    # vectorized dequantize + inverse zigzag + IDCT + level shift
    # (blk[k] above is in zigzag-SCAN position order; ZZ maps to the
    # natural 8×8 block order)
    planes = []
    for c in scan_comps:
        q = qtables[c["tq"]][ZZ]                 # quant in scan order
        rows, cols, _ = c["blocks"].shape
        deq = c["blocks"].astype(np.float64) * q  # (rows, cols, 64) scan
        coef = np.zeros_like(deq)
        coef[:, :, ZZ] = deq                      # → natural block order
        coef = coef.reshape(rows, cols, 8, 8)
        pix = np.einsum("ux,rcuv,vy->rcxy", _DCT, coef, _DCT,
                        optimize=True) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        ch = -(-H * c["v"] // vmax)
        cw = -(-W * c["h"] // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:H, :W]
        planes.append(np.clip(np.round(plane), 0, 255))

    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# --- encoder -------------------------------------------------------------


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _simple_huff_encode(nsym_dc: bool) -> tuple[list[int], bytes, dict]:
    """Valid canonical tables, generated not transcribed: 12 DC size
    symbols at 5 bits, or the 162 AC run/size symbols at 8 bits."""
    if nsym_dc:
        vals = bytes(range(12))
        bits = [0] * 16
        bits[4] = 12                 # all length 5
        ln = 5
    else:
        syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                               for s in range(1, 11)]
        vals = bytes(syms)
        bits = [0] * 16
        bits[7] = len(syms)          # all length 8
        ln = 8
    enc = {v: (ln, i) for i, v in enumerate(vals)}
    return bits, vals, enc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.buf = (self.buf << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _encode_block(w: _BitWriter, blk: np.ndarray, pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    """Encode one quantized block given in NATURAL order; returns new DC
    predictor."""
    zz = blk[ZZ]
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    if diff < 0:
        code_v = diff + (1 << s) - 1
    else:
        code_v = diff
    ln, code = dc_enc[s]
    w.write(code, ln)
    if s:
        w.write(code_v, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        cv = v + (1 << s) - 1 if v < 0 else v
        ln, code = ac_enc[(run << 4) | s]
        w.write(code, ln)
        w.write(cv, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(pixels, quality: int = 85,
                subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) → baseline JFIF bytes.
    ``subsampling``: "444" or "420" (color only)."""
    arr = np.asarray(pixels)
    gray = arr.ndim == 2
    H, W = arr.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be 444 or 420")
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            def down2(p):
                ph = p[: (p.shape[0] // 2) * 2, : (p.shape[1] // 2) * 2]
                if ph.size == 0:      # 1-pixel-wide/high edge case
                    return p[::2, ::2]
                d = ph.reshape(ph.shape[0] // 2, 2,
                               ph.shape[1] // 2, 2).mean(axis=(1, 3))
                return d
            planes = [y, down2(cb), down2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    qt = [_scaled_quant(_QUANT_LUMA, quality),
          _scaled_quant(_QUANT_CHROMA, quality)]
    dc_bits, dc_vals, dc_enc = _simple_huff_encode(True)
    ac_bits, ac_vals, ac_enc = _simple_huff_encode(False)

    # pad + block + DCT + quantize each plane up front (vectorized)
    qblocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        bw, bh = mcux * sh, mcuy * sv
        full = np.empty((bh * 8, bw * 8), dtype=np.float64)
        ph, pw = p.shape
        full[:ph, :pw] = p
        full[ph:, :pw] = p[ph - 1:ph, :]          # edge replicate
        full[:, pw:] = full[:, pw - 1:pw]
        shifted = full - 128.0
        blocks = shifted.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,rcxy,vy->rcuv", _DCT, blocks, _DCT,
                         optimize=True)
        q = qt[0 if ci == 0 else 1].reshape(8, 8)
        qb = np.round(coef / q).astype(np.int64)
        qblocks.append(qb.reshape(bh, bw, 64))

    w = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        blk = qblocks[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            w, blk.reshape(64), preds[ci],
                            dc_enc, ac_enc)
    entropy = w.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for ti in range(2 if not gray else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) \
            + bytes(int(v) for v in qt[ti][ZZ])
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, H, W, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)),
                             (1, (ac_bits, ac_vals))):
        for th in range(2 if not gray else 1):
            seg = bytes([(tc << 4) | th]) + bytes(bits) + vals
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for ci in range(nc):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
