"""The REAL dependency-free codecs: uncompressed 24-bit BMP (struct +
numpy) and PCM WAV (stdlib wave) — decoded, resized, and featurized
through the actual actor-pool pipelines, not just the kernel functions."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from raydoc.functions.multimodal import (
    audio_feature_pipeline, bmp_pixels, decode_audio, decode_image,
    make_bmp, make_wav, media_pipeline, resize_image, resize_pipeline)


def _gradient_bmp(w: int, h: int) -> bytes:
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[..., 0] = np.arange(w, dtype=np.uint8)[None, :]       # B ramp
    px[..., 1] = np.arange(h, dtype=np.uint8)[:, None]       # G ramp
    px[..., 2] = 7
    return make_bmp(px)


def test_bmp_roundtrip_exact():
    px = (np.arange(5 * 3 * 3, dtype=np.uint8)).reshape(5, 3, 3)
    out = bmp_pixels(make_bmp(px))
    assert out.shape == (5, 3, 3)
    assert np.array_equal(out, px)


def test_bmp_decode_dims_and_padding():
    # w=3 -> 9-byte rows pad to 12: exercises the stride logic
    assert decode_image(_gradient_bmp(3, 5)) == (3, 5)
    assert decode_image(_gradient_bmp(64, 48)) == (64, 48)


def test_bmp_resize_real_pixels():
    payload, nw, nh = resize_image(_gradient_bmp(64, 48), max_side=16)
    assert (nw, nh) == (16, 12)
    px = bmp_pixels(payload)
    assert px.shape == (12, 16, 3)
    assert (px[..., 2] == 7).all()          # constant channel survives
    assert (np.diff(px[0, :, 0].astype(int)) >= 0).all()  # B ramp keeps order


def test_wav_roundtrip_and_features():
    rate = 8000
    samples = (np.sin(np.arange(rate) * 0.05) * 20000).astype(np.int16)
    got_rate, got = decode_audio(make_wav(rate, samples))
    assert got_rate == rate
    assert np.array_equal(got, samples)


def test_media_pipeline_decodes_real_bmp(ray_session):
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([_gradient_bmp(32, 8), b"\x89PNG\r\n"],
                            pa.binary()),
        "mime": ["image/bmp", "image/png"],
    })
    rows = sorted(media_pipeline(rd.from_arrow(t)).take_all(),
                  key=lambda r: r["media_id"])
    assert rows[0]["decoded"] and (rows[0]["width"], rows[0]["height"]) == (32, 8)
    assert not rows[1]["decoded"]


def test_resize_pipeline_real_bmp(ray_session):
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([_gradient_bmp(100, 40)], pa.binary()),
        "mime": ["image/bmp"],
    })
    rows = resize_pipeline(rd.from_arrow(t), max_side=25).take_all()
    assert rows[0]["resized"]
    assert (rows[0]["width"], rows[0]["height"]) == (25, 10)
    assert bmp_pixels(rows[0]["payload"]).shape == (10, 25, 3)


def test_audio_pipeline_real_wav(ray_session):
    rate = 4000
    # 2-second full-scale square wave: rms == peak == 1.0 exactly
    samples = np.full(2 * rate, 32767, dtype=np.int16)
    samples[::2] = -32767
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([make_wav(rate, samples), b"ID3\x04mp3junk"],
                            pa.binary()),
        "mime": ["audio/wav", "audio/mpeg"],
    })
    rows = sorted(audio_feature_pipeline(rd.from_arrow(t)).take_all(),
                  key=lambda r: r["media_id"])
    assert rows[0]["decoded"]
    assert abs(rows[0]["duration_sec"] - 2.0) < 1e-9
    assert abs(rows[0]["rms"] - 32767 / 32768) < 1e-9
    assert not rows[1]["decoded"]


def test_malformed_payloads_fail_soft(ray_session):
    """Truncated BMP/WAV headers must mark decoded=False, never kill the
    actor (ValueError is caught alongside NotImplementedError)."""
    bad_bmp = _gradient_bmp(8, 8)[:30]
    bad_wav = make_wav(8000, np.zeros(16, dtype=np.int16))[:20]
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([bad_bmp, bad_wav], pa.binary()),
        "mime": ["image/bmp", "audio/wav"],
    })
    rows = sorted(media_pipeline(rd.from_arrow(t)).take_all(),
                  key=lambda r: r["media_id"])
    assert [r["decoded"] for r in rows] == [False, False]
    arows = sorted(audio_feature_pipeline(rd.from_arrow(t)).take_all(),
                   key=lambda r: r["media_id"])
    assert [r["decoded"] for r in arows] == [False, False]


def test_y4m_demux_and_sampling(ray_session):
    """Real YUV4MPEG2 parsing: header-derived frame size, FRAME markers,
    every_n sampling, truncation and bad-marker failure."""
    import pytest

    from raydoc.functions.multimodal import _parse_y4m, sample_frames

    w, h = 4, 2
    fsize = w * h * 3 // 2                       # C420: 12 bytes
    frames = [bytes([i]) * fsize for i in range(5)]
    payload = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + f for f in frames)
    got = _parse_y4m(payload)
    assert got == frames
    assert sample_frames(payload, 2) == frames[::2]

    mono = b"YUV4MPEG2 W4 H2 Cmono\n" + b"FRAME\n" + b"\x07" * (w * h)
    assert _parse_y4m(mono) == [b"\x07" * (w * h)]

    with pytest.raises(ValueError):
        _parse_y4m(payload[:-3])                 # truncated last frame
    with pytest.raises(ValueError):
        _parse_y4m(b"YUV4MPEG2 W4 H2 C420\n" + b"FRUME\n" + b"x" * fsize)
    with pytest.raises(ValueError):
        _parse_y4m(b"YUV4MPEG2 C420\n")          # missing W/H


def test_y4m_rejects_high_bit_depth(ray_session):
    """10/12-bit and alpha colorspaces must be REJECTED as unsupported,
    not mis-sized as their 8-bit base format."""
    import pytest

    from raydoc.functions.multimodal import _parse_y4m

    for cs in ["C420p10", "C422p12", "C444alpha"]:
        payload = (f"YUV4MPEG2 W4 H2 {cs}\n".encode()
                   + b"FRAME\n" + b"\x00" * 64)
        with pytest.raises(ValueError, match="colorspace"):
            _parse_y4m(payload)


def test_ahash_planted_neardups_match_reference(ray_session):
    """phash_neardups == brute-force pure-Python reference on sf0.001:
    planted same-base images pair (hamming ≤ 3 guaranteed by banding's
    pigeonhole), different bases don't."""
    import pyarrow.parquet as pq

    from raydoc.functions.multimodal import (ahash64, make_test_bmp,
                                             phash_neardups)

    sf = "/root/testdata/sf0.001"
    got = phash_neardups(sf)
    got_pairs = {(a, b): h for a, b, h in
                 zip(got["a"].to_pylist(), got["b"].to_pylist(),
                     got["hamming"].to_pylist())}

    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    nrows = len(ids)
    n_bases = max(40, nrows // 12)
    sigs = {i: ahash64(make_test_bmp(i, n_bases=n_bases)) for i in ids}
    want = {}
    sids = sorted(ids)
    for x in range(len(sids)):
        for y in range(x + 1, len(sids)):
            i, j = sids[x], sids[y]
            d = bin(sigs[i] ^ sigs[j]).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got_pairs == want
    assert len(want) > 0
    # every reported pair comes from the same planted base
    for a, b in want:
        assert a % n_bases == b % n_bases


def test_ahash_invariant_to_noise_but_not_base():
    from raydoc.functions.multimodal import ahash64, make_test_bmp

    h0 = ahash64(make_test_bmp(0, n_bases=40))
    h40 = ahash64(make_test_bmp(40, n_bases=40))   # same base, new noise
    h1 = ahash64(make_test_bmp(1, n_bases=40))     # different base
    assert bin(h0 ^ h40).count("1") <= 3
    assert bin(h0 ^ h1).count("1") > 3
    # byte-level the two same-base images still differ (near-dup, not dup)
    assert make_test_bmp(0, n_bases=40) != make_test_bmp(40, n_bases=40)


def test_phash_clusters_match_planted_bases(ray_session):
    """phash_clusters: every reported cluster is exactly the set of
    docs sharing one planted base (restricted to docs whose pairs
    survived the hamming cut), labeled by its min member."""
    import pyarrow.parquet as pq

    from raydoc.functions.multimodal import phash_clusters

    sf = "/root/testdata/sf0.001"
    got = phash_clusters(sf)
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    n_bases = max(40, len(ids) // 12)
    members = {}
    for m, c in zip(got["media_id"].to_pylist(),
                    got["cluster"].to_pylist()):
        members.setdefault(c, []).append(m)
    assert members, "expected planted clusters"
    for c, ms in members.items():
        assert c == min(ms)
        assert len({m % n_bases for m in ms}) == 1


def test_audio_corpus_stats_known_answer(ray_session):
    """Counters reproduce the synthesis plan exactly: malformed =
    ids % 17 == 0, loud = amplitude >= 5000 (rms = amp/32768 exact)."""
    import duckdb

    from raydoc.functions.multimodal import audio_corpus_stats

    sf = "/root/testdata/sf0.001"
    r = audio_corpus_stats(sf).to_pylist()[0]
    ids = [x[0] for x in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()]
    exp_malformed = sum(1 for i in ids if i % 17 == 0)
    exp_loud = sum(1 for i in ids
                   if i % 17 != 0 and 2000 + (i % 8) * 3000 > 4915)
    assert r["n_media"] == len(ids)
    assert r["n_malformed"] == exp_malformed
    assert r["n_decoded"] == len(ids) - exp_malformed
    assert r["n_loud"] == exp_loud
    assert 0 < exp_loud < len(ids) - exp_malformed  # non-vacuous


# --- baseline JPEG (kernels/jpeg.py) ------------------------------------


def test_jpeg_uniform_roundtrips_exactly():
    """A uniform image is DC-only — quantization cannot touch it, so the
    round-trip must be bit-exact."""
    import numpy as np
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg, jpeg_dims

    for level in (0, 77, 128, 255):
        img = np.full((16, 24), level, np.uint8)
        b = encode_jpeg(img, quality=85)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        assert jpeg_dims(b) == (24, 16)
        out = decode_jpeg(b)
        assert out.shape == (16, 24, 3)
        assert int(np.abs(out.astype(int) - level).max()) == 0


def test_jpeg_color_roundtrip_both_subsamplings():
    import numpy as np
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg

    h, w = 33, 47                      # non-multiple-of-16 dims
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    img = np.stack([np.tile(x, (h, 1)), np.tile(y[:, None], (1, w)),
                    np.full((h, w), 64)], axis=2).astype(np.uint8)
    for ss, tol in (("444", 8), ("420", 20)):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=ss))
        assert out.shape == img.shape
        err = np.abs(out.astype(float) - img.astype(float))
        assert err.mean() < 4.0 and err.max() <= tol


def test_jpeg_noise_psnr_floor():
    import numpy as np
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (24, 24, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 30.0


def test_jpeg_decoder_on_handcrafted_stream():
    """Decoder-only vector (independent of our encoder): a hand-built
    8×8 grayscale JPEG whose entropy stream carries DC=0 and ONE AC
    coefficient (scan position 1 → natural (0,1), value 4, quant 16)
    must decode to 128 + IDCT of that lone coefficient, computed here
    from the textbook IDCT formula."""
    import struct

    import numpy as np
    from raydoc.kernels.jpeg import decode_jpeg

    # DHT: DC symbols 0..11 at length 5, AC symbols EOB/ZRL/run-size at
    # length 8 (canonical). Entropy stream, MSB-first:
    #   DC: code(0) = 00000 (symbol 0 → size 0, no extra bits)
    #   AC: symbol 0x12? no — (run=0, size=3): canonical index of
    #       (0<<4)|3 in [0x00, 0xF0, 0x11..0x1A, 0x21..…] ordering used
    #       by the encoder is irrelevant here: WE define the table in
    #       THIS test, ordering symbols 0x00, 0x03, so code(0x00)=0,
    #       code(0x03)=1 at length 2. value 4 → 3 extra bits '100'.
    #   then EOB (code 0, length 2).
    dc_bits = [0] * 16
    dc_bits[4] = 12
    dc_vals = bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[1] = 2                  # two 2-bit codes: 0x00(EOB), 0x03
    ac_vals = bytes([0x00, 0x03])

    qtab = bytes([16] * 64)         # flat quant = 16
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    out += b"\xff\xc0" + struct.pack(">H", 11) \
        + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0]) \
        + b"\x00\x3f\x00"
    # bits: 00000 (DC sym 0) | 01 (AC sym 0x03) | 100 (value 4) |
    #       00 (EOB) | padding 1111 → bytes: 000000 11 0000 0111 →
    bitstr = "00000" + "01" + "100" + "00"
    bitstr += "1" * ((8 - len(bitstr) % 8) % 8)
    out += bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out)).astype(float)[:, :, 0]

    # textbook IDCT of coefficient F(u=0, v=1) = 4*16 = 64
    want = np.empty((8, 8))
    for yy in range(8):
        for xx in range(8):
            want[yy, xx] = 128 + 0.25 * (1 / np.sqrt(2)) * 1.0 * 64 \
                * np.cos((2 * xx + 1) * 1 * np.pi / 16)
    assert np.abs(got - np.clip(np.round(want), 0, 255)).max() <= 1


def test_jpeg_progressive_raises():
    import numpy as np
    import pytest as _pytest
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg

    b = bytearray(encode_jpeg(np.full((8, 8), 90, np.uint8)))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2                 # flip SOF0 → SOF2 (progressive)
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b))


def test_media_meta_and_resize_decode_jpeg(ray_session):
    """The actor-pool stages treat JPEG as a first-class decodable
    payload: dims from the header scan, resize re-emits valid JPEG."""
    import numpy as np
    import ray.data as rd
    from raydoc.functions.multimodal import (MediaResizeActor,
                                             media_pipeline)
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg, jpeg_dims

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 96, 3), np.uint8)
    payload = encode_jpeg(img, quality=85)
    ds = rd.from_items([{"media_id": 1, "payload": payload,
                         "mime": "image/jpeg"}])
    meta = media_pipeline(ds).take_all()[0]
    assert (meta["decoded"], meta["width"], meta["height"]) == (True, 96, 64)

    import pyarrow as pa
    resized = MediaResizeActor(max_side=48)(
        pa.table({"media_id": [1], "payload": [payload]}))
    row = resized.to_pylist()[0]
    assert row["resized"] and row["width"] == 48 and row["height"] == 32
    assert jpeg_dims(row["payload"]) == (48, 32)
    assert decode_jpeg(row["payload"]).shape == (32, 48, 3)


def test_image_corpus_stats_known_answer(ray_session):
    """Deterministic synthesis → exact expected counters: ids cycle
    JPEG / BMP / PNG / junk by doc_id % 4; every decodable image is
    24×16."""
    import pyarrow.parquet as pq
    from raydoc.functions.multimodal import image_corpus_stats

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    want_jpeg = sum(1 for i in ids if i % 4 == 0)
    want_bmp = sum(1 for i in ids if i % 4 == 1)
    want_png = sum(1 for i in ids if i % 4 == 2)
    want_dec = want_jpeg + want_bmp + want_png
    want_junk = len(ids) - want_dec
    r = image_corpus_stats(sf).to_pylist()[0]
    assert r["n_media"] == len(ids)
    assert r["n_jpeg"] == want_jpeg
    assert r["n_png"] == want_png
    assert r["n_decoded"] == want_dec
    assert r["n_malformed"] == want_junk
    assert r["px_area"] == want_dec * 24 * 16


def test_jpeg_truncated_and_corrupt_raise_value_error():
    """Corrupt payloads that START with a valid SOI must still raise
    ValueError (never struct.error / IndexError / KeyError) so the
    actor-pool fail-soft path catches them — ADVICE round-4 finding."""
    import numpy as np
    import pytest as _pytest
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg, jpeg_dims

    good = encode_jpeg(np.full((16, 16), 90, np.uint8), quality=85)
    cases = {
        # truncated mid-SOF header (struct.error class)
        "trunc_header": good[: good.find(b"\xff\xc0") + 4],
        # truncated entropy stream (tolerant zero-pad decode is legal;
        # a struct/Index crash is not)
        "trunc_entropy": good[:-3],
        # DHT segment removed entirely (KeyError class in decode)
        "no_dht": good[: good.find(b"\xff\xc4")]
        + good[good.find(b"\xff\xda"):],
        # SOS names a component id the SOF never declared
        "bad_sos_comp": good.replace(b"\xff\xda", b"\xff\xda", 1),
    }
    i = cases["bad_sos_comp"].find(b"\xff\xda")
    b = bytearray(cases["bad_sos_comp"])
    b[i + 5] = 9                      # scan component id 9 (undeclared)
    cases["bad_sos_comp"] = bytes(b)

    for name, payload in cases.items():
        try:
            decode_jpeg(payload)      # tolerant decode is acceptable …
        except (ValueError, NotImplementedError):
            pass                      # … and so is a catchable reject
        # anything else (struct.error/IndexError/KeyError) propagates
        # and fails the test
    for name in ("trunc_header", "no_dht", "bad_sos_comp"):
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(cases[name])

    with _pytest.raises(ValueError):
        jpeg_dims(good[:5])           # SOI + half a marker


def test_jpeg_fill_bytes_before_markers_accepted():
    """Spec-legal 0xFF fill/padding bytes before a marker must be
    skipped, not parsed as a marker code — real-world JFIFs pad."""
    import numpy as np
    from raydoc.kernels.jpeg import decode_jpeg, encode_jpeg, jpeg_dims

    img = np.full((16, 24), 77, np.uint8)
    good = encode_jpeg(img, quality=85)
    # insert fill bytes before the SOF and the SOS markers
    padded = good.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1)
    padded = padded.replace(b"\xff\xda", b"\xff\xff\xff\xff\xda", 1)
    assert jpeg_dims(padded) == (24, 16)
    out = decode_jpeg(padded)
    assert out.shape == (16, 24, 3)
    assert int(abs(out.astype(int) - 77).max()) == 0


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def test_png_roundtrip_bit_exact():
    """PNG is lossless: decode ∘ encode must be bit-exact for gray,
    RGB, and RGBA."""
    import numpy as np
    from raydoc.kernels.png import decode_png, encode_png, png_dims

    rng = np.random.RandomState(0)
    for shape in [(16, 24), (16, 24, 3), (16, 24, 4)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        b = encode_png(img)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        assert png_dims(b) == (24, 16)
        out = decode_png(b)
        want = np.stack([img] * 3, 2) if img.ndim == 2 else img
        assert (out == want).all()


def test_png_all_five_filters_decode():
    """Decoder-only vectors: the same gradient image filtered with each
    of the five scanline filters (built here from the spec's forward
    definitions) must decode identically."""
    import struct
    import zlib

    import numpy as np

    from raydoc.kernels.png import decode_png

    w = h = 8
    img = (np.arange(h)[:, None] * 7
           + np.arange(w)[None, :] * 3).astype(np.uint8)
    for f in range(5):
        raw = bytearray()
        prev = np.zeros(w, np.int64)
        for y in range(h):
            row = img[y].astype(np.int64)
            filt = row.copy()
            if f == 1:
                filt[1:] = (row[1:] - row[:-1]) & 0xFF
            elif f == 2:
                filt = (row - prev) & 0xFF
            elif f == 3:
                for x in range(w):
                    left = row[x - 1] if x else 0
                    filt[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
            elif f == 4:
                for x in range(w):
                    a = row[x - 1] if x else 0
                    b_ = prev[x]
                    c = prev[x - 1] if x else 0
                    p = a + b_ - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b_), abs(p - c)
                    pred = (a if pa_ <= pb and pa_ <= pc_
                            else b_ if pb <= pc_ else c)
                    filt[x] = (row[x] - pred) & 0xFF
            raw.append(f)
            raw += bytes(filt.astype(np.uint8))
            prev = row
        payload = (b"\x89PNG\r\n\x1a\n"
                   + _png_chunk(b"IHDR", struct.pack(
                       ">IIBBBBB", w, h, 8, 0, 0, 0, 0))
                   + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                   + _png_chunk(b"IEND", b""))
        out = decode_png(payload)
        assert (out[:, :, 0] == img).all(), f"filter {f} mismatch"


def test_png_palette_trns_and_subbyte_depths():
    import struct
    import zlib

    import numpy as np

    from raydoc.kernels.png import decode_png

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   np.uint8)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    raw = b"".join(bytes([0]) + bytes(idx[y]) for y in range(2))
    payload = (b"\x89PNG\r\n\x1a\n"
               + _png_chunk(b"IHDR", struct.pack(
                   ">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
               + _png_chunk(b"PLTE", pal.tobytes())
               + _png_chunk(b"tRNS", bytes([128]))
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
    out = decode_png(payload)
    assert out.shape == (2, 2, 4)
    assert (out[0, 0] == [255, 0, 0, 128]).all()
    assert (out[1, 1] == [9, 9, 9, 255]).all()

    for depth in (1, 2, 4):            # sub-byte grayscale scales to 255
        w = 8
        maxv = (1 << depth) - 1
        vals = (np.arange(w) % (maxv + 1)).astype(np.uint8)
        packed = np.packbits(np.unpackbits(
            vals.reshape(-1, 1), axis=1, count=8)[:, 8 - depth:]
            .reshape(-1))
        raw = bytes([0]) + packed.tobytes()
        payload = (b"\x89PNG\r\n\x1a\n"
                   + _png_chunk(b"IHDR", struct.pack(
                       ">IIBBBBB", w, 1, depth, 0, 0, 0, 0))
                   + _png_chunk(b"IDAT", zlib.compress(raw))
                   + _png_chunk(b"IEND", b""))
        out = decode_png(payload)
        assert (out[0, :, 0]
                == vals.astype(np.int64) * (255 // maxv)).all()


def test_png_corrupt_raises_value_error():
    import pytest as _pytest

    from raydoc.kernels.png import decode_png, png_dims

    sig = b"\x89PNG\r\n\x1a\n"
    for bad in (b"notapng", sig + b"XX",
                sig + _png_chunk(b"IHDR", b"\x00"), sig[:4]):
        with _pytest.raises(ValueError):
            decode_png(bad)
        with _pytest.raises(ValueError):
            png_dims(bad)


def test_png_adam7_interlaced_decodes():
    """Adam7 decoder vector: the seven-pass sub-images built here from
    the spec's pass grid (forward direction) must scatter back to the
    original pixels, including non-multiple-of-8 and degenerate dims."""
    import struct
    import zlib

    import numpy as np

    from raydoc.kernels.png import decode_png

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    rng = np.random.RandomState(5)
    for shape in [(16, 24, 3), (13, 17, 3), (7, 5), (8, 8, 4),
                  (1, 1, 3), (2, 3, 3)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        img3 = img[:, :, None] if img.ndim == 2 else img
        color = {1: 0, 3: 2, 4: 6}[img3.shape[2]]
        h, w = img3.shape[:2]
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            sub = img3[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for y in range(sub.shape[0]):
                raw.append(0)
                raw += sub[y].reshape(-1).tobytes()
        payload = (b"\x89PNG\r\n\x1a\n"
                   + _png_chunk(b"IHDR", struct.pack(
                       ">IIBBBBB", w, h, 8, color, 0, 0, 1))
                   + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                   + _png_chunk(b"IEND", b""))
        out = decode_png(payload)
        want = np.stack([img] * 3, 2) if img.ndim == 2 else img
        assert (out == want).all(), shape


def test_media_meta_and_resize_decode_png(ray_session):
    """The actor-pool stages treat PNG as a first-class decodable
    payload: dims from the IHDR scan, resize re-emits valid PNG —
    and losslessly (exact nearest-neighbor pixels survive)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.multimodal import (MediaResizeActor,
                                             media_pipeline)
    from raydoc.kernels.png import decode_png, encode_png, png_dims

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 96, 3), np.uint8)
    payload = encode_png(img)
    ds = rd.from_items([{"media_id": 1, "payload": payload,
                         "mime": "image/png"}])
    meta = media_pipeline(ds).take_all()[0]
    assert (meta["decoded"], meta["width"], meta["height"]) \
        == (True, 96, 64)

    resized = MediaResizeActor(max_side=48)(
        pa.table({"media_id": [1], "payload": [payload]}))
    row = resized.to_pylist()[0]
    assert row["resized"] and row["width"] == 48 and row["height"] == 32
    assert png_dims(row["payload"]) == (48, 32)
    out = decode_png(row["payload"])
    ys = (np.arange(32) * 2).astype(np.int64)
    xs = (np.arange(48) * 2).astype(np.int64)
    assert (out == img[ys][:, xs]).all()     # lossless resize re-emit


def test_ahash64_decodes_jpeg_and_png():
    """The perceptual hash accepts every real codec; a PNG and BMP of
    the SAME pixels give the SAME hash (lossless paths agree)."""
    import numpy as np

    from raydoc.functions.multimodal import ahash64, make_bmp
    from raydoc.kernels.png import encode_png

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    h_png = ahash64(encode_png(img))
    h_bmp = ahash64(make_bmp(img))       # BGR vs RGB: mean over
    assert h_png == h_bmp                # channels is order-invariant
