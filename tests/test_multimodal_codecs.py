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
