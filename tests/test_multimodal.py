"""Multimodal plumbing: binary schema, Arrow mapInPandas decode,
deterministic fake decoder, resize metadata, stubbed real decoder."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_image,
    resize_meta,
    sample_frames,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return attach_payload(docs).cache()


def test_payload_schema_is_binary(media):
    field = dict(zip(media.schema.names, media.schema.fields))["payload"]
    assert field.dataType.simpleString() == "binary"
    meta = dict(zip(media.schema.names, media.schema.fields))["media_meta"]
    assert meta.dataType.simpleString() == "struct<n_bytes:bigint,format:string>"


def test_decode_image_shape_and_determinism(media):
    d1 = decode_image(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    d2 = decode_image(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert d1.equals(d2)  # deterministic
    assert len(d1) == media.count()
    assert all(len(f) == FEATURE_DIM for f in d1["features"])
    assert ((d1["width"] >= 32) & (d1["width"] < 256)).all()
    assert ((d1["height"] >= 32) & (d1["height"] < 256)).all()


def _bmp_bytes(px, top_down: bool = False) -> bytes:
    """Craft an uncompressed 24-bit BMP from an (H, W, 3) uint8 RGB
    array — BITMAPINFOHEADER, BGR pixel order, 4-byte row padding,
    bottom-up rows unless top_down."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = px[:, :, ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        r.tobytes() + b"\x00" * (stride - w * 3) for r in rows
    )
    hdr = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
    )
    bih = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + bih + body


def _ppm_bytes(px, comment: bool = False) -> bytes:
    h, w = px.shape[:2]
    head = b"P6\n"
    if comment:
        head += b"# crafted fixture\n"
    head += f"{w} {h}\n255\n".encode()
    return head + px.tobytes()


def _rand_px(h, w, seed=7):
    import numpy as np

    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_bmp_decode_roundtrip_with_padding():
    """w=5 forces a 1-byte row pad; bottom-up and top-down orders both
    recover the exact pixel array."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import _decode_bmp

    px = _rand_px(3, 5)
    assert np.array_equal(_decode_bmp(_bmp_bytes(px)), px)
    assert np.array_equal(_decode_bmp(_bmp_bytes(px, top_down=True)), px)


def test_ppm_decode_roundtrip_with_comment():
    import numpy as np

    from flechasdb_spark.operators.multimodal import _decode_ppm

    px = _rand_px(4, 7, seed=11)
    assert np.array_equal(_decode_ppm(_ppm_bytes(px)), px)
    assert np.array_equal(_decode_ppm(_ppm_bytes(px, comment=True)), px)


def test_real_decode_known_pixel_stats():
    """A uniform-color image decodes to exact per-channel means, zero
    stds, and the documented luma stats."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import _real_decode

    px = np.zeros((6, 4, 3), dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 51, 102, 204  # /255: .2 .4 .8
    for payload in (_bmp_bytes(px), _ppm_bytes(px)):
        w, h, feats = _real_decode(payload)
        assert (w, h) == (4, 6)
        assert feats[:3] == [0.2, 0.4, 0.8]
        assert feats[3:6] == [0.0, 0.0, 0.0]
        luma = round(0.299 * 0.2 + 0.587 * 0.4 + 0.114 * 0.8, 4)
        assert feats[6] == luma
        # uniform image: the brighter-than-mean fraction is 0 or 1
        # depending on which side FP summation rounds the mean
        assert feats[7] in (0.0, 1.0)


def test_real_decode_spark_end_to_end(spark):
    """fake=False through the full mapInPandas path: mixed BMP + PPM
    payloads in one binary column decode to per-image dims and stats
    matching NumPy."""
    import numpy as np

    a, b = _rand_px(3, 5, seed=1), _rand_px(8, 2, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(_bmp_bytes(a))), (2, bytearray(_ppm_bytes(b)))],
        "doc_id long, payload binary",
    )
    got = {
        r.doc_id: r
        for r in decode_image(df, fake=False).collect()
    }
    assert (got[1].width, got[1].height) == (5, 3)
    assert (got[2].width, got[2].height) == (2, 8)
    for did, px in ((1, a), (2, b)):
        x = px.reshape(-1, 3).astype(np.float64) / 255.0
        exp = [round(float(v), 4) for v in x.mean(axis=0)]
        assert [round(float(v), 4) for v in got[did].features[:3]] == exp


def test_real_decode_compressed_formats_still_raise():
    """PNG magic and 16-bit PPM hit the codec integration point."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import (
        _decode_ppm,
        _real_decode,
    )

    with pytest.raises(NotImplementedError, match="magic"):
        _real_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    px = _rand_px(2, 2)
    deep = b"P6\n2 2\n65535\n" + px.tobytes() * 2
    with pytest.raises(NotImplementedError, match="16-bit"):
        _decode_ppm(deep)
    with pytest.raises(ValueError, match="truncated"):
        _real_decode(_bmp_bytes(px)[:-4])


def test_resize_meta(media):
    decoded = decode_image(media)
    out = resize_meta(decoded, 224, 224).toPandas()
    assert (out["out_width"] == 224).all()
    assert (out["scale_x"] > 0).all()


def test_sample_frames_stride(media):
    out = sample_frames(media, every_k=8).toPandas()
    # every sampled index is a multiple of the stride and < n_frames
    assert (out["frame_idx"] % 8 == 0).all()
    assert (out["frame_idx"] < out["n_frames"]).all()
    assert (out["frame_pos"] == out["frame_idx"] // 8).all()


def _wav_bytes(
    samples, rate=16000, n_ch=1, bits=16, extra_chunk=False, tag=1
) -> bytes:
    """Craft a RIFF/WAVE PCM payload from float samples in [-1, 1]
    (interleaved if n_ch > 1). extra_chunk inserts an unknown LIST
    chunk before fmt to exercise the chunk walker."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    block = n_ch * bits // 8
    fmt = (
        tag.to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b""
    if extra_chunk:
        chunks += b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    chunks += b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_decode_known_signal_stats():
    """A +/-0.5 square wave: rms = peak = mean|x| = 0.5, dc = 0, every
    adjacent pair flips sign (zcr ~ 1)."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import _real_audio_decode

    n = 2000
    sq = 0.5 * np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    rate, n_ch, m, feats = _real_audio_decode(_wav_bytes(sq, rate=1000))
    assert (rate, n_ch, m) == (1000, 1, n)
    rms, peak, mean_abs, dc, zcr = feats[:5]
    q = round(0.5 * 32767 / 32768.0, 4)  # int16 quantization of 0.5
    assert rms == q and peak == q and mean_abs == q
    assert dc == 0.0
    assert zcr == round((n - 1) / (n - 1), 4) or zcr == 1.0
    assert feats[6] == round(n / 1000, 4)  # duration
    assert feats[7] == round(1 / 10.0, 4)  # crest factor / 10


def test_wav_decode_stereo_downmix_and_chunk_walk():
    """Stereo L=+a / R=-a downmixes to silence; an unknown chunk before
    fmt is skipped; 8-bit PCM decodes."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import _real_audio_decode

    inter = np.empty(400)
    inter[0::2], inter[1::2] = 0.25, -0.25
    rate, n_ch, m, feats = _real_audio_decode(
        _wav_bytes(inter, rate=8000, n_ch=2, extra_chunk=True)
    )
    assert (rate, n_ch, m) == (8000, 2, 200)
    assert feats[0] <= 0.0001  # rms of the downmix ~ 0 (int16 rounding)
    r8, _, m8, f8 = _real_audio_decode(
        _wav_bytes(np.zeros(100) + 0.5, rate=4000, bits=8)
    )
    assert (r8, m8) == (4000, 100)
    assert abs(f8[1] - 0.496) < 0.01  # 8-bit quantized 0.5 peak


def test_wav_decode_compressed_raises():
    import numpy as np
    import pytest

    from flechasdb_spark.operators.multimodal import _decode_wav

    with pytest.raises(NotImplementedError, match="PCM"):
        _decode_wav(_wav_bytes(np.zeros(10), tag=3))  # IEEE float
    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"OggS" + b"\x00" * 64)


def test_wav_truncated_data_chunk_raises():
    """A declared chunk size overrunning the payload must raise, not
    silently compute features from partial audio (r5 ADVICE — the BMP/
    PPM decoders already failed loudly on truncation)."""
    import numpy as np
    import pytest

    from flechasdb_spark.operators.multimodal import _decode_wav

    whole = _wav_bytes(np.linspace(-0.5, 0.5, 64))
    with pytest.raises(ValueError, match="truncated"):
        _decode_wav(whole[:-10])  # data chunk body cut short


def test_decode_audio_spark_end_to_end(spark):
    """fake=False through mapInPandas: WAV payloads decode to per-row
    sample metadata matching the crafted fixtures."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import decode_audio

    a = _wav_bytes(0.5 * np.ones(300), rate=16000)
    b = _wav_bytes(np.zeros(123), rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b))], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in decode_audio(df, fake=False).collect()}
    assert (got[1].sample_rate, got[1].n_samples) == (16000, 300)
    assert (got[2].sample_rate, got[2].n_samples) == (8000, 123)
    assert got[2].features[0] == 0.0  # silence rms
    assert len(got[1].features) == 8


def test_decode_audio_fake_deterministic(media):
    from flechasdb_spark.operators.multimodal import decode_audio

    d1 = decode_audio(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    d2 = decode_audio(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert d1.equals(d2)
    assert ((d1["sample_rate"] >= 8000) & (d1["sample_rate"] <= 40000)).all()
    assert d1["n_channels"].isin([1, 2]).all()


def test_real_dhash_perceptual_properties():
    """dHash over decoded pixels: identical images hash identically,
    a mild brightness shift moves few bits (gradient structure is
    preserved), and inverting the gradient flips most bits."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import (
        _decode_bmp,
        _dhash_from_pixels,
    )

    # horizontal gradient image: every right neighbor is brighter
    w, h = 32, 16
    ramp = np.tile(
        np.linspace(0, 255, w).astype(np.uint8), (h, 1)
    )
    px = np.stack([ramp] * 3, axis=2)
    hash_a = _dhash_from_pixels(px)
    assert hash_a == _dhash_from_pixels(px.copy())
    assert 0 <= hash_a < (1 << 63)
    # full-brightness ramp: all 64 comparisons are "brighter" -> the
    # masked 63 low bits are all ones
    assert hash_a == (1 << 63) - 1
    # +20 brightness (clipped): structure intact -> tiny hamming
    brighter = np.clip(px.astype(int) + 20, 0, 255).astype(np.uint8)
    hb = _dhash_from_pixels(brighter)
    assert bin(hash_a ^ hb).count("1") <= 8
    # inverted gradient: every comparison flips
    hc = _dhash_from_pixels(px[:, ::-1])
    assert bin(hash_a ^ hc).count("1") >= 55
    # and the BMP encode/decode roundtrip feeds the same hash
    assert _dhash_from_pixels(_decode_bmp(_bmp_bytes(px))) == hash_a


def test_image_neardup_pairs_banding_matches_quadratic(spark):
    """fake-mode banded join must equal the quadratic Hamming filter
    on the same md5-prefix hashes (pigeonhole exactness), and a
    byte-identical payload copy must appear at hamming 0."""
    from flechasdb_spark.operators.multimodal import (
        attach_payload,
        image_dhash,
        image_neardup_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(
        80
    ).select("doc_id", "text")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    pay = attach_payload(docs.unionByName(copies))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in image_neardup_pairs(pay, max_hamming=12).collect()
    }
    hashes = {
        r.doc_id: r.dhash for r in image_dhash(pay).collect()
    }
    want = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hd = bin(hashes[a] ^ hashes[b]).count("1")
            if hd <= 12:
                want.add((a, b, hd))
    assert got == want
    assert all(
        (d, d + 5000, 0) in got
        for d in hashes
        if d % 10 == 0 and d < 5000
    )


def test_real_dhash_spark_end_to_end(spark):
    """mapInPandas real path over BMP payloads: map-only plan, exact
    duplicate images pair at hamming 0."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import image_neardup_pairs

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, size=(12, 12, 3)).astype(np.uint8)
    other = rng.randint(0, 256, size=(12, 12, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(_bmp_bytes(base))),
        (2, bytearray(_bmp_bytes(base))),   # identical image
        (3, bytearray(_bmp_bytes(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(
            df, max_hamming=10, fake=False
        ).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_spectrogram_sine_peak_band():
    """A pure sine's energy must land in the frequency band containing
    its tone; silence gives all-zero bands (REAL DSP, np.fft)."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import (
        SPECTROGRAM_BANDS,
        _spectrogram_bands,
    )

    rate, n_fft = 16000, 256
    t = np.arange(4096) / rate
    # 6 kHz tone -> rfft bin 6000/(16000/256) = 96; band edges are
    # linspace(0, 129, 9).astype(int) = [0,16,32,48,64,80,96,112,129],
    # so bin 96 lands in band 6
    x = 0.8 * np.sin(2 * np.pi * 6000 * t)
    bands = _spectrogram_bands(x, rate, n_fft=n_fft)
    assert len(bands) == SPECTROGRAM_BANDS
    assert bands.index(max(bands)) == 6
    assert _spectrogram_bands(np.zeros(1000), rate) == [0.0] * 8
    # shorter than one frame: zero-pads, no crash
    assert len(_spectrogram_bands(x[:50], rate, n_fft=n_fft)) == 8


def test_audio_spectrogram_real_wav_end_to_end(spark):
    """fake=False over crafted WAV payloads: the mined peak band
    tracks each file's tone frequency through decode + FFT."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import audio_spectrogram

    rate = 16000
    t = np.arange(8192) / rate
    rows = []
    want_peak = {}
    edges = np.linspace(0, 256 // 2 + 1, 9).astype(int)
    for did, freq in ((1, 1000), (2, 7000)):
        x = 0.8 * np.sin(2 * np.pi * freq * t)
        rows.append((did, bytearray(_wav_bytes(x, rate=rate))))
        tone_bin = int(round(freq / (rate / 256)))
        want_peak[did] = int(np.searchsorted(edges, tone_bin, "right") - 1)
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r
        for r in audio_spectrogram(df, fake=False).collect()
    }
    for did in (1, 2):
        assert got[did].sample_rate == rate
        assert got[did].n_samples == 8192
        bands = list(got[did].bands)
        assert bands.index(max(bands)) == want_peak[did]


def test_audio_spectrogram_fake_deterministic(spark, media):
    """fake path: deterministic across runs, full schema, and the FFT
    actually runs (some band is non-zero for every doc)."""
    from flechasdb_spark.operators.multimodal import audio_spectrogram

    a = audio_spectrogram(media).orderBy("doc_id").collect()
    b = audio_spectrogram(media).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(max(r.bands) > 0 for r in a)


def _avi_bytes(frames, usec=33333, compressed=False) -> bytes:
    """Craft an uncompressed AVI (RIFF 'AVI ' + hdrl/avih + movi with
    raw bottom-up BGR '00db' frames, 4-byte row padding)."""
    import numpy as np

    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) // 4 * 4

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(four, body):
        return chunk(b"LIST", four + body)

    avih = (
        usec.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 3
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 3
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    movi = b""
    cid = b"00dc" if compressed else b"00db"
    for px in frames:
        rows = px[:, :, ::-1][::-1]  # RGB -> BGR, bottom-up
        body = b"".join(
            r.tobytes() + b"\x00" * (stride - w * 3) for r in rows
        )
        movi += chunk(cid, body)
    payload = lst(b"hdrl", chunk(b"avih", avih)) + lst(b"movi", movi)
    return b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"AVI " + payload


def test_avi_decode_roundtrip_and_errors():
    import numpy as np
    import pytest

    from flechasdb_spark.operators.multimodal import _decode_avi

    f0 = _rand_px(5, 7, seed=21)
    f1 = _rand_px(5, 7, seed=22)
    w, h, usec, frames = _decode_avi(_avi_bytes([f0, f1], usec=40000))
    assert (w, h, usec) == (7, 5, 40000)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)
    with pytest.raises(NotImplementedError, match="codec"):
        _decode_avi(_avi_bytes([f0], compressed=True))
    with pytest.raises(ValueError, match="truncated"):
        _decode_avi(_avi_bytes([f0, f1])[:-10])
    with pytest.raises(ValueError, match="RIFF/AVI"):
        _decode_avi(b"RIFF" + b"\x00" * 20)


def test_video_frame_features_real_end_to_end(spark):
    """fake=False over a crafted AVI: one row per sampled frame with
    pixel stats matching NumPy; every_k strides the frame index."""
    import numpy as np

    from flechasdb_spark.operators.multimodal import (
        _frame_stats,
        video_frame_features,
    )

    frames = [_rand_px(6, 4, seed=30 + i) for i in range(5)]
    df = spark.createDataFrame(
        [(1, bytearray(_avi_bytes(frames)))], "doc_id long, payload binary"
    )
    got = {
        r.frame_idx: r
        for r in video_frame_features(df, every_k=2, fake=False).collect()
    }
    assert sorted(got) == [0, 2, 4]
    for fi in (0, 2, 4):
        assert (got[fi].width, got[fi].height) == (4, 6)
        want = _frame_stats(frames[fi])
        assert [round(float(x), 4) for x in got[fi].features] == want
