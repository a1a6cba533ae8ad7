"""Real multimodal decode: netpbm/BMP images, WAV audio, codec seams.

The Arrow plumbing tests (fake decoder, frame-sample plan) live in
test_trainops.py; this file pins the REAL decode kernels added on top:
container-free formats decode with stdlib+numpy, codec formats raise
the documented seam, and the Spark-side stages (extract_features
fake_decode=False, resize_images) compose them batch-wise.
"""

import struct

import numpy as np
import pytest

from logtrics_spark.operators.multimodal import (
    audio_feature,
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
    extract_features,
    gen_media_real,
    image_feature,
    resize_image,
    resize_images,
)


# ------------------------------------------------------------- image decode
def test_ppm_roundtrip_p6():
    px = ((np.arange(12 * 16 * 3, dtype=np.uint32) * 7) % 256).astype(
        np.uint8
    ).reshape(12, 16, 3)
    assert np.array_equal(decode_image(encode_ppm(px)), px)


def test_pgm_p5_with_header_comment():
    p5 = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    a = decode_image(p5)
    assert a.shape == (2, 4, 1)
    assert a.flatten().tolist() == list(range(8))


def test_ppm_16bit_maxval_rescales():
    raw = np.array([0, 32768, 65535, 0, 65535, 32768], dtype=">u2").tobytes()
    a = decode_image(b"P6\n2 1\n65535\n" + raw)
    assert a.flatten().tolist() == [0, 128, 255, 0, 255, 128]


def _bmp(pixels_rgb, w, h, bpp=24, top_down=False):
    """Minimal BI_RGB BMP writer (test-side, independent of the decoder):
    rows padded to 4 bytes, bottom-up unless top_down."""
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = pixels_rgb if top_down else list(reversed(pixels_rgb))
    raster = b""
    for row in rows:
        r = b"".join(
            bytes([b, g, rr] + ([255] if nb == 4 else []))
            for (rr, g, b) in row
        )
        raster += r + b"\x00" * (stride - len(r))
    off = 54
    hdr = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return hdr + dib + raster


def test_bmp_24bit_bottom_up_padded():
    pix = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    d = decode_image(_bmp(pix, 2, 2))
    assert d.shape == (2, 2, 3)
    assert d[0, 0].tolist() == [255, 0, 0]  # row order restored
    assert d[1, 1].tolist() == [10, 20, 30]


def test_bmp_32bit_top_down():
    pix = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
    d = decode_image(_bmp(pix, 3, 1, bpp=32, top_down=True))
    assert d.shape == (1, 3, 3)
    assert d[0, 2].tolist() == [7, 8, 9]


@pytest.mark.parametrize(
    "magic", [b"\x89PNG\r\n\x1a\nrest", b"\xff\xd8\xff\xe0", b"GIF89a--"]
)
def test_codec_image_formats_raise_seam(magic):
    with pytest.raises(NotImplementedError, match="codec|unrecognized"):
        decode_image(magic + b"\x00" * 32)


def test_unknown_image_bytes_rejected():
    with pytest.raises(NotImplementedError, match="unrecognized"):
        decode_image(bytes(range(64)))


# ------------------------------------------------------------- audio decode
def test_wav_pcm16_roundtrip():
    t = np.arange(8000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    y, rate = decode_audio(encode_wav(x, 8000))
    assert rate == 8000
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization floor


def _wav(fmt_tag, n_ch, rate, bits, data):
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, rate,
        rate * n_ch * bits // 8, n_ch * bits // 8, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_wav_float32_exact():
    x = (np.arange(100) / 50.0 - 1.0).astype(np.float64)
    y, rate = decode_audio(_wav(3, 1, 16000, 32, x.astype("<f4").tobytes()))
    assert rate == 16000
    assert np.abs(y - x).max() < 1e-6


def test_wav_stereo_downmix():
    st = np.zeros(16, "<i2")
    st[0::2], st[1::2] = 1000, 3000
    y, _ = decode_audio(_wav(1, 2, 8000, 16, st.tobytes()))
    assert np.allclose(y, 2000 / 32768.0)


def test_wav_24bit_full_scale():
    vals = [8388607, -8388608, 0]
    data = b"".join((v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    y, _ = decode_audio(_wav(1, 1, 8000, 24, data))
    assert y[0] == pytest.approx(1.0, abs=2e-7)
    assert y[1] == -1.0 and y[2] == 0.0


def test_wav_8bit_unsigned_center():
    y, _ = decode_audio(_wav(1, 1, 8000, 8, bytes([128, 0, 255])))
    assert y[0] == 0.0 and y[1] == -1.0 and y[2] == pytest.approx(127 / 128)


def test_wav_compressed_codec_raises_seam():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_audio(_wav(85, 1, 8000, 0, b"\x00" * 16))  # MP3-in-WAV


def test_non_wav_audio_rejected():
    with pytest.raises(NotImplementedError, match="unrecognized"):
        decode_audio(b"OggS" + b"\x00" * 32)


# ---------------------------------------------------------------- features
def test_audio_feature_closed_form():
    """Pure sine: rms = A/sqrt(2), peak = A, zcr = 2f/rate, centroid =
    f/nyquist — the descriptor is physically meaningful, not a hash."""
    rate, f, amp = 8000, 440.0, 0.5
    t = np.arange(rate) / rate
    feat = audio_feature(amp * np.sin(2 * np.pi * f * t), rate)
    assert feat[0] == 1.0  # duration s
    assert feat[1] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert feat[2] == pytest.approx(amp, rel=1e-3)
    assert feat[3] == pytest.approx(2 * f / rate, rel=1e-2)
    assert feat[4] == pytest.approx(f / (rate / 2), rel=1e-3)


def test_image_feature_shape_fields():
    px = np.full((12, 16, 3), 128, np.uint8)
    feat = image_feature(px, dim=16)
    assert feat[:3].tolist() == [12.0, 16.0, 3.0]
    assert feat[3] == pytest.approx(128 / 255)
    assert feat[4] == 0.0  # constant image
    assert feat[5] == pytest.approx(16 / 12)


def test_resize_identity_and_shape():
    px = ((np.arange(12 * 16 * 3) * 13) % 256).astype(np.uint8).reshape(12, 16, 3)
    assert np.array_equal(resize_image(px, 16, 12), px)
    assert resize_image(px, 8, 6).shape == (6, 8, 3)


# ------------------------------------------------------------- Spark stages
def test_extract_features_real_decode(spark):
    media = gen_media_real(spark, 30)
    img_audio = media.where("modality != 'video'")
    feats = extract_features(img_audio, dim=16, fake_decode=False).toPandas()
    assert len(feats) == 20
    # image descriptor carries the true decoded dimensions (not metadata)
    meta = media.select("media_id", "meta.width", "meta.height").toPandas()
    merged = feats.merge(meta, on="media_id")
    imgs = merged[merged["modality"] == "image"]
    for _, row in imgs.iterrows():
        assert row["feature"][0] == row["height"]
        assert row["feature"][1] == row["width"]
    # audio descriptor: 8k sine tones -> duration matches metadata
    # and rms sits at 0.5/sqrt(2)
    auds = feats[feats["modality"] == "audio"]
    assert all(abs(f[1] - 0.5 / np.sqrt(2)) < 1e-2 for f in auds["feature"])
    # deterministic rerun
    again = extract_features(
        gen_media_real(spark, 30).where("modality != 'video'"),
        dim=16, fake_decode=False,
    ).toPandas()
    a = np.array(feats.sort_values("media_id")["feature"].tolist())
    b = np.array(again.sort_values("media_id")["feature"].tolist())
    assert np.array_equal(a, b)


def test_extract_features_real_video_raises(spark):
    media = gen_media_real(spark, 9)
    with pytest.raises(Exception, match="codec"):
        extract_features(media, fake_decode=False).collect()


def test_extract_features_errors_null_quarantines(spark):
    """Corrupt/codec rows surface as feature=NULL, never dropped."""
    media = gen_media_real(spark, 9)
    feats = extract_features(media, fake_decode=False, errors="null").toPandas()
    assert len(feats) == 9  # no silent drop
    by_mod = feats.set_index("media_id").join(
        media.select("media_id", "modality").toPandas().set_index("media_id"),
        rsuffix="_m",
    )
    assert by_mod[by_mod["modality"] == "video"]["feature"].isna().all()
    assert by_mod[by_mod["modality"] != "video"]["feature"].notna().all()


def test_resize_images_roundtrip(spark):
    media = gen_media_real(spark, 12)
    out = resize_images(media, 8, 6).toPandas()
    n_img = media.where("modality='image'").count()
    assert len(out) == n_img
    for _, row in out.iterrows():
        arr = decode_image(bytes(row["payload"]))
        assert arr.shape == (6, 8, 3)
    # deterministic
    again = resize_images(gen_media_real(spark, 12), 8, 6).toPandas()
    p1 = {r["media_id"]: bytes(r["payload"]) for _, r in out.iterrows()}
    p2 = {r["media_id"]: bytes(r["payload"]) for _, r in again.iterrows()}
    assert p1 == p2
