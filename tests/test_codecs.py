"""Real media decode (VERDICT r1 next#4): the dependency-free
PNG/BMP/PPM/WAV codecs on REAL bytes — roundtrips, hand-filtered PNG
scanlines, and the Spark end-to-end path (files on disk ->
``read_media_dir`` -> ``extract_features(fake_decode=False)``)."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
    _paeth,
    _png_chunk,
    _PNG_SIG,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    sniff_decode_audio,
    sniff_decode_image,
)

RNG = np.random.default_rng(42)


def _rand_img(h, w, c):
    return RNG.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _rand_img(13, 7, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()


def test_ppm_header_comments_and_pgm():
    img = _rand_img(2, 3, 3)
    payload = encode_ppm(img)
    # inject a comment line into the header, as the spec allows
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert (decode_ppm(commented) == img).all()
    gray = _rand_img(4, 5, 1)
    pgm = b"P5\n5 4\n255\n" + gray.tobytes()
    assert (decode_ppm(pgm) == gray).all()


def test_bmp_roundtrip_with_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    img = _rand_img(5, 3, 3)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    img2 = _rand_img(4, 4, 3)  # no padding case
    assert (decode_bmp(encode_bmp(img2)) == img2).all()


def test_bmp_32bpp_and_topdown():
    """Hand-built 32-bpp top-down BMP (negative height): BGRA order,
    no row padding."""
    img = _rand_img(3, 2, 3)
    bgra = np.concatenate([img[:, :, ::-1], np.full((3, 2, 1), 255, np.uint8)], axis=2)
    body = bgra.tobytes()  # top-down: rows in natural order
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40) + struct.pack(
        "<IiiHHIIiiII", 40, 2, -3, 1, 32, 0, len(body), 2835, 2835, 0, 0
    )
    assert (decode_bmp(hdr + body) == img).all()


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    img = _rand_img(11, 6, channels)
    out = decode_png(encode_png(img))
    assert out.shape == (11, 6, channels)
    assert (out == img).all()


def _filter_forward(ftype, row, prev, nch):
    """Apply a PNG filter the ENCODER's way, so decode must invert it."""
    out = bytearray()
    for i, x in enumerate(row):
        a = row[i - nch] if i >= nch else 0
        b = prev[i]
        c = prev[i - nch] if i >= nch else 0
        if ftype == 0:
            f = x
        elif ftype == 1:
            f = (x - a) & 0xFF
        elif ftype == 2:
            f = (x - b) & 0xFF
        elif ftype == 3:
            f = (x - ((a + b) >> 1)) & 0xFF
        else:
            f = (x - _paeth(a, b, c)) & 0xFF
        out.append(f)
    return bytes(out)


def test_png_all_filter_types_decode():
    """One scanline per filter type 0..4 — a PNG our own encoder never
    produces, decoded back to the exact source pixels."""
    img = _rand_img(5, 4, 3)
    stride = 4 * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(5):
        row = img[y].tobytes()
        raw += bytes([y]) + _filter_forward(y, row, prev, 3)
        prev = row
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == img).all()


def test_png_rejects_unsupported():
    img = _rand_img(2, 2, 3)
    payload = bytearray(encode_png(img))
    payload[24] = 16  # bit depth byte inside IHDR
    # CRC is wrong now but we parse before verifying — depth check fires
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bytes(payload))


def test_wav_roundtrip_and_stereo_downmix():
    mono = (RNG.random(480).astype(np.float32) - 0.5) * 1.8
    got = decode_wav(encode_wav(mono, sample_rate=8000))
    assert got.shape == (480,)
    assert np.abs(got - np.clip(mono, -1, 1)).max() < 1e-3  # 16-bit quantization

    # hand-build a stereo WAV: L = s, R = -s -> downmix ~ 0
    import io
    import wave

    pcm = np.stack([mono, -mono], axis=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())
    mixed = decode_wav(buf.getvalue())
    assert np.abs(mixed).max() < 1e-3


def test_sniff_dispatch():
    img = _rand_img(3, 3, 3)
    for payload in (encode_png(img), encode_bmp(img), encode_ppm(img)):
        assert (sniff_decode_image(payload) == img).all()
    with pytest.raises(ValueError):
        sniff_decode_image(b"\xff\xd8\xff\xe0JFIF")  # JPEG: honest refusal
    assert sniff_decode_audio(encode_wav(np.zeros(16, np.float32))).shape == (16,)


def test_extract_features_real_decode_e2e(spark, tmp_path):
    """Files on disk -> binaryFile source -> REAL decode in the
    mapInPandas featurizer: features equal the first 16 pixel bytes of
    the original image regardless of container."""
    from dpe_energy_performance_analysis_etl_spark.multimodal import (
        extract_features,
        read_media_dir,
    )

    img = _rand_img(8, 8, 3)
    (tmp_path / "a.png").write_bytes(encode_png(img))
    (tmp_path / "b.bmp").write_bytes(encode_bmp(img))
    (tmp_path / "c.ppm").write_bytes(encode_ppm(img))

    media = read_media_dir(spark, str(tmp_path)).withColumn(
        "media_id", F.xxhash64("path")
    )
    feats = extract_features(media, fake_decode=False).collect()
    want = img.ravel()[:16].astype(float).tolist()
    assert len(feats) == 3
    for r in feats:
        assert r.feature == want  # identical pixels -> identical features


def test_audio_features_real_decode_e2e(spark, tmp_path):
    """Real WAV bytes through the framed-RMS featurizer: a constant
    0.5 signal has RMS 0.5 in every frame."""
    import pandas as pd

    from dpe_energy_performance_analysis_etl_spark.multimodal import audio_features

    wav = encode_wav(np.full(64, 0.5, dtype=np.float32))
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "content": [wav]})
    )
    out = audio_features(df, frame_size=16, fake_decode=False).collect()
    assert len(out) == 4
    assert all(abs(r.rms_energy - 0.5) < 1e-3 for r in out)
