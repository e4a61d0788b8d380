"""Image resize kernels + the Spark resize_images operator."""

from __future__ import annotations

import numpy as np
import pytest

from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import (
    decode_png,
    encode_png,
    resize_bilinear,
    resize_nearest,
)
from dpe_energy_performance_analysis_etl_spark.multimodal.media import resize_images


def _gradient(h, w):
    y = np.arange(h, dtype=np.uint8)[:, None]
    x = np.arange(w, dtype=np.uint8)[None, :]
    return np.stack([y + 0 * x, 0 * y + x, (y + x) % 256], axis=-1).astype(np.uint8)


def test_nearest_identity_and_downscale():
    img = _gradient(8, 8)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    half = resize_nearest(img, 4, 4)
    # pixel centers (i+0.5)*2 -> rows 1,3,5,7
    assert np.array_equal(half[:, :, 0], img[[1, 3, 5, 7]][:, [1, 3, 5, 7], 0])


def test_bilinear_identity_and_constant():
    img = _gradient(6, 6)
    assert np.array_equal(resize_bilinear(img, 6, 6), img)
    flat = np.full((5, 7, 3), 77, dtype=np.uint8)
    assert np.array_equal(resize_bilinear(flat, 9, 3), np.full((9, 3, 3), 77))


def test_bilinear_2x_upscale_midpoints():
    """1-D ramp doubled: interior samples land mid-pixel → averages."""
    img = np.array([[0, 100]], dtype=np.uint8)  # (1, 2)
    out = resize_bilinear(img, 1, 4)
    # coords: (i+.5)*0.5-0.5 = -0.25, 0.25, 0.75, 1.25 → clamp edges
    assert out.tolist() == [[0, 25, 75, 100]]


def test_grayscale_shape_preserved():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert resize_nearest(img, 4, 4).shape == (4, 4)
    assert resize_bilinear(img, 4, 4).shape == (4, 4)


def test_resize_images_operator_roundtrip(spark):
    rows = [(i, encode_png(_gradient(8 + i, 8))) for i in range(3)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r["media_id"]: r
        for r in resize_images(df, 4, 4, method="nearest").collect()
    }
    assert set(out) == {0, 1, 2}
    for i, png in rows:
        want = resize_nearest(decode_png(png), 4, 4)
        got = decode_png(bytes(out[i]["content"]))
        assert np.array_equal(got, want)
        assert (out[i]["height"], out[i]["width"]) == (4, 4)


def test_resize_images_drops_null_and_undecodable(spark):
    rows = [
        (0, encode_png(_gradient(8, 8))),
        (1, None),
        (2, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = resize_images(df, 2, 2).collect()
    assert [r["media_id"] for r in out] == [0]


def test_unknown_method_rejected(spark):
    df = spark.createDataFrame([(0, b"")], "media_id long, content binary")
    with pytest.raises(ValueError, match="method"):
        resize_images(df, 2, 2, method="lanczos")
