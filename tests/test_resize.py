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


def _grad_img(np, w=32, h=24, bump=None):
    """Smooth horizontal gradient image; optional small local bump."""
    x = np.tile(np.arange(w, dtype=np.uint8) * 8, (h, 1))
    img = np.stack([x, x // 2, x // 3], axis=2).astype(np.uint8)
    if bump:
        r, c = bump
        img[r : r + 2, c : c + 2, :] = 255
    return img


def test_dhash_stable_and_locality(spark):
    """dHash: identical images hash identically; a 2x2-pixel bump
    moves few bits; an inverted gradient is far away."""
    import numpy as np
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import image_dhash

    a = encode_ppm(_grad_img(np))
    a2 = encode_ppm(_grad_img(np))
    near = encode_ppm(_grad_img(np, bump=(10, 10)))
    far = encode_ppm(_grad_img(np)[:, ::-1].copy())
    df = spark.createDataFrame(
        [("a", a), ("a2", a2), ("near", near), ("far", far)],
        "path string, content binary",
    )
    got = {r.path: r.dhash for r in image_dhash(df).collect()}
    assert got["a"] == got["a2"]

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(got["a"], got["near"]) <= 6
    assert ham(got["a"], got["far"]) > 16


def test_dhash_near_dup_groups_banded(spark):
    """Banded candidate generation finds every pair within the radius
    (pigeonhole) and the exact popcount verify drops the rest."""
    import numpy as np
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        dhash_near_dup_groups,
        image_dhash,
    )

    imgs = {
        "x1": encode_ppm(_grad_img(np)),
        "x2": encode_ppm(_grad_img(np)),          # exact dup: hamming 0
        "y": encode_ppm(_grad_img(np)[:, ::-1].copy()),
        "z": encode_ppm(_grad_img(np).T.copy() if False else _grad_img(np, bump=(0, 0))),
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in imgs.items()], "path string, content binary"
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in dhash_near_dup_groups(df, max_hamming=2).collect()}
    assert pairs.get(("x1", "x2")) == 0
    # verify against ground truth: every <=2 pair appears, none above
    hs = {r.path: r.dhash for r in image_dhash(df).collect()}
    import itertools

    for a, b in itertools.combinations(sorted(hs), 2):
        d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        if d <= 2:
            assert (a, b) in pairs and pairs[(a, b)] == d
        else:
            assert (a, b) not in pairs


def test_dhash_dup_summary_expands_to_pair_op(spark):
    """The cluster-weighted summary stands for exactly the raw pairs:
    sum(pair_count) over hamming-0 rows + exact-group internal pairs
    == the pair operator's output count."""
    import numpy as np
    from dpe_energy_performance_analysis_etl_spark.multimodal.codecs import encode_ppm
    from dpe_energy_performance_analysis_etl_spark.multimodal.media import (
        dhash_dup_summary,
        dhash_near_dup_groups,
        image_dhash,
    )

    base = _grad_img(np)
    imgs = [
        ("a1", encode_ppm(base)), ("a2", encode_ppm(base)), ("a3", encode_ppm(base)),
        ("b1", encode_ppm(_grad_img(np, bump=(5, 5)))),
        ("c1", encode_ppm(base[:, ::-1].copy())),
    ]
    df = spark.createDataFrame(imgs, "path string, content binary")
    raw_pairs = dhash_near_dup_groups(df, max_hamming=8).count()
    summary = dhash_dup_summary(df, max_hamming=8).collect()
    hs = {r.path: r.dhash for r in image_dhash(df).collect()}
    from collections import Counter

    sizes = Counter(hs.values())
    within = sum(n * (n - 1) // 2 for n in sizes.values())
    across = sum(r.pair_count for r in summary)
    assert within + across == raw_pairs
    # identical images collapsed into one hash group (the 2x2 bump at
    # (5,5) is invisible to the 9x8 nearest-neighbor reduce, so b1
    # joins the a* cluster: 4 members)
    assert max(sizes.values()) >= 3
