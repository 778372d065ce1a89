"""Numpy ports of the reference's deterministic doc transforms
(AlignLongAxis / Bitmap / Erosion / Dilation,
`/root/reference/src/chug/image/transforms_torch.py:10-86`): golden
checks against hand-computed small arrays."""

from __future__ import annotations

import numpy as np
import pytest

from chug_ray.kernels.imagespec import (
    align_long_axis,
    bitmap,
    build_doc_transform,
    dilation,
    erosion,
)


def test_bitmap_threshold_lut():
    img = np.array([[0, 199, 200], [201, 255, 100]], dtype=np.uint8)
    out = bitmap(img, threshold=200)
    assert out.tolist() == [[0, 0, 200], [201, 255, 0]]
    assert out.dtype == np.uint8
    # per-channel on color images (the reference triples the LUT for RGB)
    rgb = np.stack([img, img, img], axis=2)
    assert bitmap(rgb, 200).tolist() == np.stack([out, out, out], axis=2).tolist()


def test_erosion_min_pool():
    img = np.array(
        [[9, 9, 9, 9], [9, 1, 9, 9], [9, 9, 9, 9], [9, 9, 9, 5]],
        dtype=np.uint8,
    )
    out = erosion(img, 3)
    # the 1 spreads to its 3x3 neighborhood; the corner 5 to its own
    want = [[1, 1, 1, 9], [1, 1, 1, 9], [1, 1, 1, 5], [9, 9, 5, 5]]
    assert out.tolist() == want
    assert out.shape == img.shape and out.dtype == img.dtype


def test_dilation_max_pool():
    img = np.zeros((3, 3), dtype=np.uint8)
    img[1, 1] = 7
    out = dilation(img, 3)
    assert out.tolist() == [[7, 7, 7], [7, 7, 7], [7, 7, 7]]
    # erosion then dilation of a constant image is identity
    const = np.full((4, 4), 3, dtype=np.uint8)
    assert dilation(erosion(const, 3), 3).tolist() == const.tolist()


def test_pool_rejects_even_kernel():
    with pytest.raises(ValueError):
        erosion(np.zeros((3, 3), dtype=np.uint8), 2)


def test_align_long_axis():
    landscape = np.arange(12, dtype=np.uint8).reshape(3, 4)
    # portrait target (h > w): landscape input rotates -90 (clockwise)
    out = align_long_axis(landscape, (4, 3))
    assert out.shape == (4, 3)
    assert out.tolist() == np.rot90(landscape, k=-1).tolist()
    # matching orientation: unchanged
    assert align_long_axis(landscape, (3, 4)).tolist() == landscape.tolist()
    # color arrays rotate in the spatial plane only
    color = np.zeros((2, 5, 3), dtype=np.uint8)
    assert align_long_axis(color, (5, 2)).shape == (5, 2, 3)


def test_build_doc_transform_stack():
    stack = build_doc_transform(["bitmap:200", "dilation:3"])
    img = np.array([[100, 255], [255, 255]], dtype=np.uint8)
    # bitmap zeroes the 100, dilation spreads the 255s back over it
    assert stack(img).tolist() == [[255, 255], [255, 255]]
    assert build_doc_transform(None) is None
    with pytest.raises(ValueError):
        build_doc_transform(["nope"])


def test_imagespec_decoder_accepts_transforms(ray_session, t1_corpus):
    from chug_ray.ops.media import imagespec_decode

    _, _, media_path = t1_corpus
    base = imagespec_decode(media_path, "l8").take_all()
    transformed = imagespec_decode(
        media_path, "l8", transforms=["bitmap:200"]
    ).take_all()
    assert len(base) == len(transformed)
    # bitmap only darkens pixels, so the mean can never increase
    bm = {r["media_ref"]: r["mean_e4"] for r in base}
    for r in transformed:
        assert r["mean_e4"] <= bm[r["media_ref"]]
