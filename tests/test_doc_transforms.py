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


def test_bilinear_downscale_is_block_average():
    from chug_ray.kernels.imagespec import _bilinear_resize

    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = _bilinear_resize(img, 2, 2)
    # half-pixel centers make exact 2x downscale a 2x2 block average
    want = [
        [img[0:2, 0:2].mean(), img[0:2, 2:4].mean()],
        [img[2:4, 0:2].mean(), img[2:4, 2:4].mean()],
    ]
    assert out.tolist() == want
    # constant images stay exactly constant at any size
    const = np.full((3, 5), 7, dtype=np.uint8)
    assert np.unique(_bilinear_resize(const, 8, 2)).tolist() == [7]


def test_resize_keep_ratio_longest():
    from chug_ray.kernels.imagespec import resize_keep_ratio

    img = np.zeros((6, 4), dtype=np.uint8)
    # rel = (2, 4/3); longest=1 -> ratio 2 -> (3, 2)
    assert resize_keep_ratio(img, (3, 3)).shape == (3, 2)
    color = np.zeros((4, 8, 3), dtype=np.uint8)
    assert resize_keep_ratio(color, (4, 4)).shape == (2, 4, 3)


def test_center_crop_or_pad():
    from chug_ray.kernels.imagespec import center_crop_or_pad

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    # crop: center 2x2
    assert center_crop_or_pad(img, (2, 2)).tolist() == [[5, 6], [9, 10]]
    # pad: (3,2) -> (3,3), fill column on the right (left = (3-2)//2 = 0)
    small = np.ones((3, 2), dtype=np.uint8)
    out = center_crop_or_pad(small, (3, 3), fill=9)
    assert out.shape == (3, 3)
    assert out[:, 2].tolist() == [9, 9, 9]
    assert out[:, :2].tolist() == small.tolist()
    # mixed: crop rows, pad cols
    tall = np.ones((5, 2), dtype=np.uint8)
    assert center_crop_or_pad(tall, (3, 4)).shape == (3, 4)


def test_eval_stack_composition():
    """The reference's eval path (ResizeKeepRatio(longest=1) ->
    CenterCropOrPad) as a compiled transform stack."""
    from chug_ray.kernels.imagespec import build_doc_transform

    stack = build_doc_transform(
        ["resize_keep_ratio:8,8", "center_crop_or_pad:8,8"]
    )
    out = stack(np.full((20, 10), 5, dtype=np.uint8))
    assert out.shape == (8, 8)
    # longest side fit 20->8 => width 4, padded to 8 centered with zeros
    assert out[:, 2:6].tolist() == np.full((8, 4), 5, np.uint8).tolist()
    assert out[:, :2].sum() == 0 and out[:, 6:].sum() == 0
