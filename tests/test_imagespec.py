"""Imagespec coercion table + CropMargin (reference D3 / §2.11 parity).

Golden values follow the reference's numpy branch
(`/root/reference/src/chug/wds/decode.py:252-292`) including its quirks:
float conversion happens *before* mode coercion (so padded alpha is 255
even in float mode) and the ``l``-mode channel mean is float64.
"""

from __future__ import annotations

import numpy as np
import pytest

from chug_ray.kernels.imagespec import (
    coerce_image,
    crop_margin,
    find_dark_bounding_rect,
    parse_imagespec,
)


GRAY = np.arange(12, dtype=np.uint8).reshape(3, 4)
RGB = np.stack([GRAY, GRAY + 100, GRAY + 200], axis=2).astype(np.uint8)
RGBA = np.concatenate(
    [RGB, np.full((3, 4, 1), 7, dtype=np.uint8)], axis=2
)


def test_parse_validates():
    assert parse_imagespec("RGB8") == ("numpy", "uint8", "rgb")
    with pytest.raises(ValueError, match="Unknown imagespec"):
        parse_imagespec("bgr8")


def test_l8_from_gray_is_identity():
    out = coerce_image(GRAY, "l8")
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, GRAY)


def test_l8_from_rgb_means_first3_float64():
    out = coerce_image(RGBA, "l8")
    # faithful reference quirk: np.mean leaves float64, never cast back
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, RGB.astype(np.float64).mean(axis=2))


def test_rgb8_from_gray_repeats():
    out = coerce_image(GRAY, "rgb8")
    assert out.shape == (3, 4, 3) and out.dtype == np.uint8
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], GRAY)


def test_rgb8_from_rgba_drops_alpha():
    out = coerce_image(RGBA, "rgb8")
    np.testing.assert_array_equal(out, RGB)


def test_rgba8_from_gray_pads_255():
    out = coerce_image(GRAY, "rgba8")
    assert out.shape == (3, 4, 4)
    np.testing.assert_array_equal(out[:, :, 3], np.full((3, 4), 255))


def test_rgba8_from_rgb_appends_alpha_255():
    out = coerce_image(RGB, "rgba8")
    assert out.shape == (3, 4, 4) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[:, :, :3], RGB)
    np.testing.assert_array_equal(out[:, :, 3], np.full((3, 4), 255))


def test_float_spec_divides_before_mode_coercion():
    out = coerce_image(GRAY, "rgba")
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[:, :, 0], GRAY / 255.0, rtol=1e-6)
    # alpha padded AFTER /255 → stays 255.0 (reference ordering)
    np.testing.assert_array_equal(out[:, :, 3], np.full((3, 4), 255.0))


def test_torch_and_pil_are_marked_stubs():
    with pytest.raises(NotImplementedError):
        coerce_image(GRAY, "torchrgb")
    with pytest.raises(NotImplementedError):
        coerce_image(GRAY, "pill")


# ---------------------------------------------------------------------------
# CropMargin
# ---------------------------------------------------------------------------


def test_crop_margin_finds_dark_rect():
    img = np.full((10, 12), 255, dtype=np.uint8)
    img[2:5, 3:8] = 10  # dark content block
    rect = find_dark_bounding_rect(img)
    assert rect == (3, 2, 5, 3)  # (x_min, y_min, width, height)
    out = crop_margin(img)
    assert out.shape == (3, 5)
    assert (out == 10).all()


def test_crop_margin_constant_image_unchanged():
    img = np.full((4, 4), 128, dtype=np.uint8)
    out = crop_margin(img)
    np.testing.assert_array_equal(out, img)


def test_crop_margin_normalizes_before_threshold():
    # values 100 vs 120: raw-thresholding at 200 would call everything
    # dark; min-max normalization maps 100→0, 120→255 so only the 100s
    # are below the threshold (reference transforms_torch.py:119-124).
    img = np.full((6, 6), 120, dtype=np.uint8)
    img[1:3, 1:4] = 100
    rect = find_dark_bounding_rect(img)
    assert rect == (1, 1, 3, 2)


def test_crop_margin_color_uses_channel_mean():
    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    img[3:6, 2:7, :] = 0
    out = crop_margin(img)
    assert out.shape == (3, 5, 3)


# ---------------------------------------------------------------------------
# actor-pool stage over a media table (Ray plumbing)
# ---------------------------------------------------------------------------


def test_imagespec_decode_stage(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.kernels import simg
    from chug_ray.ops.media import imagespec_decode

    payload = simg.encode(
        [simg.Frame(width=6, height=4, pix_seed=11, lines=("a",))]
    )
    table = pa.table(
        {
            "media_ref": ["m0", "m1"],
            "kind": ["image", "pdf"],
            "payload": pa.array([payload, b"not-an-image"], pa.binary()),
        }
    )
    path = str(tmp_path / "media.parquet")
    pq.write_table(table, path)

    rows = imagespec_decode(path, "rgba8").take_all()
    assert len(rows) == 1  # pdf kind skipped
    r = rows[0]
    assert (r["out_h"], r["out_w"], r["out_c"]) == (4, 6, 4)
    assert r["out_dtype"] == "uint8"
    # deterministic raster → deterministic mean
    raster = simg.render_frame(simg.Frame(6, 4, 11, ("a",)))
    expect = np.concatenate(
        [np.repeat(raster[:, :, None], 3, axis=2),
         np.full((4, 6, 1), 255, np.uint8)], axis=2
    )
    assert r["mean_e4"] == int(np.floor(expect.mean() * 1e4 + 0.5))
