"""Keyed-RNG random augmentation stack (chug_ray/kernels/augment.py +
chug_ray/ops/media.py:augment_frames) — SURVEY §2.11's training-time
half, the numpy port of the reference's build_transforms_doc_better
(`/root/reference/src/chug/image/build_transforms_doc.py:52-174`).

The contract under test: (1) each geometric/photometric kernel is
exact on hand-computable cases; (2) the composed stack is a pure
function of (seed, sample key) — identical on any worker at any batch
size; (3) forcing probabilities to 0/1 drives the applied-stage
bitmask and output deterministically."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from chug_ray.kernels import simg
from chug_ray.kernels.augment import (
    AUG_DEFAULTS,
    STAGE_BITS,
    DocAugment,
    affine_warp,
    aug_rng,
    brightness_contrast,
    elastic_transform,
    gaussian_blur,
    random_crop_or_pad,
    random_shift_rotate,
)

IDENT = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


def _spike(h=9, w=9, y=2, x=3, val=200):
    img = np.zeros((h, w), dtype=np.uint8)
    img[y, x] = val
    return img


def test_affine_identity_roundtrips():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(affine_warp(img, IDENT, fill=0), img)


def test_affine_integer_translation_moves_spike():
    img = _spike()
    # inverse map shifts sample coords by (-2, +1): output(y, x) reads
    # input(y + 1, x - 2) → the spike moves right 2, up 1
    inv = np.array([[1.0, 0.0, -2.0], [0.0, 1.0, 1.0]])
    out = affine_warp(img, inv, fill=0)
    expect = np.zeros_like(img)
    expect[1, 5] = 200
    assert np.array_equal(out, expect)


def test_affine_fill_outside():
    img = np.full((6, 6), 10, dtype=np.uint8)
    inv = np.array([[1.0, 0.0, 100.0], [0.0, 1.0, 0.0]])  # far off-image
    out = affine_warp(img, inv, fill=255.0)
    assert np.array_equal(out, np.full((6, 6), 255, dtype=np.uint8))


def test_elastic_alpha_zero_is_identity():
    rng = aug_rng(7, "k")
    img = np.arange(144, dtype=np.uint8).reshape(12, 12)
    assert np.array_equal(elastic_transform(img, rng, alpha=0.0), img)


def test_elastic_is_keyed_deterministic():
    img = np.arange(400, dtype=np.uint8).reshape(20, 20)
    a = elastic_transform(img, aug_rng(1, "x"), alpha=30.0, sigma=4.0)
    b = elastic_transform(img, aug_rng(1, "x"), alpha=30.0, sigma=4.0)
    c = elastic_transform(img, aug_rng(1, "y"), alpha=30.0, sigma=4.0)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gaussian_blur_preserves_constant_and_mass():
    img = np.full((10, 10), 77, dtype=np.uint8)
    assert np.array_equal(gaussian_blur(img, sigma=0.5), img)
    # blur spreads a spike but reflect-padding preserves total mass
    spike = _spike(11, 11, 5, 5, 200).astype(np.float64)
    out = gaussian_blur(spike, sigma=0.8)
    assert abs(out.sum() - 200.0) < 1e-6
    assert out[5, 5] < 200.0


class _ScriptedRng:
    """Stands in for a Generator: returns scripted uniform() values."""

    def __init__(self, vals):
        self.vals = list(vals)

    def uniform(self, lo=0.0, hi=1.0):
        v = self.vals.pop(0)
        return lo + (hi - lo) * v

    def integers(self, lo, hi):
        return lo


def test_brightness_contrast_scripted_factors():
    img = np.full((4, 4), 100, dtype=np.uint8)
    # brightness factor at the top of its range (1.1), contrast at 1.0
    out = brightness_contrast(
        img, _ScriptedRng([1.0, 0.5]), brightness=0.1, contrast=0.0
    )
    assert np.array_equal(out, np.full((4, 4), 110, dtype=np.uint8))
    # pure contrast around the mean leaves a constant image unchanged
    out2 = brightness_contrast(
        img, _ScriptedRng([0.5, 1.0]), brightness=0.0, contrast=0.3
    )
    assert np.array_equal(out2, img)


def test_random_crop_or_pad_shapes_and_content():
    rng = aug_rng(3, "crop")
    big = np.arange(20 * 30, dtype=np.uint8).reshape(20, 30)
    out = random_crop_or_pad(big, (8, 8), rng)
    assert out.shape == (8, 8)
    # a crop of a row-major ramp keeps consecutive in-row deltas of 1
    assert np.all(np.diff(out.astype(int), axis=1) == 1)
    small = np.zeros((4, 4), dtype=np.uint8)
    out2 = random_crop_or_pad(small, (9, 9), rng, fill=255)
    assert out2.shape == (9, 9)
    assert (out2 == 255).sum() == 9 * 9 - 16 and (out2 == 0).sum() == 16


def test_shift_rotate_zero_ranges_identity():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    out = random_shift_rotate(
        img, aug_rng(0, "z"), (0.0, 0.0), 0.0, 0.0, fill=0
    )
    assert np.array_equal(out, img)


# --- composed stack ---

_ALL_ON = dict(
    AUG_DEFAULTS,
    scale_prob=1.0,
    ratio_prob=1.0,
    bitmap_prob=1.0,
    erosion_dilation_prob=1.0,
    shear_prob=1.0,
    shift_scale_rotate_prob=1.0,
    elastic_prob=1.0,
    brightness_contrast_prob=1.0,
    gaussian_blur_prob=1.0,
)
_ALL_OFF = {k: 0.0 for k in _ALL_ON if k.endswith("_prob")}


def test_doc_augment_keyed_determinism():
    img = simg.render_frame(simg.Frame(40, 32, pix_seed=5, lines=("a",)))
    aug = DocAugment((24, 24), seed=11, params=_ALL_ON)
    out1, m1 = aug(img, "docA")
    out2, m2 = aug(img, "docA")
    assert np.array_equal(out1, out2) and m1 == m2
    out3, m3 = aug(img, "docB")
    assert not np.array_equal(out1, out3)
    # a different seed is a fresh independent stack
    out4, _ = DocAugment((24, 24), seed=12, params=_ALL_ON)(img, "docA")
    assert not np.array_equal(out1, out4)


def test_doc_augment_all_on_mask_and_shape():
    img = simg.render_frame(simg.Frame(50, 40, pix_seed=9, lines=("a",)))
    out, mask = DocAugment((32, 32), seed=0, params=_ALL_ON)(img, "k")
    assert out.shape == (32, 32) and out.dtype == np.uint8
    ero_dil = STAGE_BITS["erosion"] | STAGE_BITS["dilation"]
    assert mask & ero_dil and (mask & ero_dil) != ero_dil  # exactly one
    for name, bit in STAGE_BITS.items():
        if name in ("erosion", "dilation"):
            continue
        assert mask & bit, f"stage {name} should have fired"


def test_doc_augment_all_off_is_deterministic_resize_crop():
    # a target-sized input with every prob at 0 passes through untouched
    img = simg.render_frame(simg.Frame(24, 24, pix_seed=2, lines=("a",)))
    out, mask = DocAugment((24, 24), seed=0, params=_ALL_OFF)(img, "k")
    assert mask == 0
    assert np.array_equal(out, img)


def test_doc_augment_batch_split_invariance():
    """Chunking the sample stream any way yields identical per-key
    results — the distributed-reproducibility contract."""
    imgs = {
        f"m{i}": simg.render_frame(
            simg.Frame(30 + i, 26, pix_seed=i, lines=("a",))
        )
        for i in range(8)
    }
    aug = DocAugment((20, 20), seed=4, params=_ALL_ON)
    whole = {k: aug(v, k) for k, v in imgs.items()}
    aug2 = DocAugment((20, 20), seed=4, params=_ALL_ON)
    keys = list(imgs)
    for chunk in (keys[:3], keys[3:5], keys[5:]):
        for k in chunk:
            out, mask = aug2(imgs[k], k)
            assert np.array_equal(out, whole[k][0]) and mask == whole[k][1]


# --- Ray stage ---


def _write_media(tmp_path, n=12) -> str:
    rows = []
    for i in range(n):
        f = simg.Frame(width=36, height=28 + i, pix_seed=100 + i, lines=("x",))
        rows.append(
            {
                "media_ref": f"img{i:03d}",
                "payload": simg.encode([f]),
                "kind": "image",
            }
        )
    # one non-image row must be skipped, not crash
    rows.append({"media_ref": "aud000", "payload": b"\x00", "kind": "audio"})
    p = str(tmp_path / "media.parquet")
    pq.write_table(pa.Table.from_pylist(rows), p)
    return p


def test_augment_frames_e2e(ray_session, tmp_path):
    from chug_ray.ops.media import augment_frames

    path = _write_media(tmp_path)
    out = (
        augment_frames(path, size=(16, 16), seed=3)
        .to_pandas()
        .sort_values("media_ref", ignore_index=True)
    )
    assert len(out) == 12  # the audio row is skipped
    assert (out["out_h"] == 16).all() and (out["out_w"] == 16).all()
    # re-running the stage reproduces every row bit-for-bit
    again = (
        augment_frames(path, size=(16, 16), seed=3)
        .to_pandas()
        .sort_values("media_ref", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, again)
    # a different seed changes at least the pixel means
    other = (
        augment_frames(path, size=(16, 16), seed=4)
        .to_pandas()
        .sort_values("media_ref", ignore_index=True)
    )
    assert not out["mean_e4"].equals(other["mean_e4"])
