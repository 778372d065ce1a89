"""Keyed-RNG random document-augmentation stack (SURVEY §2.11, the
training-time half).

Pure-numpy re-expression of the reference's train transform pipeline
(`/root/reference/src/chug/image/build_transforms_doc.py:52-174`,
``build_transforms_doc_better``): same stage order, same application
probabilities, same parameter distributions (the ``defaults`` dict at
lines 72-94, including the ``degrees=ratio_range`` quirk at line 130).
The reference draws from process-global torch RNG state — fine inside
one DataLoader worker, irreproducible in a distributed engine where
batch boundaries and shard order change between runs. Here every draw
comes from a Philox generator keyed by ``(seed, sample key)``
(``stable_hash64``, the same T3 keyed-RNG rule the extraction kernels
use), so a given sample receives the identical augmentation on any
worker, at any batch size, in any shard order — and a different seed
gives a fresh independent stack.

Geometric warps (shear / shift-rotate / elastic) are inverse-mapped
bilinear samples; blur and the elastic displacement field use exact
separable gaussian convolution. All stages preserve the input dtype
(uint8 in the media pipeline).
"""

from __future__ import annotations

import math

import numpy as np

from chug_ray.util import stable_hash64

from .imagespec import (
    bitmap,
    center_crop_or_pad,
    dilation,
    erosion,
    resize_keep_ratio,
)

# the reference's `defaults` dict, build_transforms_doc.py:72-94
AUG_DEFAULTS = dict(
    scale_prob=0.05,
    scale_range=(0.85, 1.04),
    ratio_prob=0.05,
    ratio_range=(0.9, 1.11),
    bitmap_prob=0.55,
    erosion_dilation_prob=0.02,
    shear_prob=0.05,
    shear_range_x=(0.0, 3.0),
    shear_range_y=(-3.0, 0.0),
    shift_scale_rotate_prob=0.03,
    shift_range_x=0.04,
    shift_range_y=0.03,
    elastic_prob=0.04,
    elastic_alpha=50.0,
    elastic_sigma=12.0,
    brightness_contrast_prob=0.04,
    brightness_range=0.1,
    contrast_range=0.1,
    gaussian_blur_prob=0.03,
    gaussian_blur_kernel=3,
    gaussian_blur_sigma=(0.1, 0.8),
)

# stage-name → bit, so callers can record WHICH augs fired per sample
STAGE_BITS = {
    "scale": 1,
    "aspect": 2,
    "bitmap": 4,
    "erosion": 8,
    "dilation": 16,
    "shear": 32,
    "shift_rotate": 64,
    "elastic": 128,
    "brightness_contrast": 256,
    "gaussian_blur": 512,
}


def aug_rng(seed: int | str, *key: object) -> np.random.Generator:
    """Philox generator deterministically keyed by (seed, *key)."""
    return np.random.Generator(np.random.Philox(key=stable_hash64(seed, *key)))


def _as_float(image: np.ndarray) -> tuple[np.ndarray, np.dtype]:
    return image.astype(np.float64), image.dtype


def _restore(image: np.ndarray, dtype: np.dtype) -> np.ndarray:
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return np.clip(np.rint(image), info.min, info.max).astype(dtype)
    return image.astype(dtype)


def affine_warp(
    image: np.ndarray, inv: np.ndarray, fill: float = 255.0
) -> np.ndarray:
    """Warp by the INVERSE affine map ``inv`` (2×3, output→input pixel
    coords about the image center), sampling bilinearly; out-of-image
    samples read ``fill`` — torchvision RandomAffine's fill semantics."""
    img, dtype = _as_float(image)
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float64) - cy,
        np.arange(w, dtype=np.float64) - cx,
        indexing="ij",
    )
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2] + cx
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2] + cy
    return _sample_bilinear(img, sy, sx, fill, dtype)


def _sample_bilinear(
    img: np.ndarray,
    sy: np.ndarray,
    sx: np.ndarray,
    fill: float,
    dtype: np.dtype,
) -> np.ndarray:
    h, w = img.shape[:2]
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    fy, fx = sy - y0, sx - x0
    chans = () if img.ndim == 2 else (img.shape[2],)
    out = np.zeros(sy.shape + chans, dtype=np.float64)
    wsum = np.zeros(sy.shape, dtype=np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            wgt = (fy if dy else 1 - fy) * (fx if dx else 1 - fx)
            ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            vals = img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
            wok = wgt * ok
            out += vals * (wok[..., None] if chans else wok)
            wsum += wok
    # corners whose support is partly outside blend toward fill
    miss = 1.0 - wsum
    out += fill * (miss[..., None] if chans else miss)
    return _restore(out, dtype)


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _conv1d_reflect(img: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    r = (len(k) - 1) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    padded = np.pad(img, pad, mode="reflect")
    win = np.lib.stride_tricks.sliding_window_view(padded, len(k), axis=axis)
    return np.tensordot(win, k, axes=([-1], [0]))


def gaussian_blur(
    image: np.ndarray, sigma: float, radius: int | None = None
) -> np.ndarray:
    """Separable gaussian blur with reflect padding — torchvision
    GaussianBlur (`build_transforms_doc.py:153-158`; kernel 3 ⇒
    radius 1)."""
    img, dtype = _as_float(image)
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    img = _conv1d_reflect(img, k, axis=0)
    img = _conv1d_reflect(img, k, axis=1)
    return _restore(img, dtype)


def random_shear(
    image: np.ndarray,
    rng: np.random.Generator,
    range_x: tuple[float, float],
    range_y: tuple[float, float],
    fill: float = 255.0,
) -> np.ndarray:
    """RandomAffine(degrees=0, shear=x+y ranges) —
    `build_transforms_doc.py:119-127`. Forward map is
    ``[[1, tan(ax)], [tan(ay), 1]]``; we warp by its inverse."""
    ax = math.radians(rng.uniform(*range_x))
    ay = math.radians(rng.uniform(*range_y))
    fwd = np.array([[1.0, math.tan(ax)], [math.tan(ay), 1.0]])
    inv2 = np.linalg.inv(fwd)
    inv = np.concatenate([inv2, np.zeros((2, 1))], axis=1)
    return affine_warp(image, inv, fill)


def random_shift_rotate(
    image: np.ndarray,
    rng: np.random.Generator,
    degrees_range: tuple[float, float],
    shift_x: float,
    shift_y: float,
    fill: float = 255.0,
) -> np.ndarray:
    """RandomAffine(degrees=ratio_range, translate=(x, y)) —
    `build_transforms_doc.py:128-136` INCLUDING the reference quirk that
    the rotation range is the aspect-``ratio_range`` tuple (0.9–1.11
    DEGREES), not ``rotate_range``. Translate follows torchvision:
    dx ~ U(−x·w, x·w), dy ~ U(−y·h, y·h)."""
    h, w = image.shape[:2]
    angle = math.radians(rng.uniform(*degrees_range))
    dx = rng.uniform(-shift_x, shift_x) * w
    dy = rng.uniform(-shift_y, shift_y) * h
    c, s = math.cos(angle), math.sin(angle)
    fwd = np.array([[c, -s], [s, c]])
    inv2 = np.linalg.inv(fwd)
    t = -inv2 @ np.array([dx, dy])
    inv = np.concatenate([inv2, t[:, None]], axis=1)
    return affine_warp(image, inv, fill)


def elastic_transform(
    image: np.ndarray,
    rng: np.random.Generator,
    alpha: float = 50.0,
    sigma: float = 12.0,
    fill: float = 255.0,
) -> np.ndarray:
    """ElasticTransform(alpha, sigma) — `build_transforms_doc.py:137-144`:
    displacement = gaussian_smooth(U(−1, 1) field) · alpha, sampled
    bilinearly. ``alpha=0`` is the identity."""
    img, dtype = _as_float(image)
    h, w = img.shape[:2]
    radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    disp = rng.uniform(-1.0, 1.0, size=(2, h, w))
    for axis in (0, 1):
        disp = np.stack(
            [
                _conv1d_reflect(disp[0], k, axis=axis),
                _conv1d_reflect(disp[1], k, axis=axis),
            ]
        )
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float64),
        np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    return _sample_bilinear(
        img, ys + disp[0] * alpha, xs + disp[1] * alpha, fill, dtype
    )


def brightness_contrast(
    image: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.1,
    contrast: float = 0.1,
) -> np.ndarray:
    """ColorJitter(brightness, contrast) —
    `build_transforms_doc.py:145-152`, torch semantics: factor ~
    U(max(0, 1−r), 1+r); brightness scales pixels, contrast blends with
    the mean gray level."""
    img, dtype = _as_float(image)
    bf = rng.uniform(max(0.0, 1.0 - brightness), 1.0 + brightness)
    cf = rng.uniform(max(0.0, 1.0 - contrast), 1.0 + contrast)
    img = img * bf
    gray = img.mean(axis=2).mean() if img.ndim == 3 else img.mean()
    img = img * cf + gray * (1.0 - cf)
    return _restore(img, dtype)


def random_crop_or_pad(
    image: np.ndarray,
    target: tuple[int, int],
    rng: np.random.Generator,
    fill: int = 255,
) -> np.ndarray:
    """timm RandomCropOrPad (`build_transforms_doc.py:160`): per axis, an
    oversized image is cropped at a uniform offset, an undersized one is
    padded with a uniform left/top split of the slack."""
    th, tw = target
    img = image
    h, w = img.shape[:2]
    if h > th:
        top = int(rng.integers(0, h - th + 1))
        img = img[top : top + th]
    if w > tw:
        left = int(rng.integers(0, w - tw + 1))
        img = img[:, left : left + tw]
    h, w = img.shape[:2]
    if h < th or w < tw:
        pt = int(rng.integers(0, th - h + 1)) if h < th else 0
        pl = int(rng.integers(0, tw - w + 1)) if w < tw else 0
        pad = [(pt, th - h - pt), (pl, tw - w - pl)] + [(0, 0)] * (
            img.ndim - 2
        )
        img = np.pad(img, pad, constant_values=fill)
    return img


class DocAugment:
    """The composed train stack (`build_transforms_doc_better`,
    `build_transforms_doc.py:52-174`): resize-keep-ratio with random
    scale/aspect, then RandomApply(bitmap) → RandomApply(erosion |
    dilation) → RandomApply(shear) → RandomApply(shift-rotate) →
    RandomApply(elastic) → RandomApply(brightness/contrast) →
    RandomApply(blur) → RandomCropOrPad + CenterCrop.

    ``__call__(image, key)`` draws every decision from
    ``aug_rng(seed, key)`` — one independent stream per sample — and
    returns ``(augmented, applied_mask)`` with a STAGE_BITS bitmask of
    the stages that fired, so downstream tables can audit the draw."""

    def __init__(
        self,
        size: tuple[int, int],
        seed: int | str = 0,
        fill: int = 255,
        params: dict | None = None,
    ):
        self.size = tuple(size)
        self.seed = seed
        self.fill = fill
        self.params = dict(AUG_DEFAULTS, **(params or {}))

    def __call__(
        self, image: np.ndarray, key: object
    ) -> tuple[np.ndarray, int]:
        p = self.params
        rng = aug_rng(self.seed, key, "aug")
        applied = 0

        # ResizeKeepRatio with random scale / aspect (timm train mode,
        # build_transforms_doc.py:96-104): jitter the fit ratio, then
        # split an aspect factor across the two axes.
        ratio_jit, aspect_jit = 1.0, 1.0
        if rng.uniform() < p["scale_prob"]:
            ratio_jit = rng.uniform(*p["scale_range"])
            applied |= STAGE_BITS["scale"]
        if rng.uniform() < p["ratio_prob"]:
            lo, hi = p["ratio_range"]
            aspect_jit = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            applied |= STAGE_BITS["aspect"]
        th, tw = self.size
        eff_h = max(1, round(th * ratio_jit / math.sqrt(aspect_jit)))
        eff_w = max(1, round(tw * ratio_jit * math.sqrt(aspect_jit)))
        img = resize_keep_ratio(image, (eff_h, eff_w), longest=1.0)

        if rng.uniform() < p["bitmap_prob"]:
            img = bitmap(img)
            applied |= STAGE_BITS["bitmap"]
        if rng.uniform() < p["erosion_dilation_prob"]:
            if rng.uniform() < 0.5:
                img = erosion(img, 3)
                applied |= STAGE_BITS["erosion"]
            else:
                img = dilation(img, 3)
                applied |= STAGE_BITS["dilation"]
        if rng.uniform() < p["shear_prob"]:
            img = random_shear(
                img, rng, p["shear_range_x"], p["shear_range_y"], self.fill
            )
            applied |= STAGE_BITS["shear"]
        if rng.uniform() < p["shift_scale_rotate_prob"]:
            img = random_shift_rotate(
                img,
                rng,
                p["ratio_range"],  # the reference quirk: degrees=ratio_range
                p["shift_range_x"],
                p["shift_range_y"],
                self.fill,
            )
            applied |= STAGE_BITS["shift_rotate"]
        if rng.uniform() < p["elastic_prob"]:
            img = elastic_transform(
                img, rng, p["elastic_alpha"], p["elastic_sigma"], self.fill
            )
            applied |= STAGE_BITS["elastic"]
        if rng.uniform() < p["brightness_contrast_prob"]:
            img = brightness_contrast(
                img, rng, p["brightness_range"], p["contrast_range"]
            )
            applied |= STAGE_BITS["brightness_contrast"]
        if rng.uniform() < p["gaussian_blur_prob"]:
            sigma = rng.uniform(*p["gaussian_blur_sigma"])
            img = gaussian_blur(img, sigma, p["gaussian_blur_kernel"] // 2)
            applied |= STAGE_BITS["gaussian_blur"]

        img = random_crop_or_pad(img, self.size, rng, self.fill)
        img = center_crop_or_pad(img, self.size, self.fill)
        return img, applied
