"""Imagespec output coercions + CropMargin (reference D3 / §2.11 parity).

Re-expresses the reference's decoded-page output contract — the
"imagespec" (`/root/reference/src/chug/wds/decode.py:167-292`): a short
string selecting array backend × element type × channel mode, plus the
channel-coercion table applied after decode:

* ``l``:    3-D input → mean over the first 3 channels (float64 result —
            faithful to the reference, which never casts back).
* ``rgb``:  2-D input → channel repeated 3×; RGBA input → alpha dropped.
* ``rgba``: 2-D input → repeated 4× with alpha=255; RGB input → alpha
            channel of 255 appended.  (The reference's RGB→RGBA append,
            ``decode.py:275-278``, concatenates an ``(h, w)`` array onto
            an ``(h, w, 3)`` one — an ndim mismatch that raises in numpy;
            we implement the evident intent with an ``(h, w, 1)`` plane.)
* element type ``float``: ``float32 / 255`` **before** mode coercion,
  matching the reference's ordering (so rgba's padded alpha is 255, not
  1.0 — a faithful quirk).

Backends: ``numpy`` is native here.  ``torch`` (CHW transpose) and
``pil`` require libraries absent from this environment and raise
``NotImplementedError`` — clearly-marked stubs; the coercion math they
would wrap is the numpy path.

``crop_margin`` is the reference's deterministic CropMargin transform
(`/root/reference/src/chug/image/transforms_torch.py:89-128`): min-max
normalize to 0..255, threshold ``< gray_threshold``, bounding rect of the
dark pixels, crop.
"""

from __future__ import annotations

import numpy as np

# spec name → (backend, element type, channel mode); mirrors the
# webdataset ``imagespecs`` table the reference validates against
# (decode.py:200-201).
IMAGESPECS: dict[str, tuple[str, str | None, str]] = {
    "l8": ("numpy", "uint8", "l"),
    "rgb8": ("numpy", "uint8", "rgb"),
    "rgba8": ("numpy", "uint8", "rgba"),
    "l": ("numpy", "float", "l"),
    "rgb": ("numpy", "float", "rgb"),
    "rgba": ("numpy", "float", "rgba"),
    "torchl8": ("torch", "uint8", "l"),
    "torchrgb8": ("torch", "uint8", "rgb"),
    "torchrgba8": ("torch", "uint8", "rgba"),
    "torchl": ("torch", "float", "l"),
    "torchrgb": ("torch", "float", "rgb"),
    "torch": ("torch", "float", "rgb"),
    "torchrgba": ("torch", "float", "rgba"),
    "pill": ("pil", None, "l"),
    "pil": ("pil", None, "rgb"),
    "pilrgb": ("pil", None, "rgb"),
    "pilrgba": ("pil", None, "rgba"),
}


def parse_imagespec(spec: str) -> tuple[str, str | None, str]:
    """Validate + split an imagespec (plan-time error, like the reference's
    ``ValueError("Unknown imagespec")`` at decode.py:200-201)."""
    key = spec.lower()
    if key not in IMAGESPECS:
        raise ValueError(f"Unknown imagespec: {spec}")
    return IMAGESPECS[key]


def coerce_image(result: np.ndarray, spec: str) -> np.ndarray:
    """Apply the imagespec element-type + channel-mode coercions to a
    decoded page array ((h, w) grayscale or (h, w, c) color)."""
    atype, etype, mode = parse_imagespec(spec)
    if atype == "pil":
        raise NotImplementedError(
            "pil imagespecs require PIL (absent in this environment); "
            "use a numpy spec"
        )

    if result.ndim not in (2, 3):
        raise ValueError(f"expected 2-D or 3-D image, got shape {result.shape}")

    if etype == "float":
        result = result.astype(np.float32) / 255.0

    if mode == "l":
        if result.ndim == 3:
            result = np.mean(result[:, :, :3], axis=2)
    elif mode == "rgb":
        if result.ndim == 2:
            result = np.repeat(result[:, :, np.newaxis], 3, axis=2)
        elif result.shape[2] == 4:
            result = result[:, :, :3]
    elif mode == "rgba":
        if result.ndim == 2:
            result = np.repeat(result[:, :, np.newaxis], 4, axis=2)
            result[:, :, 3] = 255
        elif result.shape[2] == 3:
            alpha = np.full((*result.shape[:2], 1), 255, dtype=result.dtype)
            result = np.concatenate([result, alpha], axis=2)

    if atype == "torch":
        raise NotImplementedError(
            "torch imagespecs require torch (absent in this environment); "
            "the tensor would be the numpy result CHW-transposed"
        )
    return result


def align_long_axis(image: np.ndarray, input_size: tuple[int, int]) -> np.ndarray:
    """Rotate −90° (clockwise, expand) when the image's long axis
    disagrees with the target ``input_size=(h, w)`` — the reference's
    AlignLongAxis (`transforms_torch.py:10-26`). Exact 90° rotation, so
    the interpolation mode is irrelevant."""
    h, w = image.shape[:2]
    th, tw = input_size
    if (th > tw and w > h) or (th < tw and w < h):
        return np.rot90(image, k=-1).copy()
    return image


def bitmap(image: np.ndarray, threshold: int = 200) -> np.ndarray:
    """Point LUT: values below ``threshold`` → 0, others unchanged — the
    reference's Bitmap (`transforms_torch.py:29-38`), identical per
    channel."""
    return np.where(image < threshold, 0, image).astype(image.dtype)


def _pool2d(image: np.ndarray, kernel_size: int, minimum: bool) -> np.ndarray:
    if kernel_size % 2 != 1 or kernel_size < 1:
        raise ValueError(f"kernel_size must be odd and ≥1, got {kernel_size}")
    p = kernel_size // 2
    pad_value = (
        np.iinfo(image.dtype).max
        if minimum
        else np.iinfo(image.dtype).min
    ) if np.issubdtype(image.dtype, np.integer) else (np.inf if minimum else -np.inf)
    pad_width = [(p, p), (p, p)] + [(0, 0)] * (image.ndim - 2)
    padded = np.pad(image, pad_width, constant_values=pad_value)
    win = np.lib.stride_tricks.sliding_window_view(
        padded, (kernel_size, kernel_size), axis=(0, 1)
    )
    out = win.min(axis=(-2, -1)) if minimum else win.max(axis=(-2, -1))
    return out.astype(image.dtype)


def erosion(image: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """Min-pool (stride 1, same size) — the reference's Erosion
    (`transforms_torch.py:41-64`, the min-pool branch). Border windows
    ignore out-of-image pixels, like −maxpool(−x) with padding. The
    reference's random kernel choice over a (lo, hi) pair is
    training-time augmentation; this deterministic port takes the kernel
    explicitly."""
    return _pool2d(image, kernel_size, minimum=True)


def dilation(image: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """Max-pool (stride 1, same size) — the reference's Dilation
    (`transforms_torch.py:67-86`)."""
    return _pool2d(image, kernel_size, minimum=False)


def _bilinear_resize(image: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Bilinear resample with half-pixel centers (the standard
    align_corners=False convention). The reference resizes through
    torchvision bicubic (`build_transforms_doc.py:40-42`); bicubic
    kernels are library-specific, so this from-scratch port uses
    bilinear — deterministic and documented — with the same geometry."""
    h, w = image.shape[:2]
    if (nh, nw) == (h, w):
        return image
    ys = np.clip((np.arange(nh) + 0.5) * h / nh - 0.5, 0, h - 1)
    xs = np.clip((np.arange(nw) + 0.5) * w / nw - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0).reshape(-1, 1)
    fx = (xs - x0).reshape(1, -1)
    if image.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    img = image.astype(np.float64)
    out = (
        img[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + img[np.ix_(y0, x1)] * (1 - fy) * fx
        + img[np.ix_(y1, x0)] * fy * (1 - fx)
        + img[np.ix_(y1, x1)] * fy * fx
    )
    if np.issubdtype(image.dtype, np.integer):
        out = np.floor(out + 0.5)
    return out.astype(image.dtype)


def resize_keep_ratio(
    image: np.ndarray, target: tuple[int, int], longest: float = 1.0
) -> np.ndarray:
    """Scale so the image fits ``target=(h, w)`` by the reference's
    ratio rule (timm ResizeKeepRatio as used at
    `build_transforms_doc.py:40`): ``ratio = max(h/th, w/tw)·longest +
    min(h/th, w/tw)·(1−longest)``; ``longest=1`` (the eval default)
    makes the longest relative side fit exactly."""
    h, w = image.shape[:2]
    th, tw = target
    rel = (h / th, w / tw)
    ratio = max(rel) * longest + min(rel) * (1.0 - longest)
    nh, nw = round(h / ratio), round(w / ratio)
    return _bilinear_resize(image, max(1, nh), max(1, nw))


def center_crop_or_pad(
    image: np.ndarray, target: tuple[int, int], fill: int = 0
) -> np.ndarray:
    """Center-crop each oversized axis and center-pad (``fill``) each
    undersized one to exactly ``target=(h, w)`` — the reference's
    CenterCropOrPad eval stage (`build_transforms_doc.py:41`)."""
    th, tw = target
    h, w = image.shape[:2]
    if h > th:
        top = (h - th) // 2
        image = image[top : top + th]
    if w > tw:
        left = (w - tw) // 2
        image = image[:, left : left + tw]
    h, w = image.shape[:2]
    if h < th or w < tw:
        pt = (th - h) // 2
        pl = (tw - w) // 2
        pad = [(pt, th - h - pt), (pl, tw - w - pl)] + [(0, 0)] * (
            image.ndim - 2
        )
        image = np.pad(image, pad, constant_values=fill)
    return image


def _parse_hw(arg: str | None, default: tuple[int, int]) -> tuple[int, int]:
    if not arg:
        return default
    parts = [int(x) for x in arg.split(",")]
    return (parts[0], parts[1]) if len(parts) >= 2 else (parts[0], parts[0])


# name → deterministic post-decode transform builder; the doc-transform
# subset of the reference's §2.11 stacks that is pure array math (the
# random aug stacks are training-time and stay out of scope).
DOC_TRANSFORMS = {
    "crop_margin": lambda arg=None: (
        lambda img: crop_margin(img, int(arg) if arg else 200)
    ),
    "bitmap": lambda arg=None: (
        lambda img: bitmap(img, int(arg) if arg else 200)
    ),
    "erosion": lambda arg=None: (
        lambda img: erosion(img, int(arg) if arg else 3)
    ),
    "dilation": lambda arg=None: (
        lambda img: dilation(img, int(arg) if arg else 3)
    ),
    "align_long_axis": lambda arg=None: (
        lambda img: align_long_axis(
            img, tuple(int(x) for x in (arg or "1024,768").split(","))
        )
    ),
    "resize_keep_ratio": lambda arg=None: (
        lambda img: resize_keep_ratio(img, _parse_hw(arg, (32, 32)))
    ),
    "center_crop_or_pad": lambda arg=None: (
        lambda img: center_crop_or_pad(img, _parse_hw(arg, (32, 32)))
    ),
}


def build_doc_transform(specs: list[str] | None):
    """Compile ``["bitmap:180", "erosion:3", ...]`` into one callable
    (the factory shape of the reference's transform builders,
    `build_transforms_doc.py`)."""
    if not specs:
        return None
    fns = []
    for spec in specs:
        name, _, arg = spec.partition(":")
        if name not in DOC_TRANSFORMS:
            raise ValueError(
                f"unknown doc transform {name!r}; expected one of "
                f"{sorted(DOC_TRANSFORMS)}"
            )
        fns.append(DOC_TRANSFORMS[name](arg or None))

    def apply(img: np.ndarray) -> np.ndarray:
        for fn in fns:
            img = fn(img)
        return img

    return apply


def find_dark_bounding_rect(
    gray: np.ndarray, threshold: int = 200
) -> tuple[int, int, int, int] | None:
    """(x_min, y_min, width, height) of pixels ``< threshold`` after min-max
    normalization to 0..255; ``None`` when the image is constant (the
    reference returns the input unchanged then)."""
    data = gray.astype(np.float64)
    mx, mn = data.max(), data.min()
    if mx == mn:
        return None
    data = (data - mn) / (mx - mn) * 255
    ys, xs = np.nonzero(data < threshold)
    if len(xs) == 0:
        return None
    x_min, y_min = int(xs.min()), int(ys.min())
    return (x_min, y_min, int(xs.max()) - x_min + 1, int(ys.max()) - y_min + 1)


def crop_margin(image: np.ndarray, gray_threshold: int = 200) -> np.ndarray:
    """Crop an image to the bounding rect of its dark (content) pixels.

    ``image`` is (h, w) grayscale or (h, w, c); the luminance used for the
    rect is the channel mean (the reference converts via PIL ``"L"``)."""
    gray = image if image.ndim == 2 else np.mean(image[:, :, :3], axis=2)
    rect = find_dark_bounding_rect(gray, gray_threshold)
    if rect is None:
        return image
    x_min, y_min, width, height = rect
    return image[y_min : y_min + height, x_min : x_min + width]
