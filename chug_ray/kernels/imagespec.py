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
