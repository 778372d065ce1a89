"""SIMG — deterministic synthetic multi-frame image container.

Stands in for multi-page TIFF payloads (the reference decodes those with
``PIL.Image.seek(i)`` / ``n_frames``, ``/root/reference/src/chug/wds/
decode.py:125-164``; PIL is unavailable here — FIXTURES.md F2). Frames
carry a width/height, a pixel seed (from which a deterministic uint8
raster can be expanded), and optional OCR-like text lines so image docs
exercise the same span-text path as PDFs.

Layout (little-endian):

    magic b"SIMG" | version u8 (=1) | n_frames u16
    per frame: w u16 | h u16 | pix_seed u32 | n_lines u16
               | n_lines × (len u16, utf8 bytes)
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"SIMG"
VERSION = 1

_HDR = struct.Struct("<4sBH")
_FRM = struct.Struct("<HHIH")
_LEN = struct.Struct("<H")


class SimgError(ValueError):
    """Malformed SIMG payload."""


@dataclass(frozen=True)
class Frame:
    width: int
    height: int
    pix_seed: int
    lines: tuple[str, ...]


def encode(frames: list[Frame]) -> bytes:
    out = bytearray(_HDR.pack(MAGIC, VERSION, len(frames)))
    for f in frames:
        out += _FRM.pack(f.width, f.height, f.pix_seed, len(f.lines))
        for line in f.lines:
            raw = line.encode("utf-8")
            out += _LEN.pack(len(raw)) + raw
    return bytes(out)


def decode(data: bytes) -> list[Frame]:
    if len(data) < _HDR.size:
        raise SimgError("SIMG: truncated header")
    magic, version, n_frames = _HDR.unpack_from(data, 0)
    if magic != MAGIC:
        raise SimgError(f"SIMG: bad magic {magic!r}")
    if version != VERSION:
        raise SimgError(f"SIMG: unsupported version {version}")
    pos = _HDR.size
    frames = []
    for _ in range(n_frames):
        if pos + _FRM.size > len(data):
            raise SimgError("SIMG: truncated frame header")
        w, h, pix_seed, n_lines = _FRM.unpack_from(data, pos)
        if w <= 0 or h <= 0:
            # decode-time validation: a zero-area frame renders an
            # empty raster whose np.mean is NaN, crashing every media
            # stage OUTSIDE their SimgError corrupt-payload handling —
            # reject it here so all stages inherit the err channel
            raise SimgError(f"SIMG: non-positive frame dims {w}x{h}")
        pos += _FRM.size
        lines = []
        for _ in range(n_lines):
            if pos + _LEN.size > len(data):
                raise SimgError("SIMG: truncated line header")
            (ln,) = _LEN.unpack_from(data, pos)
            pos += _LEN.size
            if pos + ln > len(data):
                raise SimgError("SIMG: truncated line")
            lines.append(data[pos : pos + ln].decode("utf-8", errors="strict"))
            pos += ln
        frames.append(Frame(w, h, pix_seed, tuple(lines)))
    return frames


# watermark line convention: a line of EXACTLY this form stamps pixels.
# Natural OCR-like lines are space-joined vocab words and can never
# match, so every pre-existing corpus renders bit-identically.
_WM_RE = re.compile(r"^wm@(\d+),(\d+)$")
_WM_BLOCK = 4  # px; small enough that pHash distance stays ≤ ~6


def render_frame(frame: Frame) -> np.ndarray:
    """Deterministically expand a frame to an (h, w) uint8 grayscale raster.

    Stand-in for the rasterize step (reference renders via
    pypdfium2/PIL); deterministic so tests can golden-pin pixels.

    Ordinary text lines do not affect pixels. The one exception is the
    watermark convention ``wm@x,y`` — such a line inverts a 4×4 block at
    (x, y), the re-encode/overlay analog that gives planted NEAR-duplicate
    frames genuinely different rasters (small, localized pHash change).
    """
    rng = np.random.default_rng(frame.pix_seed)
    img = rng.integers(0, 256, size=(frame.height, frame.width), dtype=np.uint8)
    for line in frame.lines:
        m = _WM_RE.match(line)
        if m:
            x, y = int(m.group(1)), int(m.group(2))
            img[y : y + _WM_BLOCK, x : x + _WM_BLOCK] ^= 0xFF
    return img
