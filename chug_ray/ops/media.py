"""Multimodal column operators (image/audio/video-shaped plumbing).

Media payloads are opaque binary columns with typed metadata; the
decode / feature-extract / resize / frame-sample stages run as
actor-pool ``map_batches`` over the media table. Real image/audio
codecs are not installed in this container (PIL etc.), so the *decode*
step is a deterministic fake (:func:`chug_ray.kernels.simg.render_frame`)
behind the same actor/batch/schema plumbing a real codec would use;
:func:`decode_real_image` is the clearly-marked stub for wiring a real
library in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from chug_ray.kernels import simg, spdf
from chug_ray.util import from_pandas_typed


def decode_real_image(payload: bytes) -> "np.ndarray":
    """Stub for a real image codec (PIL/pillow-simd/libvips).

    The sandbox has no image library; the pipeline uses the
    deterministic SIMG fake instead. Swap this in per-deployment.
    """
    raise NotImplementedError(
        "real image decoding requires an image library (e.g. PIL); "
        "this environment uses the deterministic SIMG stand-in"
    )


class MediaFrameStats:
    """Actor: decode each media payload, emit per-payload frame features.

    Output: (media_ref, kind, n_frames_decoded, total_lines,
    sum_width, sum_height, mean_pixel_e4, decode_ok).
    """

    def __init__(self):
        # real deployments would load codec/model state here, once per actor
        pass

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ref, payload, kind in zip(
            batch["media_ref"], batch["payload"], batch["kind"]
        ):
            row = {
                "media_ref": ref,
                "kind": kind,
                "n_frames_decoded": 0,
                "total_lines": 0,
                "sum_width": 0,
                "sum_height": 0,
                "mean_pixel_e4": 0,
                "decode_ok": 0,
            }
            try:
                if kind == "image":
                    frames = simg.decode(bytes(payload))
                    pix_means = []
                    for f in frames:
                        row["n_frames_decoded"] += 1
                        row["total_lines"] += len(f.lines)
                        row["sum_width"] += f.width
                        row["sum_height"] += f.height
                        pix_means.append(float(simg.render_frame(f).mean()))
                    if pix_means:
                        row["mean_pixel_e4"] = int(
                            np.floor(np.mean(pix_means) * 1e4 + 0.5)
                        )
                else:  # pdf
                    pages = spdf.read_all_pages(bytes(payload))
                    row["n_frames_decoded"] = len(pages)
                    row["total_lines"] = sum(len(p) for p in pages)
                row["decode_ok"] = 1
            except (simg.SimgError, spdf.SpdfError):
                pass  # decode_ok stays 0 — error accounted, row kept
            rows.append(row)
        return pd.DataFrame(rows)


def media_frame_stats(media_path: str):
    """Decode + feature extraction over a media table.

    Runs as a TASK pool (the stage object is tiny, so shipping it per
    task beats waiting out actor-pool ramp — the round-1 execution
    finding); a deployment whose decoder loads real codec/model state
    passes the class + ``concurrency=`` instead."""
    import ray.data

    return ray.data.read_parquet(media_path).map_batches(
        MediaFrameStats(),
        batch_format="pandas",
        batch_size=64,  # payloads are large binaries — small batches
    )


class FrameSampler:
    """Actor: sample ≤ ``n`` frames per payload (the frame-sample stage of
    a video-ish pipeline), deterministic per media_ref."""

    def __init__(self, n_frames: int, seed: int = 0):
        self.n = n_frames
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        from chug_ray.util import rng_for

        out = []
        for ref, payload, kind in zip(
            batch["media_ref"], batch["payload"], batch["kind"]
        ):
            if kind != "image":
                continue
            try:
                frames = simg.decode(bytes(payload))
            except simg.SimgError:
                continue
            idx = list(range(len(frames)))
            rng = rng_for(self.seed, ref)
            if len(idx) > self.n:
                idx = sorted(rng.sample(idx, self.n))
            for i in idx:
                out.append(
                    {
                        "media_ref": ref,
                        "frame": i,
                        "width": frames[i].width,
                        "height": frames[i].height,
                    }
                )
        # typed Arrow output: an all-non-image batch must still emit the
        # (string, int64 ×3) schema — an empty PANDAS frame would convert
        # its object columns to Arrow `null` and break the block union
        return pa.table(
            {
                "media_ref": pa.array(
                    [r["media_ref"] for r in out], pa.string()
                ),
                "frame": pa.array([r["frame"] for r in out], pa.int64()),
                "width": pa.array([r["width"] for r in out], pa.int64()),
                "height": pa.array([r["height"] for r in out], pa.int64()),
            }
        )


def sample_frames(media_path: str, n_frames: int = 2, seed: int = 0):
    import ray.data

    return ray.data.read_parquet(media_path).map_batches(
        FrameSampler(n_frames, seed),
        batch_format="pandas",
        batch_size=64,
    )


class ImagespecDecoder:
    """Actor: decode → render → imagespec-coerce → crop-margin each image
    payload's first frame (the reference's DecodeDoc output contract,
    ``/root/reference/src/chug/wds/decode.py:211-292``, 1-page mode).

    Emits shape/dtype/crop features instead of pixel tensors — the
    Ray-side plumbing (actor pool, batch size, schema) is what a real
    resize/feature-extract stage would use; pixel math is the
    deterministic SIMG raster."""

    def __init__(
        self,
        spec: str,
        gray_threshold: int = 200,
        transforms: list[str] | None = None,
    ):
        from chug_ray.kernels.imagespec import build_doc_transform, parse_imagespec

        parse_imagespec(spec)  # plan-time validation, like the reference
        self.spec = spec
        self.gray_threshold = gray_threshold
        # optional deterministic doc-transform stack (bitmap/erosion/
        # dilation/align_long_axis/crop_margin), compiled once per actor
        self.transform = build_doc_transform(transforms)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        from chug_ray.kernels.imagespec import coerce_image, crop_margin

        rows = []
        for ref, payload, kind in zip(
            batch["media_ref"], batch["payload"], batch["kind"]
        ):
            if kind != "image":
                continue
            try:
                frames = simg.decode(bytes(payload))
            except simg.SimgError:
                continue
            if not frames:
                continue
            raster = simg.render_frame(frames[0])
            out = coerce_image(raster, self.spec)
            if self.transform is not None:
                out = self.transform(out)
            cropped = crop_margin(out, self.gray_threshold)
            rows.append(
                {
                    "media_ref": ref,
                    "out_h": out.shape[0],
                    "out_w": out.shape[1],
                    "out_c": 1 if out.ndim == 2 else out.shape[2],
                    "out_dtype": str(out.dtype),
                    "crop_h": cropped.shape[0],
                    "crop_w": cropped.shape[1],
                    "mean_e4": int(np.floor(float(np.mean(out)) * 1e4 + 0.5)),
                }
            )
        # typed Arrow output (same rationale as FrameSampler: an empty
        # pandas frame would emit Arrow `null` columns)
        return pa.table(
            {
                "media_ref": pa.array(
                    [r["media_ref"] for r in rows], pa.string()
                ),
                "out_h": pa.array([r["out_h"] for r in rows], pa.int64()),
                "out_w": pa.array([r["out_w"] for r in rows], pa.int64()),
                "out_c": pa.array([r["out_c"] for r in rows], pa.int64()),
                "out_dtype": pa.array(
                    [r["out_dtype"] for r in rows], pa.string()
                ),
                "crop_h": pa.array([r["crop_h"] for r in rows], pa.int64()),
                "crop_w": pa.array([r["crop_w"] for r in rows], pa.int64()),
                "mean_e4": pa.array(
                    [r["mean_e4"] for r in rows], pa.int64()
                ),
            }
        )


def imagespec_decode(
    media_path: str, spec: str = "rgb8", transforms: list[str] | None = None
):
    """Actor-pool imagespec decode stage over a media table.

    ``transforms`` is an optional deterministic doc-transform stack
    (``["bitmap:180", "erosion:3", ...]``) applied after coercion."""
    import ray.data

    return ray.data.read_parquet(media_path).map_batches(
        ImagespecDecoder(spec, 200, transforms),
        batch_format="pandas",
        batch_size=64,
    )


class FrameAugmenter:
    """Per-task callable: decode each image payload's first frame and
    run the keyed-RNG train augmentation stack
    (`chug_ray/kernels/augment.py`, the numpy port of
    `/root/reference/src/chug/image/build_transforms_doc.py:52-174`).
    Stack construction is trivial (a dict copy), so this ships as a
    pickled task callable rather than an actor pool — the repo-measured
    rule that task pools beat autoscaling actors for short stages.

    Every sample's draws are keyed by ``(seed, media_ref)``, so the
    emitted features
    (and the applied-stage bitmask) are identical at any batch size /
    actor count — the distributed-reproducibility property the
    reference's global-torch-RNG stack cannot give."""

    def __init__(self, size: tuple[int, int] = (64, 64), seed: int = 0):
        from chug_ray.kernels.augment import DocAugment

        self.aug = DocAugment(size, seed)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        rows = []
        for ref, payload, kind in zip(
            batch["media_ref"], batch["payload"], batch["kind"]
        ):
            if kind != "image":
                continue
            try:
                frames = simg.decode(bytes(payload))
            except simg.SimgError:
                continue
            if not frames:
                continue
            raster = simg.render_frame(frames[0])
            out, applied = self.aug(raster, ref)
            rows.append(
                {
                    "media_ref": ref,
                    "out_h": out.shape[0],
                    "out_w": out.shape[1],
                    "applied_mask": applied,
                    "mean_e4": int(np.floor(float(np.mean(out)) * 1e4 + 0.5)),
                }
            )
        # typed Arrow output: an all-non-image batch must still emit the
        # (string, int64 ×4) schema — an empty PANDAS frame would convert
        # its object columns to Arrow `null` and break the block union
        return pa.table(
            {
                "media_ref": pa.array(
                    [r["media_ref"] for r in rows], pa.string()
                ),
                "out_h": pa.array([r["out_h"] for r in rows], pa.int64()),
                "out_w": pa.array([r["out_w"] for r in rows], pa.int64()),
                "applied_mask": pa.array(
                    [r["applied_mask"] for r in rows], pa.int64()
                ),
                "mean_e4": pa.array([r["mean_e4"] for r in rows], pa.int64()),
            }
        )


def augment_frames(
    media_path: str, size: tuple[int, int] = (64, 64), seed: int = 0
):
    """Actor-pool keyed-RNG train-augmentation stage over a media table
    (SURVEY §2.11's random half). Emits per-frame output shape, the
    STAGE_BITS bitmask of augmentations that fired, and a fixed-point
    pixel mean — auditable, order-invariant evidence of the draw."""
    import ray.data

    return ray.data.read_parquet(
        media_path, columns=["media_ref", "payload", "kind"]
    ).map_batches(
        FrameAugmenter(size, seed),
        batch_format="pandas",
        batch_size=64,
    )


def decode_real_audio(payload: bytes) -> "np.ndarray":
    """Stub for a real audio codec (soundfile/ffmpeg/torchaudio).

    The sandbox has no audio library; the audio ops interpret the
    payload bytes as raw 16-bit PCM — a deterministic stand-in behind
    the same actor/batch/schema plumbing a real decoder would use.
    Swap this in per-deployment."""
    raise NotImplementedError(
        "real audio decoding requires an audio library (e.g. soundfile); "
        "this environment interprets payloads as raw int16 PCM"
    )


class AudioWindowFeatures:
    """Actor: "decode" each payload to a waveform (raw int16 PCM read of
    the payload bytes — the deterministic stand-in; see
    :func:`decode_real_audio`), then window it and emit per-window
    energy features. This is the audio analog of the frame-sample
    stage: large-binary batches stay small, per-payload work is a
    single vectorized reshape+reduce, and window features come out as
    integer e-4 units of full-scale so downstream aggregation is exact.

    Output: (media_ref, window_idx, n_samples, rms_e4, peak_e4).
    """

    def __init__(self, window: int = 1024):
        # a real deployment loads its codec / VAD / feature model here,
        # once per actor
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        w = self.window
        refs, widx, nsamp, rms, peak = [], [], [], [], []
        for ref, payload in zip(batch["media_ref"], batch["payload"]):
            raw = bytes(payload)
            samples = np.frombuffer(
                raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
            )
            if not len(samples):
                continue
            x = samples.astype(np.float64) / 32768.0
            n_win = -(-len(x) // w)
            pad = np.zeros(n_win * w, np.float64)
            pad[: len(x)] = x
            frames = pad.reshape(n_win, w)
            counts = np.minimum(
                np.full(n_win, w, np.int64),
                len(x) - w * np.arange(n_win, dtype=np.int64),
            )
            # RMS over the REAL samples of each window (zero-pad only
            # fills the matrix; the divisor is the true count)
            r = np.sqrt((frames**2).sum(axis=1) / counts)
            p = np.abs(frames).max(axis=1)
            refs.extend([ref] * n_win)
            widx.extend(range(n_win))
            nsamp.extend(counts.tolist())
            rms.extend(np.floor(r * 1e4 + 0.5).astype(np.int64).tolist())
            peak.extend(np.floor(p * 1e4 + 0.5).astype(np.int64).tolist())
        # typed Arrow output: a batch with only empty payloads must
        # still emit (string, int64 ×4), not object→null columns
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "window_idx": pa.array(widx, pa.int64()),
                "n_samples": pa.array(nsamp, pa.int64()),
                "rms_e4": pa.array(rms, pa.int64()),
                "peak_e4": pa.array(peak, pa.int64()),
            }
        )


def audio_window_features(media_path: str, window: int = 1024):
    """Windowed audio feature extraction over a media table (the audio
    modality's decode→feature stage; payload bytes are the waveform via
    the deterministic PCM stand-in)."""
    import ray.data

    return ray.data.read_parquet(media_path).map_batches(
        AudioWindowFeatures(window),
        batch_format="pandas",
        batch_size=64,  # payloads are large binaries — small batches
    )


def _area_resize(img: np.ndarray, out_h: int = 32, out_w: int = 32) -> np.ndarray:
    """Exact area-average resize via integral image — deterministic,
    numpy-only (the container has no image library)."""
    h, w = img.shape
    if h == 0 or w == 0:
        return np.zeros((out_h, out_w), np.float64)
    ii = np.zeros((h + 1, w + 1), np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), 0), 1)
    ys = np.round(np.linspace(0, h, out_h + 1)).astype(np.int64)
    xs = np.round(np.linspace(0, w, out_w + 1)).astype(np.int64)
    # every cell samples ≥1 pixel: for sub-32px inputs adjacent rounded
    # boundaries coincide, and a zero-area cell would read as 0.0 —
    # an artificial lattice that dominates the DCT of small frames.
    # Clamp lo into range and force hi ≥ lo+1 (nearest-pixel replicate);
    # cells that were already non-empty keep their exact bounds, so
    # every ≥32px hash is bit-identical to before.
    ylo = np.minimum(ys[:-1], h - 1)[:, None]
    yhi = np.maximum(ys[1:], np.minimum(ys[:-1], h - 1) + 1)[:, None]
    xlo = np.minimum(xs[:-1], w - 1)[None, :]
    xhi = np.maximum(xs[1:], np.minimum(xs[:-1], w - 1) + 1)[None, :]
    s = ii[yhi, xhi] - ii[ylo, xhi] - ii[yhi, xlo] + ii[ylo, xlo]
    area = ((yhi - ylo) * (xhi - xlo)).astype(np.float64)
    return s / area


_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n, dtype=np.float64)
        _DCT32 = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """Classic 64-bit perceptual hash: area-resize to 32×32, 2D DCT-II,
    keep the 8×8 low-frequency block, threshold on its median."""
    small = _area_resize(img)
    d = _dct_basis()
    coeffs = (d @ small @ d.T)[:8, :8].ravel()
    bits = coeffs > np.median(coeffs)
    return int(bits @ (1 << np.arange(64, dtype=np.uint64)).astype(object))


class PhashStage:
    """Actor-shaped stage: decode each image payload, emit one 64-bit
    perceptual hash per frame. Real deployments load the codec in
    ``__init__``; here decode is the deterministic SIMG stand-in."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        refs, frames_i, hashes = [], [], []
        for ref, payload, kind in zip(
            batch["media_ref"], batch["payload"], batch["kind"]
        ):
            if kind != "image":
                continue
            try:
                frames = simg.decode(bytes(payload))
            except simg.SimgError:
                continue
            for i, f in enumerate(frames):
                refs.append(ref)
                frames_i.append(i)
                hashes.append(phash64(simg.render_frame(f)))
        # typed Arrow output: an all-non-image batch must still emit
        # (string, int64, uint64), not object→null columns
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame": pa.array(frames_i, pa.int64()),
                # hashes use the full 64-bit range — keep uint64 end to end
                "phash": pa.array(hashes, pa.uint64()),
            }
        )


# uint8 LUT: the popcount strip _POP8[x] then matches x's byte budget
# instead of amplifying it 8× to int64 (the strip-tiling contract);
# per-row sums (≤ 64) promote to the platform int at the .sum()
_POP8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(1).astype(np.uint8)


def _hamming_strip_pairs(
    h: np.ndarray, max_dist: int, tile: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact all-pairs Hamming verify over DISTINCT hashes, tiled so
    peak memory is O(tile · n · 8) bytes (a strip of byte-LUT popcounts),
    never the full n × n matrix. Returns strictly-upper (i < j) index
    pairs with dist ≤ max_dist."""
    n = len(h)
    # shrink the strip so a row-tile × n byte matrix stays ≈ ≤256 MB
    tile = max(64, min(tile, (32 << 20) // max(n, 1)))
    ia, ib, dd = [], [], []
    for i0 in range(0, n, tile):
        hi = h[i0 : i0 + tile]
        x = (hi[:, None] ^ h[None, :]).view(np.uint8)
        dist = _POP8[x].reshape(len(hi), n, 8).sum(-1, dtype=np.int64)
        ii, jj = np.nonzero(dist <= max_dist)
        keep = jj > ii + i0  # strictly upper in GLOBAL indices
        ia.append(ii[keep] + i0)
        ib.append(jj[keep])
        dd.append(dist[ii[keep], jj[keep]])
    empty = np.array([], np.int64)
    return (
        np.concatenate(ia) if ia else empty,
        np.concatenate(ib) if ib else empty,
        np.concatenate(dd) if dd else empty,
    )


def _subband_hamming_pairs(
    h: np.ndarray, max_dist: int, tile: int, skip_bytes: tuple = ()
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Oversize-bucket fallback (the ``_banded_cos_pairs`` pattern from
    :mod:`chug_ray.ops.dedup`): re-bucket the bucket's DISTINCT hashes
    by each of the 8 bytes of the full hash and strip-verify only
    within sub-buckets — O(n · 8 · sub-bucket) instead of O(n²).
    Every emitted distance is exact; approximate only in recall (a
    pair whose ≤ max_dist flipped bits touch every USED byte collides
    in no sub-table — impossible while max_dist < the used-byte count).

    ``skip_bytes`` names the hash bytes that are CONSTANT within the
    caller's bucket (the two bytes forming the band key): their
    sub-tables would collapse the whole bucket into one sub-bucket and
    re-run the full O(n²) verify the fallback exists to avoid."""
    seen: set[tuple[int, int]] = set()
    va, vb, dd = [], [], []
    bytes_ = h.view(np.uint8).reshape(len(h), 8)
    for b in range(8):
        if b in skip_bytes:
            continue
        codes = bytes_[:, b]
        order = np.argsort(codes, kind="stable")
        bounds = np.nonzero(np.diff(codes[order]))[0] + 1
        for members in np.split(order, bounds):
            if len(members) < 2:
                continue
            ia, ib, d = _hamming_strip_pairs(h[members], max_dist, tile)
            for x, y, v in zip(members[ia], members[ib], d):
                key = (int(x), int(y)) if x < y else (int(y), int(x))
                if key not in seen:
                    seen.add(key)
                    va.append(key[0])
                    vb.append(key[1])
                    dd.append(int(v))
    return (
        np.array(va, np.int64),
        np.array(vb, np.int64),
        np.array(dd, np.int64),
    )


def phash_dups(
    media_path: str,
    max_dist: int = 10,
    n_bands: int = 4,
    max_group_rows: int = 20_000,
    tile: int = 4096,
    max_dup_hashes: int = 5_000_000,
):
    """Image near-duplicate pairs by perceptual hash + banded LSH — the
    multimodal member of the dedup family (crop/re-encode duplicates
    that exact byte dedup misses).

    Scale shape (mirrors the MinHash banding plan plus the
    ``fuzzy_name_pairs`` multiplicity collapse in
    :mod:`chug_ray.ops.dedup`): identical pHashes — the common web case
    (blank/near-constant frames) — are collapsed FIRST by one
    ``groupby(phash)`` that elects a representative per distinct hash
    and emits the group as distance-0 star pairs (rep, member): m−1
    rows instead of C(m,2), no pairwise verify at all. A combiner-count
    census first finds the hashes with multiplicity ≥ 2 (broadcast via
    ``ray.put``, capped loudly by ``max_dup_hashes`` with the full
    collapse groupby as the documented fallback) so SINGLETON hashes —
    the bulk of any real corpus — bypass the collapse shuffle entirely
    via a map-side searchsorted filter. Only DISTINCT
    hashes enter banding: each 64-bit pHash splits into ``n_bands``
    16-bit bands; a second census over the band keys — bounded by
    ``n_bands · 2^16`` rows BY CONSTRUCTION, so the broadcast is always
    driver-safe — drops singleton buckets map-side before one
    ``groupby`` on (band, band bits) co-locates the surviving
    candidates (two hashes within Hamming ``max_dist`` < 16 collide on
    ≥1 band whenever the flipped bits avoid one band — the standard
    LSH recall trade, pinned by the planted-duplicate test). In-bucket
    exact verify is a tiled strip scan (peak memory O(tile · n), never
    n × n); a bucket over ``max_group_rows`` falls back to 8-bit
    sub-band re-bucketing + strip verify (the ``_banded_cos_pairs``
    pattern — near-linear, exact distances, approximate only in
    recall, and exact for max_dist < 8). Pair dedup across bands is
    one last ``Min`` aggregate over candidate pairs (every emission of
    a pair carries the same exact distance, so Min is a pure dedup),
    bounded by the number of near-dup DISTINCT-hash pairs, not frames;
    star pairs bypass it (disjoint by construction). Connected
    components over the output equal those of the full
    pairwise-emission semantics; the census and fallback paths are
    pinned equal in tests/test_phash_dups.py.

    Not SQL-expressible over the parquet views (payload decode) →
    rows-only driver check; recall/precision + hot-bucket boundedness
    pinned by pytest.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    hashes = ray.data.read_parquet(media_path).map_batches(
        PhashStage(),
        batch_format="pandas",
        batch_size=64,  # payloads are large binaries — small batches
    )

    def to_keyed(batch: pd.DataFrame) -> pd.DataFrame:
        # int64 bit-view of the uint64 hash: Ray's sort shuffle keys on
        # int64; the bits round-trip exactly
        out = batch.copy()
        out["hkey"] = out["phash"].to_numpy(np.uint64).view(np.int64)
        return out.drop(columns=["phash"])

    def collapse_hash(group: pd.DataFrame) -> pa.Table:
        """One group per DISTINCT hash: row 0 (sorted) is the elected
        representative; the rest become distance-0 star pairs. Linear
        in the group — a 10k-identical-frame pile emits 9,999 rows."""
        from chug_ray.telemetry import record_group

        record_group("phash_dups(hash)", None, len(group))
        g = group.sort_values(["media_ref", "frame"], ignore_index=True)
        refs = g["media_ref"].to_numpy(object)
        frm = g["frame"].to_numpy(np.int64)
        m = len(g)
        rep = np.zeros(m, bool)
        rep[0] = True
        return pa.table(
            {
                "is_rep": pa.array(rep),
                "a_ref": pa.array([refs[0]] * m, pa.string()),
                "a_frame": pa.array(np.full(m, frm[0]), pa.int64()),
                "b_ref": pa.array(refs, pa.string()),
                "b_frame": pa.array(frm, pa.int64()),
                "hkey": pa.array(
                    g["hkey"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    import ray
    from ray.data.aggregate import Min, Sum

    keyed = hashes.map_batches(to_keyed, batch_format="pandas").materialize()

    # --- duplicated-hash census (singleton bypass) --------------------
    # Singleton hashes are their own representative and emit no star
    # pairs, so only hashes with multiplicity ≥ 2 need the collapse
    # groupby at all. One combiner-count aggregate finds them; the dup
    # set rides a ray.put broadcast (capped loudly) and routing is a
    # map-side searchsorted filter — the per-group map_groups Python
    # cost then scales with ACTUAL duplicate classes, not all frames.
    def count_partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("hkey", as_index=False).size()
        return pa.table(
            {
                "hkey": pa.array(g["hkey"].to_numpy(np.int64)),
                "m": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    # bounded pull: limit(cap + 1) decides the branch BEFORE any full
    # driver materialization — at most cap+1 rows ever reach the
    # driver, as ZERO-COPY int64 arrow blocks (a row-dict pull of a
    # 5M-class census would build hundreds of MB of Python objects
    # just to be reduced to a 40 MB array)
    import ray as _ray

    dup_tabs = [
        t
        for t in _ray.get(
            keyed.map_batches(count_partial, batch_format="pandas")
            .materialize()  # partials: the sort shuffle re-executes lazy inputs
            .groupby("hkey")
            .aggregate(Sum("m", alias_name="m"))
            .map_batches(
                lambda b: b.filter(pc.greater(b["m"], 1)).select(["hkey"]),
                batch_format="pyarrow",
            )
            .limit(max_dup_hashes + 1)
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    dup_keys = (
        pa.concat_tables(dup_tabs)["hkey"].to_numpy(zero_copy_only=False)
        if dup_tabs
        else np.array([], np.int64)
    )
    if len(dup_keys) > max_dup_hashes:
        import logging

        logging.getLogger("chug_ray").warning(
            "phash_dups: duplicated-hash census exceeds "
            "max_dup_hashes=%d; falling back to the full collapse "
            "groupby (no broadcast singleton bypass)",
            max_dup_hashes,
        )

    def stars_from(collapsed) -> "ray.data.Dataset":
        def stars_only(b: pa.Table) -> pa.Table:
            b = b.filter(pc.invert(b["is_rep"]))
            return pa.table(
                {
                    "a_ref": b["a_ref"],
                    "a_frame": b["a_frame"],
                    "b_ref": b["b_ref"],
                    "b_frame": b["b_frame"],
                    "hamming": pa.array(np.zeros(len(b), np.int64)),
                }
            )

        return collapsed.map_batches(stars_only, batch_format="pyarrow")

    def reps_view(b: pa.Table) -> pa.Table:
        # unified rep schema for the banding stage
        return pa.table(
            {"b_ref": b["b_ref"], "b_frame": b["b_frame"], "hkey": b["hkey"]}
        )

    if len(dup_keys) == 0:
        # no duplicated hash anywhere: every row is its own rep,
        # no stars, no collapse shuffle at all
        star_pairs = ray.data.from_arrow(
            pa.table(
                {
                    "a_ref": pa.array([], pa.string()),
                    "a_frame": pa.array([], pa.int64()),
                    "b_ref": pa.array([], pa.string()),
                    "b_frame": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
        reps = keyed.map_batches(
            lambda b: pa.table(
                {
                    "b_ref": b["media_ref"],
                    "b_frame": pc.cast(b["frame"], pa.int64()),
                    "hkey": b["hkey"],
                }
            ),
            batch_format="pyarrow",
        ).materialize()  # consumed twice (band census + band rows)
    elif len(dup_keys) <= max_dup_hashes:
        dup_ref = ray.put(np.sort(dup_keys.astype(np.int64)))

        def dup_mask(b: pa.Table, _r=dup_ref) -> np.ndarray:
            d = ray.get(_r)
            k = b["hkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(d, k)
            return (pos < len(d)) & (d[np.minimum(pos, len(d) - 1)] == k)

        collapsed = (
            keyed.map_batches(
                lambda b: b.filter(pa.array(dup_mask(b))),
                batch_format="pyarrow",
            )
            .materialize()  # partials: the sort shuffle re-executes lazy inputs
            .groupby("hkey")
            .map_groups(collapse_hash, batch_format="pandas")
            .materialize()  # consumed twice (stars + dup reps)
        )
        star_pairs = stars_from(collapsed)
        dup_reps = collapsed.map_batches(
            lambda b: reps_view(b.filter(b["is_rep"])),
            batch_format="pyarrow",
        )
        single_reps = keyed.map_batches(
            lambda b: pa.table(
                {
                    "b_ref": b["media_ref"],
                    "b_frame": pc.cast(b["frame"], pa.int64()),
                    "hkey": b["hkey"],
                }
            ).filter(pa.array(~dup_mask(b))),
            batch_format="pyarrow",
        )
        reps = single_reps.union(dup_reps).materialize()
    else:
        # dup set outgrew the broadcast cap: fall back to the full
        # collapse groupby over every frame (the pre-census plan) —
        # node-bounded, one sort shuffle over all (hkey, id) rows
        collapsed = (
            keyed.groupby("hkey")
            .map_groups(collapse_hash, batch_format="pandas")
            .materialize()  # consumed twice (stars + reps)
        )
        star_pairs = stars_from(collapsed)
        reps = collapsed.map_batches(
            lambda b: reps_view(b.filter(b["is_rep"])),
            batch_format="pyarrow",
        ).materialize()

    def band_rows(batch: pa.Table) -> pd.DataFrame:
        h = batch["hkey"].to_numpy(zero_copy_only=False).view(np.uint64)
        refs = np.asarray(batch["b_ref"].to_pylist(), object)
        frm = batch["b_frame"].to_numpy(zero_copy_only=False)
        outs = []
        for b in range(n_bands):
            bits = (h >> np.uint64(b * 16)) & np.uint64(0xFFFF)
            outs.append(
                pd.DataFrame(
                    {
                        "bk": (
                            (np.uint64(b) << np.uint64(16)) | bits
                        ).view(np.int64),
                        "media_ref": refs,
                        "frame": frm.astype(np.int64),
                        "hkey": h.view(np.int64),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("phash_dups(bucket)", None, len(group))
        g = group.sort_values(["media_ref", "frame"], ignore_index=True)
        h = g["hkey"].to_numpy(np.int64).view(np.uint64)
        n = len(g)
        if n > 1:
            if n <= max_group_rows:
                ia, ib, dist = _hamming_strip_pairs(h, max_dist, tile)
            else:
                # the bucket's band bytes are constant within the group
                # — their sub-tables would collapse to one full bucket;
                # skip them so the fallback stays sub-quadratic
                band = int(g["bk"].iat[0]) >> 16
                ia, ib, dist = _subband_hamming_pairs(
                    h, max_dist, tile,
                    skip_bytes=(2 * band, 2 * band + 1),
                )
        else:
            ia = ib = dist = np.array([], np.int64)
        refs = g["media_ref"].to_numpy(object) if n else np.zeros(0, object)
        frm = g["frame"].to_numpy(np.int64) if n else np.zeros(0, np.int64)
        # canonical (a < b by ref,frame) so the cross-band dedup keys agree:
        # rows were sorted, and strip/subband pairs keep i < j
        return pa.table(
            {
                "a_ref": pa.array(refs[ia], pa.string()),
                "a_frame": pa.array(frm[ia], pa.int64()),
                "b_ref": pa.array(refs[ib], pa.string()),
                "b_frame": pa.array(frm[ib], pa.int64()),
                "hamming": pa.array(dist, pa.int64()),
            }
        )

    # --- hot-bucket census (singleton-bucket bypass) -------------------
    # The band-bucket key space is ≤ n_bands · 2^16 rows by construction,
    # so the multi-member bucket set ALWAYS fits on the driver — no cap
    # needed. Buckets with one member cannot emit a pair; filtering them
    # map-side means the per-bucket map_groups Python cost scales with
    # COLLIDING buckets, not with every distinct hash × n_bands.
    def band_count_partial(b: pa.Table) -> pa.Table:
        h = b["hkey"].to_numpy(zero_copy_only=False).view(np.uint64)
        ks, cs = [], []
        for band in range(n_bands):
            bits = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            bk = ((np.uint64(band) << np.uint64(16)) | bits).view(np.int64)
            u, c = np.unique(bk, return_counts=True)
            ks.append(u)
            cs.append(c.astype(np.int64))
        return pa.table(
            {
                "bk": pa.array(np.concatenate(ks) if ks else []),
                "c": pa.array(np.concatenate(cs) if cs else []),
            }
        )

    hot_rows = (
        reps.map_batches(band_count_partial, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("bk")
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["c"], 1)),
            batch_format="pyarrow",
        )
        .take_all()  # ≤ n_bands · 65536 rows by construction
    )

    if len(hot_rows) == 0:
        return star_pairs  # no band collision anywhere: stars are it

    hot_ref = ray.put(
        np.sort(np.array([r["bk"] for r in hot_rows], np.int64))
    )

    def hot_band_rows(batch: pa.Table, _r=hot_ref) -> pa.Table:
        out = band_rows(batch)
        hot = ray.get(_r)
        bk = out["bk"].to_numpy(np.int64)
        pos = np.searchsorted(hot, bk)
        keep = (pos < len(hot)) & (hot[np.minimum(pos, len(hot) - 1)] == bk)
        # pin media_ref so an all-filtered block cannot degrade it to
        # arrow null (breaks the block union entering the groupby)
        return from_pandas_typed(
            out[keep].reset_index(drop=True), ("media_ref",)
        )

    rep_pairs = (
        reps.map_batches(hot_band_rows, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("bk")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()  # pin before the pair-dedup shuffle
        # cross-band dedup: every emission of a pair carries the SAME
        # exact distance, so Min is a pure dedup (arrow-native, no
        # per-group pandas calls)
        .groupby(["a_ref", "a_frame", "b_ref", "b_frame"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )
    # star pairs are disjoint from rep-rep pairs (a star's b side is a
    # non-representative) — union after the dedup, no extra shuffle
    return rep_pairs.union(star_pairs)
