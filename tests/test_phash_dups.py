"""Image perceptual-hash near-dup (chug_ray/ops/media.py:phash_dups).
The SIMG renderer is seed-deterministic, so near-duplicates are planted
as cropped/extended variants of the same pix_seed (the literal use-case
pHash exists for) and unrelated images are fresh seeds (uncorrelated
random rasters — expected Hamming ≈ 32).

Output contract (round-5 skew guard): identical pHashes collapse to a
representative + distance-0 STAR pairs (rep, member) — m−1 rows per
identical class, not C(m,2) — and banding/verify runs over DISTINCT
hashes only. Connected components equal the full pairwise semantics;
these tests assert components, pair counts under the star contract,
and bounded behavior on a planted hot bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chug_ray.kernels import simg
from chug_ray.ops.media import (
    _hamming_strip_pairs,
    _subband_hamming_pairs,
    phash64,
    phash_dups,
)


def _img(ref: str, h: int, seed: int) -> dict:
    f = simg.Frame(width=64, height=h, pix_seed=seed, lines=("x",))
    return {"media_ref": ref, "payload": simg.encode([f]), "kind": "image"}


def _write(tmp_path, rows) -> str:
    p = str(tmp_path / "media.parquet")
    pq.write_table(pa.Table.from_pylist(rows), p)
    return p


def _components(out: pd.DataFrame) -> dict[str, int]:
    """Union-find over the pair rows → ref -> component id."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(out["a_ref"], out["b_ref"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = sorted({find(k) for k in parent})
    return {k: roots.index(find(k)) for k in parent}


def test_phash_identical_and_crop_variants():
    base = simg.render_frame(simg.Frame(64, 64, 7, ("x",)))
    same = simg.render_frame(simg.Frame(64, 64, 7, ("y", "z")))
    crop = simg.render_frame(simg.Frame(64, 66, 7, ("x",)))
    other = simg.render_frame(simg.Frame(64, 64, 8, ("x",)))
    assert phash64(base) == phash64(same)  # plain lines don't affect pixels
    d_crop = bin(phash64(base) ^ phash64(crop)).count("1")
    d_other = bin(phash64(base) ^ phash64(other)).count("1")
    assert d_crop <= 10
    assert d_other > 10


def test_watermark_line_stamps_pixels():
    """``wm@x,y`` inverts a 4×4 block — a real, localized raster change
    (small nonzero pHash distance); any other line stays pixel-neutral."""
    base = simg.render_frame(simg.Frame(48, 32, 0xC0FFEE01, ()))
    wm = simg.render_frame(simg.Frame(48, 32, 0xC0FFEE01, ("wm@4,4",)))
    diff = base != wm
    assert diff.sum() == 16  # exactly the 4×4 block
    assert diff[4:8, 4:8].all()
    np.testing.assert_array_equal(base[4:8, 4:8] ^ 0xFF, wm[4:8, 4:8])
    d = bin(phash64(base) ^ phash64(wm)).count("1")
    assert 0 < d <= 10  # near-dup range: found by banding, not identical
    # near-miss line forms are NOT watermarks
    for ln in ("wm@4", "wm@4,4 extra", "xwm@4,4", "wm@a,b"):
        np.testing.assert_array_equal(
            base, simg.render_frame(simg.Frame(48, 32, 0xC0FFEE01, (ln,)))
        )
    # out-of-bounds stamp clips instead of raising
    edge = simg.render_frame(simg.Frame(8, 8, 3, ("wm@6,6",)))
    assert (edge != simg.render_frame(simg.Frame(8, 8, 3, ()))).sum() == 4


def test_phash_dups_finds_planted_pairs(ray_session, tmp_path):
    rows = [
        _img("orig", 64, 7),
        _img("exact", 64, 7),  # identical content, distance 0
        _img("crop", 66, 7),  # same seed, 2 extra rows: small distance
        _img("other-1", 64, 101),
        _img("other-2", 64, 202),
        _img("other-3", 64, 303),
    ]
    out = phash_dups(_write(tmp_path, rows)).to_pandas()
    comp = _components(out)
    # the three seed-7 variants land in ONE component
    assert comp["orig"] == comp["exact"] == comp["crop"]
    # the identical pair surfaces as a distance-0 star pair
    star = out[(out["a_ref"] == "exact") & (out["b_ref"] == "orig")]
    assert len(star) == 1 and (star["hamming"] == 0).all()
    # unrelated seeds never pair up with anything
    flat = set(out["a_ref"]) | set(out["b_ref"])
    assert not {"other-1", "other-2", "other-3"} & flat


def test_phash_dups_deterministic(ray_session, tmp_path):
    rows = [_img(f"m{i:02d}", 64, i % 3) for i in range(12)]
    p = _write(tmp_path, rows)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), ignore_index=True)

    a = canon(phash_dups(p).to_pandas())
    b = canon(phash_dups(p).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # 3 seed-classes of 4 identical images -> star pairs: 3 * (4-1) = 9
    assert len(a) == 9
    assert (a["hamming"] == 0).all()
    comp = _components(a)
    assert len(set(comp.values())) == 3
    for i in range(12):
        assert comp[f"m{i:02d}"] == comp[f"m{i % 3:02d}"]


def test_phash_dups_census_and_fallback_paths_agree(ray_session, tmp_path):
    """The duplicated-hash census broadcast (singleton bypass) and the
    full-collapse fallback (forced with max_dup_hashes=0) are the same
    semantics — identical pair sets on the planted corpus."""
    rows = [_img(f"m{i:02d}", 64, i % 3) for i in range(12)] + [
        _img("crop", 66, 0),
        _img("lone", 64, 999),
    ]
    p = _write(tmp_path, rows)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), ignore_index=True)

    fast = canon(phash_dups(p).to_pandas())
    slow = canon(phash_dups(p, max_dup_hashes=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) >= 9  # 3 classes × 3 star pairs + any crop edge


def test_phash_dups_hot_bucket_bounded(ray_session, tmp_path):
    """The planted hot bucket: many identical frames (one pHash). The
    collapse emits exactly m−1 star pairs — linear, no pairwise verify
    — plus the cross-hash pair to the crop variant's representative."""
    m = 2000
    rows = [_img(f"dup{i:04d}", 64, 7) for i in range(m)]
    rows.append(_img("crop", 66, 7))
    out = phash_dups(_write(tmp_path, rows)).to_pandas()
    stars = out[out["hamming"] == 0]
    assert len(stars) == m - 1  # star pairs, not C(m, 2)
    assert (stars["a_ref"] == "dup0000").all()  # elected representative
    cross = out[out["hamming"] > 0]
    assert len(cross) == 1
    assert set(cross[["a_ref", "b_ref"]].iloc[0]) == {"dup0000", "crop"}
    comp = _components(out)
    assert len(set(comp.values())) == 1


def test_phash_dups_subband_fallback(ray_session, tmp_path):
    """Force the oversize-bucket sub-band path (max_group_rows=1) on
    the planted set: same components as the strip path."""
    rows = [
        _img("orig", 64, 7),
        _img("exact", 64, 7),
        _img("crop", 66, 7),
        _img("other-1", 64, 101),
    ]
    p = _write(tmp_path, rows)
    base = simg.render_frame(simg.Frame(64, 64, 7, ("x",)))
    crop = simg.render_frame(simg.Frame(64, 66, 7, ("x",)))
    d_crop = bin(phash64(base) ^ phash64(crop)).count("1")
    out = phash_dups(p, max_group_rows=1).to_pandas()
    comp = _components(out)
    if d_crop < 8:
        # sub-banding is EXACT below 8 flipped bits (pigeonhole over
        # the 8 hash bytes) — the crop edge must survive
        assert comp["orig"] == comp["crop"]
    assert comp["orig"] == comp["exact"]
    assert "other-1" not in comp


def test_hamming_strip_matches_bruteforce():
    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**63, 300, dtype=np.int64).view(np.uint64)
    h = np.unique(h)
    ia, ib, d = _hamming_strip_pairs(h, max_dist=30, tile=37)
    got = {(int(a), int(b), int(v)) for a, b, v in zip(ia, ib, d)}
    want = set()
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            v = bin(int(h[i]) ^ int(h[j])).count("1")
            if v <= 30:
                want.add((i, j, v))
    assert got == want


def test_subband_exact_below_eight_bits():
    """Every pair within Hamming 7 shares at least one untouched hash
    byte, so the sub-band fallback is exact there."""
    rng = np.random.default_rng(12)
    base = rng.integers(0, 2**63, 40, dtype=np.int64).view(np.uint64)
    flips = []
    for i, b in enumerate(base):
        x = int(b)
        for k in range(1 + i % 7):
            x ^= 1 << ((i * 7 + k * 11) % 64)
        flips.append(x)
    h = np.unique(
        np.concatenate([base, np.array(flips, np.uint64)])
    )
    ia, ib, d = _subband_hamming_pairs(h, max_dist=7, tile=64)
    got = {(int(a), int(b)) for a, b in zip(ia, ib)}
    want = set()
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            if bin(int(h[i]) ^ int(h[j])).count("1") <= 7:
                want.add((i, j))
    assert got == want


def test_planted_stock_frames_give_dup_signal(ray_session, tmp_path):
    """CorpusConfig.dup_frame_rate plants stock frames (the repeated
    logos/banners of real web corpora): phash_dups over such a corpus
    must find the planted identical-frame pairs, while the main rng
    stream — and therefore every rate=0.0 corpus — is unchanged."""
    from chug_ray.config import CorpusConfig
    from chug_ray.synth import make_doc, write_corpus_inline

    base = CorpusConfig(seed=42, n_docs=120, skew="test")
    planted = CorpusConfig(
        seed=42, n_docs=120, skew="test", dup_frame_rate=0.5
    )
    # the doc table (spans/offsets) is a function of the main stream
    # only: planting swaps media payload bytes, never document structure
    for i in range(0, 120, 17):
        d0, _ = make_doc(base, i)
        d1, _ = make_doc(planted, i)
        assert d0 == d1
    out = str(tmp_path / "planted")
    write_corpus_inline(planted, out)
    pairs = phash_dups(f"{out}/media.parquet").to_pandas()
    assert len(pairs) > 0
    # stock repeats give BOTH signals: exact (distance-0 star pairs
    # through the multiplicity collapse) and watermarked near variants
    # (0 < hamming ≤ max_dist, through banding + strip verify)
    assert (pairs["hamming"] == 0).any()
    near = pairs[pairs["hamming"] > 0]
    assert len(near) > 0
    assert (near["hamming"] <= 10).all()
