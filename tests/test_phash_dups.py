"""Image perceptual-hash near-dup (chug_ray/ops/media.py:phash_dups).
The SIMG renderer is seed-deterministic, so near-duplicates are planted
as cropped/extended variants of the same pix_seed (the literal use-case
pHash exists for) and unrelated images are fresh seeds (uncorrelated
random rasters — expected Hamming ≈ 32)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chug_ray.kernels import simg
from chug_ray.ops.media import phash64, phash_dups


def _img(ref: str, h: int, seed: int) -> dict:
    f = simg.Frame(width=64, height=h, pix_seed=seed, lines=("x",))
    return {"media_ref": ref, "payload": simg.encode([f]), "kind": "image"}


def _write(tmp_path, rows) -> str:
    p = str(tmp_path / "media.parquet")
    pq.write_table(pa.Table.from_pylist(rows), p)
    return p


def test_phash_identical_and_crop_variants():
    base = simg.render_frame(simg.Frame(64, 64, 7, ("x",)))
    same = simg.render_frame(simg.Frame(64, 64, 7, ("y", "z")))
    crop = simg.render_frame(simg.Frame(64, 66, 7, ("x",)))
    other = simg.render_frame(simg.Frame(64, 64, 8, ("x",)))
    assert phash64(base) == phash64(same)  # lines don't affect pixels
    d_crop = bin(phash64(base) ^ phash64(crop)).count("1")
    d_other = bin(phash64(base) ^ phash64(other)).count("1")
    assert d_crop <= 10
    assert d_other > 10


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
    pairs = {
        tuple(sorted((a, b)))
        for a, b in zip(out["a_ref"], out["b_ref"])
    }
    assert ("exact", "orig") in pairs
    assert ("crop", "orig") in pairs
    exact = out[
        (out[["a_ref", "b_ref"]].apply(tuple, axis=1).map(sorted).map(tuple))
        == ("exact", "orig")
    ]
    assert (exact["hamming"] == 0).all()
    # unrelated seeds never pair up with anything
    flat = set(out["a_ref"]) | set(out["b_ref"])
    assert not {"other-1", "other-2", "other-3"} & flat


def test_phash_dups_deterministic(ray_session, tmp_path):
    rows = [_img(f"m{i}", 64, i % 3) for i in range(12)]
    p = _write(tmp_path, rows)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), ignore_index=True)

    a = canon(phash_dups(p).to_pandas())
    b = canon(phash_dups(p).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # 3 seed-classes of 4 identical images -> 3 * C(4,2) = 18 pairs
    assert len(a) == 18
    assert (a["hamming"] == 0).all()
