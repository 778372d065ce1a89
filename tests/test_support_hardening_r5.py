"""Pins for the closing-day ingest/urls/steps/collate/synth fixes."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest


def test_ingest_shape_lenient():
    """Valid-JSON-but-wrong-shape annotations become empty-span docs,
    never batch crashes (the no-row-thrown-away policy)."""
    from chug_ray.ingest import ingest_ocr_batch

    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d", "e"]),
            "anno_json": pa.array(
                [
                    "null",
                    "[1, 2]",
                    '{"pages": [42]}',
                    '{"pages": [{"lines": 7}]}',
                    '{"pages": [{"text": ["ok line"]}]}',
                ]
            ),
        }
    )
    out = ingest_ocr_batch(batch)
    spans = out["spans"].to_pylist()
    assert [len(s) for s in spans] == [0, 0, 1, 1, 1]
    assert spans[2][0]["text"] == ""  # non-dict page -> empty span
    assert spans[4][0]["text"] == "ok line"


def test_synth_cleans_partial_cache(tmp_path):
    """A cache dir without the _complete marker (crashed generation)
    is wiped before regeneration, not appended to."""
    from chug_ray.synth import corpus_for_sf_dir

    cache = tmp_path / "cache"
    stale_dir = cache / "sf0.001_s42_n200_test_d25w"
    stale_dir.mkdir(parents=True)
    stale = stale_dir / "stale-residue.parquet"
    stale.write_bytes(b"junk")
    docs, media, _ = corpus_for_sf_dir(
        "/root/testdata/sf0.001", cache_root=str(cache)
    )
    assert not stale.exists()  # residue wiped
    assert os.path.exists(docs) and os.path.exists(media)
    assert os.path.exists(str(stale_dir / "_complete"))


def test_expand_urls_list_branch_string_weights():
    from chug_ray.urls import expand_urls

    urls, w = expand_urls(["a.tar", "b.tar"], weights="1::2")
    assert w == [1.0, 2.0]


def test_envsubst_raises_on_circular(monkeypatch):
    from chug_ray.urls import envsubst

    monkeypatch.setenv("WDS_DATA", "${DATA}")
    with pytest.raises(ValueError, match="unresolved"):
        envsubst("${DATA}/x")


def test_step_rejects_constructor_args_on_function():
    from chug_ray.steps import Step

    def fn(b):
        return b

    with pytest.raises(ValueError, match="callable CLASS"):
        Step(name="bad", fn=fn, fn_constructor_args=(1,))


def test_collate_nullable_int_stays_list():
    from chug_ray.collate import collate_arrow_batch

    t = pa.table(
        {
            "label": pa.array([2, None, 5], pa.int64()),
            "x": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = collate_arrow_batch(t)
    assert out["label"] == [2, None, 5]  # list, not float64-with-NaN
    assert isinstance(out["x"], np.ndarray)  # floats still stack
