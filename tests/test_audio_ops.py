"""Audio-modality plumbing: windowed feature extraction over PCM-
interpreted payloads (chug_ray/ops/media.py:AudioWindowFeatures). The
decode stand-in is deterministic (raw int16 read), so features are
hand-computable goldens."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chug_ray.ops.media import AudioWindowFeatures, audio_window_features


def _pcm(samples: np.ndarray) -> bytes:
    return samples.astype("<i2").tobytes()


def test_window_features_golden():
    """Hand-computed RMS/peak over two windows including a partial one."""
    # 6 samples, window 4: win0 = 4 full samples, win1 = 2 real samples
    s = np.array([16384, -16384, 0, 0, 32767, 0], np.int16)
    batch = pd.DataFrame(
        {"media_ref": ["a"], "payload": [_pcm(s)], "kind": ["audio"]}
    )
    out = AudioWindowFeatures(window=4)(batch).to_pandas()
    assert out["window_idx"].tolist() == [0, 1]
    assert out["n_samples"].tolist() == [4, 2]
    x = s.astype(np.float64) / 32768.0
    rms0 = np.sqrt((x[:4] ** 2).sum() / 4)
    rms1 = np.sqrt((x[4:] ** 2).sum() / 2)
    assert out["rms_e4"].tolist() == [
        int(np.floor(rms0 * 1e4 + 0.5)),
        int(np.floor(rms1 * 1e4 + 0.5)),
    ]
    assert out["peak_e4"].tolist() == [5000, 10000]


def test_window_features_edge_payloads():
    """Odd-length payloads drop the trailing byte; empty payloads emit
    no windows but other refs in the batch still do."""
    batch = pd.DataFrame(
        {
            "media_ref": ["empty", "one", "odd"],
            "payload": [b"", b"\x00\x40", b"\x00\x40\x7f"],
            "kind": ["audio"] * 3,
        }
    )
    out = AudioWindowFeatures(window=8)(batch).to_pandas()
    assert out["media_ref"].tolist() == ["one", "odd"]
    assert out["n_samples"].tolist() == [1, 1]
    # both decode to the single sample 0x4000 = 16384 -> 0.5 full scale
    assert out["rms_e4"].tolist() == [5000, 5000]


def test_audio_op_over_media_table(ray_session, tmp_path):
    """Distributed run over a media-shaped parquet table: every payload
    yields ceil(n_samples/window) windows, deterministically."""
    rng = np.random.default_rng(3)
    refs = [f"m{i}" for i in range(20)]
    payloads = [
        _pcm(rng.integers(-32768, 32767, size=rng.integers(1, 5000)))
        for _ in refs
    ]
    tbl = pa.table(
        {
            "media_ref": pa.array(refs),
            "payload": pa.array(payloads, pa.binary()),
            "kind": pa.array(["audio"] * len(refs)),
        }
    )
    path = str(tmp_path / "media.parquet")
    pq.write_table(tbl, path)
    out = audio_window_features(path, window=256).to_pandas()
    for ref, payload in zip(refs, payloads):
        n = len(payload) // 2
        expect = -(-n // 256)
        assert (out["media_ref"] == ref).sum() == expect
    # distributed result equals the single-process golden
    local = AudioWindowFeatures(window=256)(
        pd.DataFrame(
            {"media_ref": refs, "payload": payloads, "kind": ["audio"] * 20}
        )
    ).to_pandas()
    a = out.sort_values(["media_ref", "window_idx"], ignore_index=True)
    b = local.sort_values(["media_ref", "window_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
