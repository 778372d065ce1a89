"""Driver-side broadcast caches must survive a ray.shutdown()+init()
within one process (fresh session ⇒ fresh refs, no dangling objects),
and partition reads must be format-aware."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
import ray
for round in range(2):
    ray.init(address="local", num_cpus=4, include_dashboard=False)
    from chug_ray.ops.tokenize import tokenize_ids
    n = tokenize_ids("/root/testdata/sf0.001").count()
    assert n > 0, n
    ray.shutdown()
print("OK")
"""


def test_vocab_cache_survives_session_restart():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_is_lance_dir_detection(tmp_path):
    from chug_ray.io import is_lance_dir

    plain = tmp_path / "parquet_part"
    plain.mkdir()
    (plain / "f.parquet").touch()
    assert not is_lance_dir(str(plain))

    lancey = tmp_path / "lance_part"
    (lancey / "_versions").mkdir(parents=True)
    assert is_lance_dir(str(lancey))
    assert is_lance_dir("/some/table.lance")
    assert not is_lance_dir(["/a.parquet"])  # non-str path lists


def test_graph_cache_insert_evicts_stale_same_session():
    """_cache_insert drops same-session entries for the same logical
    build (tag prefix up to the trailing :mtime) on input rewrite, and
    everything from dead sessions — but keeps unrelated live entries."""
    from chug_ray.ops import graph

    saved = dict(graph._DATASET_CACHE)
    try:
        graph._DATASET_CACHE.clear()
        job = "job-A"
        old = (job, "trade_edges:/d:64:(1.0, 2.0)")
        other = (job, "cosupplier_edges:/d:32:64:1.0")
        dead = ("job-old", "trade_edges:/d:64:(1.0, 2.0)")
        graph._DATASET_CACHE.update({old: "o", other: "c", dead: "d"})
        new = (job, "trade_edges:/d:64:(9.0, 9.0)")
        graph._cache_insert(new, "n")
        assert new in graph._DATASET_CACHE  # inserted
        assert old not in graph._DATASET_CACHE  # stale rewrite evicted
        assert dead not in graph._DATASET_CACHE  # dead session evicted
        assert other in graph._DATASET_CACHE  # unrelated build kept
    finally:
        graph._DATASET_CACHE.clear()
        graph._DATASET_CACHE.update(saved)


def test_embeddings_cache_evicts_rewritten_file(ray_session, tmp_path):
    """Rewriting embeddings.parquet within one session must not leave
    the old materialized entry pinned in the cache."""
    import shutil

    import pyarrow.parquet as pq

    from chug_ray.ops import knn

    src = "/root/testdata/sf0.001/embeddings.parquet"
    dst = tmp_path / "embeddings.parquet"
    shutil.copy(src, dst)
    saved = dict(knn._EMB_DS_CACHE)
    try:
        knn._EMB_DS_CACHE.clear()
        knn._read_embeddings(str(tmp_path))
        keys1 = [k for k in knn._EMB_DS_CACHE if k[1] == str(dst)]
        assert len(keys1) == 1
        # rewrite with a new mtime
        t = pq.read_table(str(dst))
        pq.write_table(t, str(dst))
        import os

        os.utime(dst, (os.path.getmtime(dst) + 10,) * 2)
        knn._read_embeddings(str(tmp_path))
        keys2 = [k for k in knn._EMB_DS_CACHE if k[1] == str(dst)]
        assert len(keys2) == 1  # old entry evicted, not accumulated
        assert keys1[0] != keys2[0]
    finally:
        knn._EMB_DS_CACHE.clear()
        knn._EMB_DS_CACHE.update(saved)
