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
