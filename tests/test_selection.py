"""Unit tests for the distributed exact order-statistics operator
(chug_ray/ops/selection.py). decile_bucket's NTILE parity vs DuckDB is
covered by test_oracle_parity.py; here we pin select_ranks against
numpy sorting under forced multi-pass refinement and degenerate
distributions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from chug_ray.ops.selection import ntile_cutoff_ranks, select_ranks


def _make_ds_factory(values: np.ndarray):
    import ray.data

    tbl = pa.table({"z": pa.array(values.astype(np.int64))})

    def make_ds():
        # split into several blocks so histogram partials actually merge
        return ray.data.from_arrow(tbl).repartition(4)

    return make_ds


@pytest.mark.parametrize(
    "values",
    [
        np.random.default_rng(0).integers(-(10**17), 10**17, size=5000),
        np.random.default_rng(1).integers(0, 50, size=3000),  # heavy dups
        np.full(1000, 42),  # single value
        np.arange(100),  # tiny, dense
    ],
    ids=["wide-int64", "heavy-dups", "all-equal", "dense"],
)
def test_select_ranks_matches_numpy(ray_session, values):
    ranks = [0, 1, len(values) // 3, len(values) // 2, len(values) - 1]
    got = select_ranks(
        _make_ds_factory(values), ranks, num_hist_buckets=16, cap=32
    )
    expected = np.sort(values)[ranks]
    assert got == [int(v) for v in expected]


def test_select_ranks_forced_multipass(ray_session):
    """Tiny histogram + tiny cap forces several refinement passes over
    a clustered distribution (all mass in a narrow sliver of int64)."""
    rng = np.random.default_rng(7)
    values = (10**15 + rng.integers(0, 1000, size=4000)).astype(np.int64)
    ranks = [0, 1999, 3999]
    got = select_ranks(
        _make_ds_factory(values), ranks, num_hist_buckets=4, cap=8
    )
    assert got == [int(v) for v in np.sort(values)[ranks]]


def test_select_ranks_rank_out_of_range(ray_session):
    with pytest.raises(ValueError):
        select_ranks(
            _make_ds_factory(np.arange(10)), [10], num_hist_buckets=4, cap=4
        )


def test_ntile_cutoff_ranks():
    # n=10, tiles=4 → sizes 3,3,2,2 → last ranks 2,5,7
    assert ntile_cutoff_ranks(10, 4) == [2, 5, 7]
    # n < tiles: singleton tiles then repeats
    assert ntile_cutoff_ranks(3, 5) == [0, 1, 2, 2]
    # exact division
    assert ntile_cutoff_ranks(20, 4) == [4, 9, 14]


def test_decile_bucket_small_corpus(ray_session, tmp_path):
    """Direct NTILE check on a corpus smaller than the tile count and
    with heavy n_chars ties (doc_id tiebreak drives assignment)."""
    import pyarrow.parquet as pq

    from chug_ray.ops.selection import decile_bucket

    tbl = pa.table(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "n_chars": pa.array([5, 5, 5, 5, 1, 1, 9], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        decile_bucket(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # order by (n_chars, doc_id): 4,5,0,1,2,3,6 → tiles 1..7 of 10
    expect = {4: 1, 5: 2, 0: 3, 1: 4, 2: 5, 3: 6, 6: 7}
    assert dict(zip(out.doc_id, out.decile)) == expect


def test_export_range_partitioned_resume(ray_session, tmp_path):
    """The range-partitioned sink writes one hive dir per tile, the
    manifest makes identical re-runs a checkpoint hit, and a changed
    input invalidates + rebuilds."""
    import json
    import os

    import pyarrow.parquet as pq

    from chug_ray.ops.selection import export_range_partitioned

    tbl = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(40)]),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["s"] * 40),
            "n_chars": pa.array([i % 11 for i in range(40)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out_dir = str(tmp_path / "export")

    m1 = export_range_partitioned(str(tmp_path), out_dir, tiles=4)
    assert m1["complete"] and m1["n_docs"] == 40
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("tile="))
    assert dirs == ["tile=1", "tile=2", "tile=3", "tile=4"]
    # every tile dir holds exactly 10 rows (40 / 4)
    back = pq.read_table(out_dir)
    assert back.num_rows == 40
    tiles = back["tile"].to_pylist()
    assert all(tiles.count(str(t)) == 10 or tiles.count(t) == 10
               for t in (1, 2, 3, 4))

    # checkpoint hit: manifest mtime unchanged, same dict returned
    mtime = os.path.getmtime(os.path.join(out_dir, "_MANIFEST.json"))
    m2 = export_range_partitioned(str(tmp_path), out_dir, tiles=4)
    assert m2 == m1
    assert os.path.getmtime(os.path.join(out_dir, "_MANIFEST.json")) == mtime

    # input change (one more row) invalidates and rebuilds
    tbl2 = pa.table(
        {
            "doc_id": pa.array(range(41), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(41)]),
            "lang": pa.array(["en"] * 41),
            "source": pa.array(["s"] * 41),
            "n_chars": pa.array([i % 11 for i in range(41)], pa.int64()),
        }
    )
    pq.write_table(tbl2, str(tmp_path / "documents.parquet"))
    m3 = export_range_partitioned(str(tmp_path), out_dir, tiles=4)
    assert m3["n_docs"] == 41
    assert pq.read_table(out_dir).num_rows == 41


def test_export_refuses_unrelated_out_dir(ray_session, tmp_path):
    """A manifest-less out_dir holding non-export files must be
    refused, not silently rmtree'd."""
    import os

    import pyarrow.parquet as pq
    import pytest

    from chug_ray.ops.selection import export_range_partitioned

    tbl = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(8)]),
            "lang": pa.array(["en"] * 8),
            "source": pa.array(["s"] * 8),
            "n_chars": pa.array([i for i in range(8)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out_dir = str(tmp_path / "precious")
    os.makedirs(out_dir)
    with open(os.path.join(out_dir, "notes.txt"), "w") as f:
        f.write("user data")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        export_range_partitioned(str(tmp_path), out_dir, tiles=2)
    assert os.path.exists(os.path.join(out_dir, "notes.txt"))

    # crashed-export shape (tile=* dirs, no manifest) still rebuilds
    out2 = str(tmp_path / "crashed")
    os.makedirs(os.path.join(out2, "tile=1"))
    m = export_range_partitioned(str(tmp_path), out2, tiles=2)
    assert m["complete"] and m["n_docs"] == 8
