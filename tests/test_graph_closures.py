"""connected_components / bfs_hops: structural invariants and
dense-vs-sparse reduce-path equality (the pagerank forced-fallback
pattern). SQL-oracle parity itself is covered by the parametrized
tests/test_oracle_parity.py harness."""

from __future__ import annotations

import numpy as np
import pandas as pd

from chug_ray.ops import graph

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_cc_component_is_min_member(ray_session):
    df = graph.connected_components(SF01).to_pandas()
    assert len(df) > 0
    # the label of every component equals its minimum member id
    mins = df.groupby("component")["supp"].min()
    assert (mins.index.to_numpy() == mins.to_numpy()).all()
    # comp_size is consistent with the actual group sizes
    sizes = df.groupby("component")["supp"].size()
    got = df.drop_duplicates("component").set_index("component")["comp_size"]
    assert got.sort_index().equals(sizes.sort_index().astype(np.int64))
    # every node appears exactly once
    assert df["supp"].is_unique


def test_bfs_source_and_monotone_frontier(ray_session):
    df = graph.bfs_hops(SF01).to_pandas()
    assert len(df) > 0
    src = df.loc[df["hops"] == 0, "supp"]
    # exactly one source: the smallest node in the edge set
    assert len(src) == 1
    assert int(src.iloc[0]) == int(df["supp"].min())
    # hop levels are contiguous: a node at hop d implies some node at d-1
    hops = np.sort(df["hops"].unique())
    assert hops[0] == 0 and (np.diff(hops) == 1).all()


def test_bfs_dense_equals_sparse_reduce(ray_session):
    dense = _canon(graph.bfs_hops(SF01).to_pandas())
    sparse = _canon(
        graph.bfs_hops(SF01, dense_reduce_max_bytes=0).to_pandas()
    )
    pd.testing.assert_frame_equal(dense, sparse)


def test_bfs_hop_cap_returns_exact_prefix(ray_session):
    # eccentricity at sf0.01 is 2 (test above); a max_hops=1 cap must
    # return exactly the <=1-hop prefix of the uncapped result, not raise
    full = graph.bfs_hops(SF01).to_pandas()
    capped = graph.bfs_hops(SF01, max_hops=1).to_pandas()
    expect = full[full["hops"] <= 1]
    pd.testing.assert_frame_equal(
        _canon(capped), _canon(expect.reset_index(drop=True))
    )


def test_bfs_reaches_only_source_component(ray_session):
    cc = graph.connected_components(SF).to_pandas()
    bfs = graph.bfs_hops(SF).to_pandas()
    if len(cc) == 0:
        assert len(bfs) == 0
        return
    src = int(bfs.loc[bfs["hops"] == 0, "supp"].iloc[0])
    src_comp = int(cc.loc[cc["supp"] == src, "component"].iloc[0])
    expected = set(cc.loc[cc["component"] == src_comp, "supp"].tolist())
    assert set(bfs["supp"].tolist()) == expected
