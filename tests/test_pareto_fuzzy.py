"""Edge semantics for the skyline and the deletion-neighborhood fuzzy
join: tie handling, duplicated-variant dedup, and the domain cap."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _parts(tmp_path, names=None, prices=None, sizes=None):
    n = len(prices) if prices else len(names)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n), pa.int64()),
                "p_name": pa.array(names or ["p"] * n, pa.string()),
                "p_brand": pa.array(["B"] * n),
                "p_type": pa.array(["T"] * n),
                "p_size": pa.array(sizes or [1] * n, pa.int32()),
                "p_retailprice": pa.array(prices or [1.0] * n),
            }
        ),
        str(tmp_path / "part.parquet"),
    )


def test_pareto_equal_points_survive_together(ray_session, tmp_path):
    """Two parts with identical (price, size) don't dominate each other:
    both stay on the frontier; a strictly dominated part drops."""
    from chug_ray.ops.selection import pareto_frontier

    _parts(
        tmp_path,
        prices=[5.0, 5.0, 6.0, 4.0],
        sizes=[10, 10, 9, 2],
    )
    out = pareto_frontier(str(tmp_path)).to_pandas()
    # part 2 dominated (pricier, smaller); part 3 survives (cheapest);
    # parts 0+1 tie on the frontier
    assert sorted(out["p_partkey"].tolist()) == [0, 1, 3]


def test_pareto_price_domain_cap(ray_session, tmp_path):
    from chug_ray.ops.selection import pareto_frontier

    _parts(tmp_path, prices=[float(i) for i in range(50)], sizes=[1] * 50)
    with pytest.raises(ValueError, match="distinct price domain"):
        pareto_frontier(str(tmp_path), max_prices=10)


def test_fuzzy_pairs_planted_typos(ray_session, tmp_path):
    """Substitution, insertion, and duplicated-char insertion (which
    meets in TWO variant buckets) each yield exactly one pair; names at
    distance 2 and identical names yield none."""
    from chug_ray.ops.dedup import fuzzy_name_pairs

    _parts(
        tmp_path,
        names=[
            "widget",   # 0
            "wadget",   # substitution of 0
            "widgets",  # insertion on 0
            "wiidget",  # duplicated-char insertion on 0 (two buckets!)
            "widget",   # identical to 0 → multiplicity, not a pair
            "gizmo",    # far away from everything
        ],
        prices=[1.0] * 6,
        sizes=[1] * 6,
    )
    out = (
        fuzzy_name_pairs(str(tmp_path))
        .to_pandas()
        .sort_values(["name_a", "name_b"], ignore_index=True)
    )
    pairs = set(zip(out["name_a"], out["name_b"]))
    assert ("wadget", "widget") in pairs
    assert ("widget", "widgets") in pairs
    assert ("widget", "wiidget") in pairs
    # wiidget↔widget appears ONCE despite meeting in two buckets
    assert len(out) == len(pairs)
    assert ("gizmo", "widget") not in pairs
    # multiplicity of the duplicated name rides along
    w = out[(out["name_a"] == "wadget") & (out["name_b"] == "widget")]
    assert w["n_b"].tolist() == [2]
