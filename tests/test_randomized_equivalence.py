"""Randomized (fixed-seed) equivalence: the distributed window/join ops
must match a straightforward pure-pandas reference on arbitrary event
logs — duplicate timestamps, bursts, singleton users, empty overlaps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _random_events(seed: int, n: int, n_users: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 90 * 86_400_000_000, size=n).astype(
        "timedelta64[us]"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["click", "view", "purchase", "signup", "error"], size=n
            ),
            "value": rng.normal(0, 5, size=n),
            "props": ["{}"] * n,
        }
    )


def _write_events(tmp_path, df: pd.DataFrame) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize("seed,n,n_users", [(0, 800, 7), (1, 500, 500),
                                            (2, 300, 1)])
def test_rolling_sum_matches_pandas(ray_session, tmp_path, seed, n, n_users):
    from chug_ray.ops.window import rolling_user_sum

    df = _random_events(seed, n, n_users)
    sf = _write_events(tmp_path, df)
    got = (
        rolling_user_sum(sf, k=3)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    ref = df.assign(
        value_e4=(np.sign(df["value"])
                  * np.floor(np.abs(df["value"]) * 1e4 + 0.5)).astype(np.int64)
    ).sort_values(["user_id", "ts", "event_id"])
    ref["rolling_e4"] = (
        ref.groupby("user_id")["value_e4"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
        .astype(np.int64)
    )
    ref = ref.sort_values("event_id", ignore_index=True)
    assert got["rolling_e4"].tolist() == ref["rolling_e4"].tolist()


@pytest.mark.parametrize("seed,n_orders", [(3, 60), (4, 200)])
def test_interval_join_matches_pandas(ray_session, tmp_path, seed, n_orders):
    from chug_ray.ops.relational import events_after_order

    rng = np.random.default_rng(seed)
    ev = _random_events(seed + 100, 600, 40)
    _write_events(tmp_path, ev)
    base = np.datetime64("2023-12-15", "us")
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, 50, size=n_orders).astype(np.int64),
            "o_orderstatus": ["O"] * n_orders,
            "o_totalprice": [1.0] * n_orders,
            "o_orderdate": base
            + rng.integers(0, 120 * 86_400_000_000, size=n_orders).astype(
                "timedelta64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n_orders,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    got = (
        events_after_order(str(tmp_path), days=7)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    v_e4 = (np.sign(ev["value"])
            * np.floor(np.abs(ev["value"]) * 1e4 + 0.5)).astype(np.int64)
    week = np.timedelta64(7 * 86_400_000_000, "us")
    exp_n, exp_s = [], []
    for _, o in orders.iterrows():
        m = (
            (ev["user_id"] == o.o_custkey)
            & (ev["ts"] >= o.o_orderdate)
            & (ev["ts"] < o.o_orderdate + week)
        )
        exp_n.append(int(m.sum()))
        exp_s.append(int(v_e4[m].sum()))
    assert got["n_events_7d"].tolist() == exp_n
    assert got["sum_value_e4"].tolist() == exp_s
