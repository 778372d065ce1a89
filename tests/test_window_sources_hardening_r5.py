"""Pins for the closing-day window/sources/selection review fixes."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _empty_events(tmp_path):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_hopping_window_rejects_non_multiple():
    from chug_ray.ops.window import hopping_window

    with pytest.raises(ValueError, match="multiple"):
        hopping_window("/nonexistent", size_minutes=45, hop_minutes=30)
    with pytest.raises(ValueError, match="multiple"):
        hopping_window("/nonexistent", size_minutes=60, hop_minutes=90)


def test_value_histogram_empty_events(ray_session, tmp_path):
    from chug_ray.ops.window import value_histogram

    ds = value_histogram(_empty_events(tmp_path))
    assert ds.count() == 0
    assert ds.schema().names == ["bin", "lo_edge", "n", "sum_cents"]


def test_hourly_anomalies_empty_events(ray_session, tmp_path):
    from chug_ray.ops.window import hourly_anomalies

    out = hourly_anomalies(_empty_events(tmp_path))
    assert len(out) == 0


def test_stratified_sample_empty_rates_means_no_overrides(
    ray_session,
):
    from chug_ray.ops.sources import stratified_sample

    n_default_overrides = stratified_sample(
        "/root/testdata/sf0.001"
    ).count()
    n_no_overrides = stratified_sample(
        "/root/testdata/sf0.001", rates={}
    ).count()
    # empty dict = decile 1 for every lang, NOT the en/fr defaults
    assert n_no_overrides < n_default_overrides


def test_flatten_props_lenient_on_non_coercible(ray_session, tmp_path):
    from chug_ray.ops.sources import flatten_props

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(
                    np.array(["2024-01-01T00:00:00"] * 4, "datetime64[us]")
                ),
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_type": pa.array(["view"] * 4),
                "value": pa.array([0.0] * 4),
                "props": pa.array(
                    ['{"k": 7}', '{"k": "abc"}', "5", '{"k": null}']
                ),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = (
        flatten_props(str(tmp_path))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert out["k"].tolist() == [7, -1, -1, -1]


def test_export_recovers_from_leftover_tmp_manifest(ray_session, tmp_path):
    """A crash between writing _MANIFEST.json.tmp and os.replace must
    not wedge every later export behind 'refusing to overwrite'."""
    from chug_ray.ops.selection import export_range_partitioned

    out_dir = str(tmp_path / "tiles")
    export_range_partitioned("/root/testdata/sf0.001", out_dir)
    # simulate the crash residue: manifest gone, tmp left behind
    os.rename(
        os.path.join(out_dir, "_MANIFEST.json"),
        os.path.join(out_dir, "_MANIFEST.json.tmp"),
    )
    m = export_range_partitioned("/root/testdata/sf0.001", out_dir)
    assert m["complete"]
    assert os.path.exists(os.path.join(out_dir, "_MANIFEST.json"))
