"""Group-size telemetry: the bucketed ops must surface their largest
in-group row count so a skewed key at scale is visible before it OOMs
(the "no silent caps" rule)."""

from __future__ import annotations

import time

SF = "/root/testdata/sf0.001"


def test_bucketed_ops_report_group_sizes(ray_session):
    from chug_ray import telemetry
    from chug_ray.ops.dedup import minhash_lsh_pairs
    from chug_ray.ops.relational import asof_last_order
    from chug_ray.ops.window import sessionize

    # No telemetry.reset() here: reset clears the actor but not the
    # worker-process _LOCAL_MAX throttles, so a worker that saw a
    # bigger group for the same op in an earlier test would never
    # re-report and the assertion would be order-flaky. Reports from
    # either this run or an earlier same-session run equally prove the
    # ops surface their group sizes.
    sessionize(SF).materialize()
    asof_last_order(SF).materialize()
    minhash_lsh_pairs(SF).materialize()

    want = {
        "sessionize.local(user,chunk)",
        "sessionize.stitch(user)",
        "asof_last_order(key)",
        "minhash_lsh_pairs(band_hash)",
    }
    snap = {}
    for _ in range(20):  # worker reports are fire-and-forget; allow drain
        snap = telemetry.snapshot()
        if want <= set(snap):
            break
        time.sleep(0.25)
    assert want <= set(snap), f"missing telemetry: {want - set(snap)}"
    for op in want:
        assert snap[op]["max_group_rows"] >= 1
        assert snap[op]["key"] is not None


def test_oversize_group_logs_warning(ray_session, caplog):
    import logging

    from chug_ray import telemetry

    telemetry.reset()
    with caplog.at_level(logging.WARNING, logger="chug_ray.telemetry"):
        telemetry.record_group("demo_op", "hot-key", telemetry.WARN_ROWS + 1)
    assert any("demo_op" in r.message and "hot-key" in r.message
               for r in caplog.records)


def test_value_domain_cap_forces_loud_failure(ray_session, tmp_path, monkeypatch):
    """The broadcast-cum-table ops must refuse (not silently build a
    giant driver table) when the distinct value domain exceeds the cap,
    and must report the domain cardinality to telemetry."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from chug_ray import telemetry
    from chug_ray.ops import textstats

    n = 64
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en"] * n),
            "n_chars": pa.array(range(100, 100 + n), pa.int64()),  # all distinct
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    monkeypatch.setattr(textstats, "VALUE_DOMAIN_CAP", 10)
    with pytest.raises(ValueError, match="distinct .lang, n_chars. pairs"):
        textstats.percent_rank_in_lang(str(tmp_path))
    with pytest.raises((ValueError, Exception)) as ei:
        textstats.chars_quantiles(str(tmp_path)).take_all()
    assert "distinct n_chars values" in str(ei.value)

    snap = {}
    for _ in range(20):  # reports are fire-and-forget; allow drain
        snap = telemetry.snapshot()
        if "percent_rank_in_lang(domain)" in snap:
            break
        time.sleep(0.25)
    assert "percent_rank_in_lang(domain)" in snap
    assert snap["percent_rank_in_lang(domain)"]["max_group_rows"] >= n
