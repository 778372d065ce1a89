"""PII redaction kernel + mixture sampling semantics."""

from __future__ import annotations

import pyarrow as pa

from chug_ray.ops.pii import redact_batch


def test_redact_batch_kinds_and_order():
    text = pa.array(
        [
            "write a.b+c@ex-ample.co.uk and x@y.io today",
            "server 192.168.0.1 then call 555-0199",
            "no pii here",
            "",
        ]
    )
    out = redact_batch(text)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 1, 0, 0]
    assert out["n_phones"].to_pylist() == [0, 1, 0, 0]
    assert out["redacted"].to_pylist() == [
        "write [EMAIL] and [EMAIL] today",
        "server [IP] then call [PHONE]",
        "no pii here",
        "",
    ]


def test_redact_pattern_order():
    # an IP-shaped mail host is NOT an email (the TLD must be alpha),
    # so it falls through to the IP pass; an alpha-TLD domain is
    # consumed whole by the email pass before the IP pattern runs
    out = redact_batch(pa.array(["u@10.0.0.1 vs bare 10.0.0.1"]))
    assert out["n_emails"].to_pylist() == [0]
    assert out["n_ips"].to_pylist() == [2]
    assert out["redacted"].to_pylist() == ["u@[IP] vs bare [IP]"]
    out = redact_batch(pa.array(["u@host10.0.example.com stays one"]))
    assert out["n_emails"].to_pylist() == [1]
    assert out["n_ips"].to_pylist() == [0]


def test_temperature_mixture_monotone_in_strength(ray_session):
    from chug_ray.ops.sources import temperature_mixture

    sf = "/root/testdata/sf0.001"
    weak = set(
        temperature_mixture(sf, strength=1.0).to_pandas()["doc_id"]
    )
    strong = set(
        temperature_mixture(sf, strength=4.0).to_pandas()["doc_id"]
    )
    assert weak < strong
    # alpha=1 and strength>=1 keeps every document (p = min(1, s))
    full = temperature_mixture(sf, alpha=1.0, strength=1.0).to_pandas()
    assert len(full) == 500


def test_temperature_mixture_flattens_sources(ray_session, tmp_path):
    """After mixing, head sources must shrink proportionally more than
    tail sources (that is the point of temperature flattening). The
    shared testdata is uniform across sources, so this test synthesizes
    a skewed corpus: one 6400-doc head source vs 25-doc tail sources."""
    import pandas as pd

    from chug_ray.ops.sources import temperature_mixture

    rows = []
    did = 0
    for src, n in (("head", 6400), ("tail_a", 25), ("tail_b", 25)):
        for _ in range(n):
            rows.append({"doc_id": did, "source": src})
            did += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")

    out = temperature_mixture(str(tmp_path), alpha=0.5, strength=2.0)
    after = out.to_pandas()["source"].value_counts()
    # p(head) = min(1, 2/80) = 0.025, p(tail) = min(1, 2/5) = 0.4:
    # the tail keep-RATE must far exceed the head's
    head_rate = after.get("head", 0) / 6400
    tail_rate = (after.get("tail_a", 0) + after.get("tail_b", 0)) / 50
    assert head_rate < 0.08
    assert tail_rate > 0.2
    # and absolute counts end up comparable (flattening)
    assert after.get("head", 0) < 10 * (
        after.get("tail_a", 0) + after.get("tail_b", 0)
    )
