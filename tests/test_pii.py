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


def test_dsir_select_favors_target_lang(ray_session):
    """Top-ranked docs must skew toward the target language — the
    whole point of importance resampling."""
    import pandas as pd

    from chug_ray.ops.textstats import dsir_select

    sf = "/root/testdata/sf0.001"
    out = dsir_select(sf, target_lang="en", k=50).to_pandas()
    assert len(out) == 50
    assert out["rank"].tolist() == list(range(1, 51))
    langs = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    )
    j = out.merge(langs, on="doc_id")
    frac_en_selected = (j["lang"] == "en").mean()
    frac_en_corpus = (langs["lang"] == "en").mean()
    assert frac_en_selected > frac_en_corpus


def test_semdedup_planted_duplicates(ray_session, tmp_path):
    """Exact duplicate vectors must always collapse to one survivor,
    whatever cluster they land in (cos=1 > any threshold)."""
    import numpy as np
    import pandas as pd

    from chug_ray.ops.dedup import semdedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 16))
    # vec_ids 100..104 are exact copies of vec_id 100's vector
    base[1:5] = base[0]
    pd.DataFrame(
        {
            "vec_id": np.arange(100, 160, dtype=np.int64),
            "embedding": list(base.astype(np.float32)),
            "label": ["x"] * 60,
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    out = semdedup(str(tmp_path), threshold=0.95).to_pandas()
    dup = out[out.vec_id.between(100, 104)]
    assert int(dup.keep.sum()) == 1
    assert dup[dup.keep == 1].vec_id.iloc[0] == 100
    assert (dup.rep_id == 100).all()


def test_semdedup_deterministic_and_closed(ray_session):
    """Same output under different scan batch sizes; reps of dropped
    rows are themselves survivors; survivors are component minima."""
    import pandas as pd

    from chug_ray.ops.dedup import semdedup

    sf = "/root/testdata/sf0.001"
    a = (
        semdedup(sf, threshold=0.3)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    b = (
        semdedup(sf, threshold=0.3, tile=7)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    reps = set(a[a.keep == 1].vec_id)
    assert a[a.keep == 0].rep_id.isin(reps).all()
    assert (a[a.keep == 1].rep_id == a[a.keep == 1].vec_id).all()
    assert (a.groupby("rep_id")["vec_id"].min() >= a.groupby("rep_id")["rep_id"].first()).all()
