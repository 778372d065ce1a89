"""Sequential extractor semantics: per-span kernels, error policy,
determinism (SURVEY.md §5.2.3)."""

import pytest

from chug_ray.config import ExtractConfig
from chug_ray.errors import ExtractError
from chug_ray.kernels import spdf, simg
from chug_ray.kernels.extract import extract_doc, media_rng, plan_media_span


def _span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


CFG = ExtractConfig(page_sampling="all_valid", seed=7)


def test_text_identity():
    out = extract_doc("d1", [_span("text", "hello world", offset=0)], {}.get, CFG)
    assert out["err"] is None
    assert out["spans"] == [
        {"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}
    ]
    assert out["parse"] is None


def test_spans_processed_in_offset_order_and_renumbered():
    spans = [
        _span("text", "second", offset=10),
        _span("text", "first", offset=3),
    ]
    out = extract_doc("d1", spans, {}.get, CFG)
    assert [s["text"] for s in out["spans"]] == ["first", "second"]
    assert [s["offset"] for s in out["spans"]] == [0, 1]


def test_pdf_page_spans_and_parse():
    payload = spdf.encode([["l1", "l2"], ["l3"]])
    lookup = {"m0": payload}.get
    out = extract_doc("d1", [_span("pdf", media_ref="m0")], lookup, CFG)
    assert out["err"] is None
    assert out["parse"] == {"num_pages": 2, "page_indices": [0, 1]}
    assert out["spans"] == [
        {"kind": "pdf_page", "text": "l1\nl2", "media_ref": "m0#page=0", "offset": 0},
        {"kind": "pdf_page", "text": "l3", "media_ref": "m0#page=1", "offset": 1},
    ]


def test_image_frame_spans():
    payload = simg.encode(
        [simg.Frame(8, 8, 1, ("a", "b")), simg.Frame(8, 8, 2, ())]
    )
    out = extract_doc("d1", [_span("image", media_ref="m0")], {"m0": payload}.get, CFG)
    assert out["err"] is None
    # second frame has no lines → invalid; all_valid wraps back to frame 0
    assert [s["media_ref"] for s in out["spans"]] == ["m0#frame=0", "m0#frame=0"]
    assert out["spans"][0]["text"] == "a\nb"


def test_html_blocks_become_text_spans():
    html = "<body><p>main content paragraph with words</p><nav><a href='/'>x</a></nav></body>"
    out = extract_doc("d1", [_span("html", html)], {}.get, CFG)
    assert [s["kind"] for s in out["spans"]] == ["text"]


def test_mixed_interleaving_order():
    payload = spdf.encode([["pline"]])
    spans = [
        _span("text", "t0", offset=0),
        _span("pdf", media_ref="m0", offset=5),
        _span("text", "t1", offset=9),
    ]
    out = extract_doc("d1", spans, {"m0": payload}.get, CFG)
    assert [(s["kind"], s["text"]) for s in out["spans"]] == [
        ("text", "t0"),
        ("pdf_page", "pline"),
        ("text", "t1"),
    ]


def test_empty_span_list_errors():
    out = extract_doc("d1", [], {}.get, CFG)
    assert out["err"]["stage"] == "normalize"
    assert out["spans"] == []


def test_unknown_kind_errors():
    out = extract_doc("d1", [_span("wat", "x")], {}.get, CFG)
    assert out["err"]["stage"] == "normalize"


def test_missing_media_ref_errors():
    out = extract_doc("d1", [_span("pdf", media_ref="")], {}.get, CFG)
    assert out["err"]["stage"] == "media"


def test_unresolvable_media_ref_errors():
    out = extract_doc("d1", [_span("pdf", media_ref="nope")], {}.get, CFG)
    assert out["err"]["stage"] == "media"


def test_corrupt_payload_errors():
    out = extract_doc(
        "d1", [_span("pdf", media_ref="m0")], {"m0": b"XPDFgarbage"}.get, CFG
    )
    assert out["err"]["stage"] == "decode"


def test_all_empty_pages_errors():
    payload = spdf.encode([[], []])
    out = extract_doc("d1", [_span("pdf", media_ref="m0")], {"m0": payload}.get, CFG)
    assert out["err"]["stage"] == "pages"


def test_policy_all_raises_on_empty_page():
    cfg = ExtractConfig(page_sampling="all", seed=7)
    payload = spdf.encode([["x"], []])
    out = extract_doc("d1", [_span("pdf", media_ref="m0")], {"m0": payload}.get, cfg)
    assert out["err"]["stage"] == "pages"


def test_error_policy_raise():
    cfg = ExtractConfig(error_policy="raise")
    with pytest.raises(ExtractError):
        extract_doc("d1", [], {}.get, cfg)


def test_first_error_wins():
    # sequential semantics: the first failing span (in offset order)
    # defines the doc's error
    spans = [
        _span("pdf", media_ref="", offset=2),  # media error
        _span("wat", offset=7),  # normalize error (later)
    ]
    out = extract_doc("d1", spans, {}.get, CFG)
    assert out["err"]["stage"] == "media"


def test_random_sampling_deterministic_per_doc_and_offset():
    cfg = ExtractConfig(page_sampling="random", seed=11)
    payload = spdf.encode([[f"l{i}"] for i in range(10)])
    lookup = {"m0": payload}.get
    a = extract_doc("docA", [_span("pdf", media_ref="m0", offset=3)], lookup, cfg)
    b = extract_doc("docA", [_span("pdf", media_ref="m0", offset=3)], lookup, cfg)
    assert a == b
    c = extract_doc("docB", [_span("pdf", media_ref="m0", offset=3)], lookup, cfg)
    assert isinstance(c["parse"]["page_indices"][0], int)
    # different seed → (very likely) different draw; at minimum still valid
    cfg2 = ExtractConfig(page_sampling="random", seed=12)
    d = extract_doc("docA", [_span("pdf", media_ref="m0", offset=3)], lookup, cfg2)
    assert len(d["spans"]) == 1


def test_plan_media_is_header_only_for_spdf():
    # a payload with a valid header but truncated body still *plans* fine
    payload = spdf.encode([["abc"], ["def"]])
    truncated = payload[:-2]
    rng = media_rng(CFG, "d1", 0)
    plan = plan_media_span("pdf", "m0", truncated, "all_valid", rng)
    assert plan.num_pages == 2
