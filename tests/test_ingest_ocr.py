"""OCR annotation ingest adapter: flat and nested two-level forms
(lines preferred), line-join semantics, malformed-json tolerance, and
end-to-end flow into the extraction pipeline."""

from __future__ import annotations

import json

import pyarrow as pa

from chug_ray.ingest import ingest_ocr_batch, ocr_anno_to_spans, ocr_page_lines


def test_flat_form():
    anno = {"pages": [{"text": ["l1", "l2"], "bbox": [[0, 0, 1, 1]] * 2}]}
    spans = ocr_anno_to_spans(anno)
    assert spans == [
        {"kind": "text", "text": "l1\nl2", "media_ref": "", "offset": 0}
    ]


def test_nested_form_prefers_lines():
    page = {
        "lines": {"text": ["line a", "line b"]},
        "words": {"text": ["line", "a", "line", "b"]},
    }
    assert ocr_page_lines(page) == ["line a", "line b"]
    # nested form beats a sibling flat 'text' key too (reference checks
    # 'lines' first)
    page["text"] = ["flat wins never"]
    assert ocr_page_lines(page) == ["line a", "line b"]


def test_words_only_fallback_and_empty():
    assert ocr_page_lines({"words": {"text": ["w1", "w2"]}}) == ["w1", "w2"]
    assert ocr_page_lines({}) == []
    # empty-text page stays an empty span at its offset
    spans = ocr_anno_to_spans({"pages": [{"text": []}, {"text": ["x"]}]})
    assert [s["text"] for s in spans] == ["", "x"]
    assert [s["offset"] for s in spans] == [0, 1]


def test_custom_line_break():
    anno = {"pages": [{"text": ["a", "b", "c"]}]}
    assert ocr_anno_to_spans(anno, line_break=" | ")[0]["text"] == "a | b | c"


def test_ingest_batch_and_pipeline(ray_session):
    from chug_ray.config import ExtractConfig
    from chug_ray.ingest import ingest_ocr_dataset
    from chug_ray.pipeline import build_extract_pipeline

    annos = [
        {"pages": [{"text": ["d0 p0"]}, {"lines": {"text": ["d0 p1 l0", "l1"]}}]},
        {"pages": [{"words": {"text": ["just", "words"]}}]},
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()),
            "anno_json": pa.array(
                [json.dumps(x) for x in annos] , pa.string()
            ),
        }
    )
    tbl = ingest_ocr_batch(batch)
    assert tbl.schema.names == ["doc_id", "spans", "span_pages"]

    # malformed json → doc retained with zero spans
    bad = pa.table(
        {
            "doc_id": pa.array(["z"], pa.string()),
            "anno_json": pa.array(["{not json"], pa.string()),
        }
    )
    assert ingest_ocr_batch(bad)["spans"].to_pylist() == [[]]

    # flows into the extraction pipeline unchanged
    import ray.data

    ds = ingest_ocr_dataset(ray.data.from_arrow(batch))
    out = build_extract_pipeline(ds, ExtractConfig()).take_all()
    by_id = {r["doc_id"]: r for r in out}
    texts_a = [s["text"] for s in by_id["a"]["spans"]]
    assert texts_a == ["d0 p0", "d0 p1 l0\nl1"]
    assert [s["text"] for s in by_id["b"]["spans"]] == ["just\nwords"]
