"""Ingest adapters: foreign annotation forms → the fixed DOC_SCHEMA.

The engine's span schema is declared (schema.py); the reference instead
accepts two OCR "pages" annotation forms at *processing* time and
resolves them per row (`/root/reference/src/chug/doc/
doc_read_processor.py:82-111`):

    {'pages': [{'text': [lines...], 'bbox': [...]}]}              # flat
    {'pages': [{'lines': {'text': [...]}, 'words': {...}}]}       # nested

with the ``lines`` level preferred when present. Our engine resolves
the same preference ONCE at ingest: each page becomes one ordered text
span whose text is the reference's ``line_break.join(lines)``
(`doc_read_processor.py:121``). Pages with no text stay as empty spans
— downstream policies (the valid-page scan analog) decide their fate,
matching the reference's "No text on page" skip.
"""

from __future__ import annotations

import json

import pyarrow as pa

from chug_ray.schema import DOC_SCHEMA


def ocr_page_lines(page) -> list[str]:
    """The text lines of one anno page, with the reference's preference
    order: ``lines`` level when present, else the flat ``text`` list,
    else the ``words`` level (our addition — the reference raises on a
    words-only page; at ingest salvaging word text is strictly better
    than dropping the page, and the deviation is visible here).

    Shape-lenient like the rest of ingest: a non-dict page (or non-dict
    lines/words level) yields no lines rather than crashing the batch —
    the no-row-thrown-away policy covers wrong-SHAPE JSON, not just
    unparsable JSON."""
    if not isinstance(page, dict):
        return []
    if isinstance(page.get("lines"), dict):
        return [str(t) for t in page["lines"].get("text") or []]
    if "text" in page:
        return [str(t) for t in page.get("text") or []]
    if isinstance(page.get("words"), dict):
        return [str(t) for t in page["words"].get("text") or []]
    return []


def ocr_anno_to_spans(anno: dict, line_break: str = "\n") -> list[dict]:
    """One OCR annotation dict → ordered text spans (one per page)."""
    spans = []
    for i, page in enumerate(anno.get("pages") or []):
        spans.append(
            {
                "kind": "text",
                "text": line_break.join(ocr_page_lines(page)),
                "media_ref": "",
                "offset": i,
            }
        )
    return spans


def ingest_ocr_batch(batch: pa.Table, line_break: str = "\n") -> pa.Table:
    """map_batches adapter: rows ``(doc_id, anno_json)`` → DOC_SCHEMA.

    Malformed JSON becomes a document with no spans (the error policy
    downstream records it; ingest never throws away the doc_id)."""
    rows = []
    for doc_id, raw in zip(
        batch["doc_id"].to_pylist(), batch["anno_json"].to_pylist()
    ):
        try:
            anno = json.loads(raw) if raw else {}
        except json.JSONDecodeError:
            anno = {}
        if not isinstance(anno, dict):
            anno = {}  # valid JSON, wrong shape (null/list/scalar)
        spans = ocr_anno_to_spans(anno, line_break)
        rows.append(
            {
                "doc_id": doc_id,
                "spans": spans,
                # OCR ingest produces text spans only: unit decode cost
                "span_pages": [1] * len(spans),
            }
        )
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def ingest_ocr_dataset(ds, line_break: str = "\n"):
    """Dataset of ``(doc_id, anno_json)`` → Dataset with DOC_SCHEMA,
    ready for ``build_extract_pipeline``."""
    return ds.map_batches(
        lambda b: ingest_ocr_batch(b, line_break), batch_format="pyarrow"
    )
