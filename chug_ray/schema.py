"""Arrow schemas for the engine's tables.

The document schema is fixed and declared (unlike the reference's
convention-based dynamic sample dicts, ``src/chug/common/types.py:94-117``
— multi-key fallbacks are resolved at ingest, not per row; SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

# --- F1: input documents (BASELINE.json input_hint, authoritative) -------
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPANS_TYPE = pa.list_(SPAN_STRUCT)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
        # per-span decode cost (media spans: payload page count; others: 1),
        # parallel to `spans`. Written at ingest so the classifier reads
        # cost from the batch itself — no driver-resident media-meta
        # broadcast. Legacy tables without this column fall back to
        # broadcast_media_meta (pipeline.py).
        ("span_pages", pa.list_(pa.int32())),
    ]
)

# --- F2: media payload store --------------------------------------------
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("payload", pa.large_binary()),
        ("kind", pa.string()),  # 'pdf' | 'image'
        ("n_pages", pa.int32()),  # ground truth page count (cost estimation)
    ]
)

# --- output ---------------------------------------------------------------
# `parse` mirrors the reference's gt_parse
# (/root/reference/src/chug/doc/doc_read_processor.py:141-145): total page
# count of the doc's primary media payload plus the sampled page indices.
PARSE_STRUCT = pa.struct(
    [
        ("num_pages", pa.int32()),
        ("page_indices", pa.list_(pa.int32())),
    ]
)
# `err` side channel (reference handler-registry analog, SURVEY.md §2.9).
ERR_STRUCT = pa.struct(
    [
        ("stage", pa.string()),
        ("error", pa.string()),
    ]
)
OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
        ("parse", PARSE_STRUCT),
        ("err", ERR_STRUCT),
    ]
)


def spans_to_tuples(spans) -> list[tuple]:
    """Canonical comparable form of a span list: (kind, text, media_ref, order).

    `order` is positional — the per-row invariant everywhere is
    span-sequence equality under (kind, text, media_ref, order).
    """
    if spans is None:
        return []
    return [
        (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(spans)
    ]
