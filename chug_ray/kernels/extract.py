"""Per-span extraction kernels + the sequential whole-document extractor.

This module *is* the engine's extraction semantics. Given one input
document ``(doc_id, spans)`` (BASELINE.json input_hint schema) it
produces the ordered output span sequence compared everywhere under
``(kind, text, media_ref, order)`` equality.

Semantics per input span (processed in input ``offset`` order):

* ``text``  → emitted unchanged as one ``text`` span.
* ``html``  → the span's ``text`` holds HTML source; the boilerplate-strip
  kernel (:mod:`chug_ray.kernels.html`) emits one ``text`` span per kept
  main-content block, in document order.
* ``pdf``   → ``media_ref`` resolves to an SPDF payload; pages are
  selected by the configured ``page_sampling`` policy with the
  reference's valid-page semantics (:mod:`chug_ray.kernels.pages`,
  mirroring ``/root/reference/src/chug/doc/doc_read_processor.py:52-73``);
  each selected page emits one ``pdf_page`` span whose text is the
  page's lines joined with ``line_break``
  (``doc_read_processor.py:121``) and whose media_ref is
  ``{media_ref}#page={i}``.
* ``image`` → SIMG payload; same selection over frames (frame validity =
  non-empty line tuple); emits ``image_page`` spans with media_ref
  ``{media_ref}#frame={i}``.
* any other kind, an empty span list, or a media span without a
  ``media_ref`` → :class:`~chug_ray.errors.ExtractError` (the whole
  document fails, like a reference sample raising through its handler).

Randomness (``page_sampling='random'``) is keyed by
``(seed, doc_id, span_offset)`` so every media span samples
independently and identically at any parallelism level (SURVEY.md §2.4).

``parse`` mirrors the reference's gt_parse
(``doc_read_processor.py:141-145``): num_pages + sampled page indices of
the document's *first* media span (None for pure-text docs).

Output offsets are renumbered 0..n-1 — `order` in the invariant is
positional.
"""

from __future__ import annotations

import random
from collections.abc import Callable
from dataclasses import dataclass

from chug_ray.config import ExtractConfig
from chug_ray.errors import ExtractError
from chug_ray.kernels import html as html_kernel
from chug_ray.kernels import pages as pages_kernel
from chug_ray.kernels import simg, spdf
from chug_ray.kernels.text import join_lines
from chug_ray.util import rng_for

MEDIA_KINDS = frozenset({"pdf", "image"})
PassageLookup = Callable[[str], bytes]  # media_ref -> payload


@dataclass(frozen=True)
class MediaPlan:
    """Page-selection result for one media span (header-only for SPDF)."""

    num_pages: int
    page_indices: tuple[int, ...]


def sorted_spans(spans: list[dict]) -> list[dict]:
    if not spans:
        raise ExtractError("normalize", "empty span list")
    return sorted(spans, key=lambda s: s["offset"])


def extract_text_span(text: str) -> list[tuple[str, str, str]]:
    return [("text", text or "", "")]


def extract_html_span(source: str) -> list[tuple[str, str, str]]:
    try:
        blocks = html_kernel.extract_main_text(source or "")
    except Exception as e:  # tolerant parser should not throw, but be total
        raise ExtractError("html", f"html parse failed: {e}") from e
    return [("text", b, "") for b in blocks]


def plan_media_span(
    kind: str,
    media_ref: str,
    payload: bytes,
    policy: str,
    rng: random.Random,
) -> MediaPlan:
    """Select pages for a media span. For SPDF this reads only the header."""
    try:
        if kind == "pdf":
            header = spdf.read_header(payload)
            valid = header.valid_mask
        else:
            frames = simg.decode(payload)
            valid = tuple(len(f.lines) > 0 for f in frames)
    except (spdf.SpdfError, simg.SimgError) as e:
        raise ExtractError("decode", str(e)) from e
    try:
        indices = pages_kernel.select_pages(policy, valid, rng)
    except pages_kernel.NoValidPagesError as e:
        raise ExtractError("pages", str(e)) from e
    return MediaPlan(num_pages=len(valid), page_indices=tuple(indices))


def extract_media_pages(
    kind: str,
    media_ref: str,
    payload: bytes,
    page_indices: tuple[int, ...],
    line_break: str,
) -> list[tuple[str, str, str]]:
    """Decode the selected pages/frames into output spans."""
    out: list[tuple[str, str, str]] = []
    try:
        if kind == "pdf":
            header = spdf.read_header(payload)
            for i in page_indices:
                if header.n_lines[i] == 0:
                    # only reachable via policy='all'; mirrors the
                    # reference's per-page raise (doc_read_processor.py:118)
                    raise ExtractError("pages", "No text on page")
                lines = spdf.read_page(payload, header, i)
                out.append(("pdf_page", join_lines(lines, line_break), f"{media_ref}#page={i}"))
        else:
            frames = simg.decode(payload)
            for i in page_indices:
                if not frames[i].lines:
                    raise ExtractError("pages", "No text on page")
                out.append(
                    (
                        "image_page",
                        join_lines(list(frames[i].lines), line_break),
                        f"{media_ref}#frame={i}",
                    )
                )
    except (spdf.SpdfError, simg.SimgError) as e:
        raise ExtractError("decode", str(e)) from e
    return out


def media_rng(cfg: ExtractConfig, doc_id: str, span_offset: int) -> random.Random:
    return rng_for(cfg.seed, doc_id, span_offset)


def extract_doc(
    doc_id: str,
    spans: list[dict],
    lookup: PassageLookup,
    cfg: ExtractConfig,
) -> dict:
    """Sequential whole-document extraction → one OUT_SCHEMA row dict.

    This is both the pipeline's light-doc kernel and the test oracle's
    engine; the heavy (exploded) path must reproduce it exactly.
    """
    try:
        out_spans: list[tuple[str, str, str]] = []
        parse = None
        for span in sorted_spans(spans):
            kind = span["kind"]
            if kind == "text":
                out_spans.extend(extract_text_span(span["text"]))
            elif kind == "html":
                out_spans.extend(extract_html_span(span["text"]))
            elif kind in MEDIA_KINDS:
                ref = span["media_ref"]
                if not ref:
                    raise ExtractError("media", "missing media_ref")
                payload = lookup(ref)
                if payload is None:
                    raise ExtractError("media", f"media_ref not found: {ref}")
                rng = media_rng(cfg, doc_id, span["offset"])
                plan = plan_media_span(kind, ref, payload, cfg.page_sampling, rng)
                if parse is None:
                    parse = {
                        "num_pages": plan.num_pages,
                        "page_indices": list(plan.page_indices),
                    }
                out_spans.extend(
                    extract_media_pages(
                        kind, ref, payload, plan.page_indices, cfg.line_break
                    )
                )
            else:
                raise ExtractError("normalize", f"unknown span kind {kind!r}")
    except ExtractError as e:
        if cfg.error_policy == "raise":
            raise
        return {"doc_id": doc_id, "spans": [], "parse": None, "err": e.as_struct()}

    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(out_spans)
        ],
        "parse": parse,
        "err": None,
    }
