"""Page-selection semantics, mirroring the reference decoders exactly.

Reference behaviors reproduced bit-for-bit (validated by unit tests +
the pure-Python oracle):

* valid-page wraparound scan with ≤10 retries —
  ``/root/reference/src/chug/doc/doc_processor.py:18-45``. Validity is
  "the page's line list is non-empty"; a page whose only line is the
  empty string is still *valid*.
* sampling policies ``random | first | all_valid | all`` —
  ``/root/reference/src/chug/doc/doc_read_processor.py:52-73``, including
  its quirks: ``all_valid`` runs the scan ``num_pages`` times and may
  revisit (duplicate) valid pages when invalid pages cause wraparound;
  a RuntimeError mid-scan keeps the partial index list; ``random`` draws
  its starting point from ``randrange(-1, num_pages - 1)``.
* ``DecodeDoc`` variants ``first=[0] / last=[-1] / random`` with negative
  indices taken mod num_pages —
  ``/root/reference/src/chug/wds/decode.py:64-67,224-233``.

The one deliberate change vs. the reference (SURVEY.md §2.4 T3): the RNG
is supplied by the caller keyed by ``(job_seed, doc_id)`` rather than a
shared order-dependent per-worker generator, so results are invariant to
parallelism and resume.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

VALID_POLICIES = ("random", "first", "all_valid", "all")


class PageScanError(RuntimeError):
    """No non-empty page found within the retry budget."""


class NoValidPagesError(RuntimeError):
    """No valid annotated pages selected for this document."""


def get_next_valid_page_index(
    current_index: int,
    num_pages: int,
    valid_mask: Sequence[bool],
    retries: int = 10,
) -> int:
    for _ in range(retries):
        current_index = (current_index + 1) % num_pages
        if valid_mask[current_index]:
            return current_index
    raise PageScanError(f"No non-empty page found after {retries} attempts")


def select_pages(
    policy: str,
    valid_mask: Sequence[bool],
    rng: random.Random,
) -> list[int]:
    """Select page indices per the reference's ``_process_anno_pages``."""
    if policy not in VALID_POLICIES:
        raise ValueError(f"unknown page_sampling policy {policy!r}")
    num_pages = len(valid_mask)
    if not num_pages:
        raise NoValidPagesError("Empty annotation")

    page_indices: list[int] = []
    try:
        if policy == "random":
            current_index = rng.randrange(-1, num_pages - 1)
            current_index = get_next_valid_page_index(
                current_index, num_pages, valid_mask
            )
            page_indices.append(current_index)
        elif policy == "first":
            page_indices.append(
                get_next_valid_page_index(-1, num_pages, valid_mask)
            )
        elif policy == "all_valid":
            current_index = -1
            for _ in range(num_pages):
                current_index = get_next_valid_page_index(
                    current_index, num_pages, valid_mask
                )
                page_indices.append(current_index)
        elif policy == "all":
            page_indices = list(range(num_pages))
    except PageScanError:
        pass  # partial list kept — reference catches RuntimeError the same way

    if not page_indices:
        raise NoValidPagesError("No valid annotated pages")
    return page_indices


def select_pages_decodedoc(
    policy: str, num_pages: int, rng: random.Random
) -> list[int]:
    """``DecodeDoc`` selection: first/last/random over raw page indices."""
    if num_pages <= 0:
        raise NoValidPagesError("document has no pages")
    if policy == "first":
        indices = [0]
    elif policy == "last":
        indices = [-1]
    elif policy == "random":
        indices = [rng.choice(range(num_pages))]
    else:
        raise ValueError(f"unknown DecodeDoc page_sampling {policy!r}")
    return [p % num_pages for p in indices]  # -ve indexing mod, decode.py:65
