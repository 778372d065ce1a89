"""SPDF — a deterministic, self-describing synthetic "PDF" container.

Real pypdfium2/fitz are unavailable in this sandbox; the reference's PDF
*decode semantics* — page count, page indexing (negative mod,
``/root/reference/src/chug/wds/decode.py:64-67``), per-page line lists,
validity = non-empty line list (``doc_processor.py:43``) — are what the
engine conformance-tests (SURVEY.md §5, FIXTURES.md F2). SPDF gives those
semantics a precise, adversarially-fuzzable byte format that a
from-scratch pure-Python parser can target.

Layout (little-endian):

    magic  b"SPDF" | version u8 (=2) | n_pages u32
    index:  n_pages × (offset u32, n_lines u16)       # offset from body start
    body:   per page: n_lines × (len u16, utf8 bytes)

The index header enables two things that matter at 100 TB scale:

* **cost estimation without reading the body** — ``read_header`` touches
  only ``8 + 6*n_pages`` bytes, so the explode/skew planner can count and
  select pages from a ranged header read;
* **per-page random access** — a page-level decode task seeks straight to
  its page, so a 1000-page skew monster parallelizes page-wise.

Page *validity* (for the valid-page wraparound scan,
``doc_processor.py:18-45``) is ``n_lines > 0``, mirroring the reference's
check on the annotation line list — note a page holding a single *empty
string* line is still "valid" there (non-empty list) even though its
joined text is ``''``; we reproduce that exactly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MAGIC = b"SPDF"
VERSION = 2

_HDR = struct.Struct("<4sBI")  # magic, version, n_pages
_IDX = struct.Struct("<IH")  # body offset, n_lines
_LEN = struct.Struct("<H")


class SpdfError(ValueError):
    """Malformed SPDF payload (bad magic / truncation / bad counts)."""


def encode(pages: list[list[str]]) -> bytes:
    """Encode a list of pages (each a list of line strings)."""
    body = bytearray()
    index = bytearray()
    for lines in pages:
        index += _IDX.pack(len(body), len(lines))
        for line in lines:
            raw = line.encode("utf-8")
            if len(raw) > 0xFFFF:
                raise SpdfError("line too long for SPDF")
            body += _LEN.pack(len(raw)) + raw
    return _HDR.pack(MAGIC, VERSION, len(pages)) + bytes(index) + bytes(body)


@dataclass(frozen=True)
class SpdfHeader:
    n_pages: int
    offsets: tuple[int, ...]  # body-relative per-page offsets
    n_lines: tuple[int, ...]  # per-page line counts (validity = n>0)
    body_start: int  # absolute offset of body in the payload

    @property
    def valid_mask(self) -> tuple[bool, ...]:
        return tuple(n > 0 for n in self.n_lines)


def read_header(data: bytes) -> SpdfHeader:
    if len(data) < _HDR.size:
        raise SpdfError("SPDF: truncated header")
    magic, version, n_pages = _HDR.unpack_from(data, 0)
    if magic != MAGIC:
        raise SpdfError(f"SPDF: bad magic {magic!r}")
    if version != VERSION:
        raise SpdfError(f"SPDF: unsupported version {version}")
    idx_end = _HDR.size + n_pages * _IDX.size
    if len(data) < idx_end:
        raise SpdfError("SPDF: truncated index")
    offsets = []
    n_lines = []
    for p in range(n_pages):
        off, nl = _IDX.unpack_from(data, _HDR.size + p * _IDX.size)
        offsets.append(off)
        n_lines.append(nl)
    return SpdfHeader(
        n_pages=n_pages,
        offsets=tuple(offsets),
        n_lines=tuple(n_lines),
        body_start=idx_end,
    )


def read_page(data: bytes, header: SpdfHeader, page_index: int) -> list[str]:
    """Decode one page's lines; ``page_index`` must be 0-based in range."""
    if not (0 <= page_index < header.n_pages):
        raise SpdfError(f"SPDF: page {page_index} out of range")
    pos = header.body_start + header.offsets[page_index]
    lines = []
    for _ in range(header.n_lines[page_index]):
        if pos + _LEN.size > len(data):
            raise SpdfError("SPDF: truncated page body")
        (ln,) = _LEN.unpack_from(data, pos)
        pos += _LEN.size
        if pos + ln > len(data):
            raise SpdfError("SPDF: truncated line")
        try:
            lines.append(data[pos : pos + ln].decode("utf-8"))
        except UnicodeDecodeError as e:
            raise SpdfError(f"SPDF: bad utf-8 in line: {e}") from e
        pos += ln
    return lines


def read_all_pages(data: bytes) -> list[list[str]]:
    header = read_header(data)
    return [read_page(data, header, p) for p in range(header.n_pages)]
