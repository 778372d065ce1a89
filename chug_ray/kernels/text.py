"""Text-span assembly utilities.

Page text is the page's lines joined with ``line_break`` (default
``'\\n'``) — reference ``/root/reference/src/chug/doc/
doc_read_processor.py:121``. A page with a non-empty line list whose
lines are all empty strings yields ``''`` (and is still a valid page).
"""

from __future__ import annotations


def join_lines(lines: list[str], line_break: str = "\n") -> str:
    return line_break.join(lines)


def normalize_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces and strip — the HTML
    kernel's canonical text form."""
    return " ".join(text.split())
