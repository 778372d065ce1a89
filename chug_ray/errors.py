"""Row-level error policy.

The reference makes error handling a first-class operator parameter (a
named-handler registry, ``/root/reference/src/chug/wds/helpers.py:41-68``;
handler returning True ⇒ skip sample and continue). Our engine has two
policies (SURVEY.md §2.9):

* ``skip``  — the failed document survives as an output row with empty
  ``spans`` and a populated ``err`` struct (stage + message): an
  ``_errors`` side channel that flows into partition manifests, so no
  row is silently lost.
* ``raise`` — re-raise (tests / strict jobs).
"""

from __future__ import annotations


class ExtractError(Exception):
    """A per-document extraction failure with a stage tag."""

    def __init__(self, stage: str, message: str):
        super().__init__(message)
        self.stage = stage
        self.message = message

    def as_struct(self) -> dict:
        return {"stage": self.stage, "error": self.message}
