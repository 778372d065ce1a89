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

The reference's named handlers (``log_and_continue`` etc.) are accepted
as ``error_policy`` aliases — :func:`normalize_policy` maps each to
skip/raise with the matching logging behavior, so reference configs
translate verbatim.
"""

from __future__ import annotations

import logging
import warnings

_log = logging.getLogger("chug_ray")

# reference handler name → (base policy, logger) — helpers.py:41-68:
# *_continue handlers return True (skip the sample), *_stop and
# reraise_exception propagate.
HANDLER_ALIASES = {
    "skip": ("skip", None),
    "raise": ("raise", None),
    "log_and_continue": ("skip", "log"),
    "ignore_and_continue": ("skip", None),
    "warn_and_continue": ("skip", "warn"),
    "ignore_and_stop": ("raise", None),
    "warn_and_stop": ("raise", "warn"),
    "reraise_exception": ("raise", None),
}


def normalize_policy(name: str) -> str:
    """Resolve an error-policy name (ours or a reference handler name) to
    the base policy, raising at plan time on unknown names."""
    if name not in HANDLER_ALIASES:
        raise ValueError(
            f"unknown error_policy {name!r}; expected one of "
            f"{sorted(HANDLER_ALIASES)}"
        )
    return HANDLER_ALIASES[name][0]


def plan_notice(policy_name: str) -> None:
    """One plan-time emission of a named handler's log/warn channel.

    The reference handlers log/warn once per failed sample; this engine
    records every failure in the row's ``err`` struct and the partition
    manifest counts instead (no row is silently lost), so the alias's
    side effect is announced once per pipeline build — per-row noise
    would add a driver round-trip per error for information the err
    channel already carries."""
    mode = HANDLER_ALIASES.get(policy_name, (None, None))[1]
    if mode == "log":
        _log.warning(
            "error_policy %r: failed rows are skipped into the err "
            "channel (see partition manifests for counts)",
            policy_name,
        )
    elif mode == "warn":
        warnings.warn(
            f"error_policy {policy_name!r}: failed rows are skipped "
            "into the err channel (see partition manifests for counts)",
            stacklevel=3,
        )


def report(policy_name: str, exn: Exception) -> None:
    """Emit the side-channel a named handler would (log/warn) for ONE
    failed row; the row-level skip/raise decision itself is the
    caller's. Used by embedding consumers that keep the alias name at
    run time — the built-in pipeline resolves aliases at plan time and
    announces via :func:`plan_notice` instead."""
    mode = HANDLER_ALIASES.get(policy_name, (None, None))[1]
    if mode == "log":
        _log.warning("skipping row after error: %r", exn)
    elif mode == "warn":
        warnings.warn(f"row error: {exn!r}", stacklevel=2)


class ExtractError(Exception):
    """A per-document extraction failure with a stage tag."""

    def __init__(self, stage: str, message: str):
        super().__init__(message)
        self.stage = stage
        self.message = message

    def as_struct(self) -> dict:
        return {"stage": self.stage, "error": self.message}
