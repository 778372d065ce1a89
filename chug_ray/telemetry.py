"""Group-size telemetry for the bucketed shuffle ops.

Every op that materializes per-key groups (`sessionize`,
`asof_last_order`, `minhash_lsh_pairs`, the pair-scan dedups) is
bounded only by its bucketing scheme; a skewed key at 100 TB shows up
as one giant group and an OOM long after the plan looked fine. The "no
silent caps" rule wants that visible *before* it kills a worker, so the
group functions report the largest group they see to a tiny named
actor (zero-cpu, one per session) and the driver reads a snapshot after
the run.

Reporting is throttled worker-side: a process only sends when it sees a
new local maximum for an op, so the actor receives O(log n) messages
per (op, worker), all fire-and-forget — the hot path never blocks.
A group above ``WARN_ROWS`` additionally logs a warning immediately
from the worker with the offending key.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

# above this, a group is a skew incident worth a live warning, not just
# a snapshot entry (tune per deployment; groups this size usually mean
# a hot key that needs salting or a tighter bucket mod)
WARN_ROWS = 500_000

# per-worker-process local maxima: {op: n}; the throttle state
_LOCAL_MAX: dict[str, int] = {}

_ACTOR_NAME = "chug_ray_group_telemetry"

# per-process cached handle (the actor itself is detached: a plain
# named actor dies as soon as every short-lived per-call handle drops)
_ACTOR_HANDLE = None


def _actor():
    import ray

    @ray.remote(num_cpus=0)
    class GroupTelemetry:
        """max group size per op, with the key that produced it."""

        def __init__(self):
            self._max: dict[str, tuple] = {}

        def record(self, op: str, key, n: int) -> None:
            cur = self._max.get(op)
            if cur is None or n > cur[1]:
                self._max[op] = (key, n)

        def snapshot(self) -> dict:
            return {
                op: {"key": k, "max_group_rows": n}
                for op, (k, n) in self._max.items()
            }

        def reset(self) -> None:
            self._max = {}

    global _ACTOR_HANDLE
    if _ACTOR_HANDLE is None:
        # explicit namespace: a detached actor in the default anonymous
        # namespace makes the raylet print a warning to stdout, which
        # can corrupt single-JSON-line protocols (bench.py, the driver)
        _ACTOR_HANDLE = GroupTelemetry.options(
            name=_ACTOR_NAME,
            get_if_exists=True,
            lifetime="detached",
            namespace="chug_ray",
        ).remote()
    return _ACTOR_HANDLE


def record_group(op: str, key, n: int) -> None:
    """Report one group's row count (call from inside map_groups)."""
    if n <= _LOCAL_MAX.get(op, 0):
        return
    _LOCAL_MAX[op] = n
    if n > WARN_ROWS:
        logger.warning(
            "%s: group %r holds %d rows (> %d) — skewed key; consider "
            "salting or a tighter bucket mod",
            op,
            key,
            n,
            WARN_ROWS,
        )
    try:
        import ray

        if ray.is_initialized():
            _actor().record.remote(op, key, n)
    except Exception:  # telemetry must never fail the data path
        logger.debug("group telemetry report failed", exc_info=True)


def snapshot() -> dict:
    """Driver-side read: {op: {key, max_group_rows}} seen this session."""
    import ray

    if not ray.is_initialized():
        return {}
    try:
        return ray.get(_actor().snapshot.remote())
    except Exception:
        return {}


def reset() -> None:
    """Clear the session's telemetry (tests)."""
    import ray

    global _LOCAL_MAX
    _LOCAL_MAX = {}
    if ray.is_initialized():
        try:
            ray.get(_actor().reset.remote())
        except Exception:
            pass
