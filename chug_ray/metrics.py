"""Per-stage metrics extraction (SURVEY.md §7.1 ``metrics.py``).

Parses ``Dataset.stats()`` after a consumed execution into structured
per-operator rows (name, wall seconds, tasks, blocks) so the partition
driver can persist them in lineage manifests — the north rule's
"per-partition lineage + metrics" without any extra instrumentation in
the hot path.
"""

from __future__ import annotations

import re

_OP_RE = re.compile(
    r"^Operator (\d+) (.+?):(?: (\d+) tasks executed, (\d+) blocks produced)?"
    r"(?: in|.*?executed in) ([0-9.]+)s",
)


def stage_summaries(ds) -> list[dict]:
    """Structured per-operator summary of a consumed Dataset's last run.

    Returns ``[]`` when stats are unavailable (never raises — metrics
    must not fail a job)."""
    try:
        text = ds.stats() or ""
    except Exception:
        return []
    out = []
    for line in text.splitlines():
        m = _OP_RE.match(line.strip())
        if not m:
            continue
        idx, name, tasks, blocks, secs = m.groups()
        out.append(
            {
                "op": int(idx),
                "name": name.strip(),
                "wall_s": float(secs),
                "tasks": int(tasks) if tasks else None,
                "blocks": int(blocks) if blocks else None,
            }
        )
    return out
