"""URL planning: brace expansion, env substitution, multi-source strings.

Re-expresses the reference's URL machinery (M10 in SURVEY.md §2.2:
`/root/reference/src/chug/common/urls.py:10-87` and
`common/config.py:181-224`) as driver-side plan helpers feeding
``run.plan_partitions`` / the source readers. All from scratch — bash-style
brace expansion is implemented here rather than via the ``braceexpand``
package (absent in this environment).

Semantics:

* ``expand_braces("s-{0000..0003}.parquet")`` → 4 urls, zero-padding
  preserved; ``{a,b,c}`` alternation; nesting supported; both range
  directions; single-char alpha ranges (``{a..d}``).
* ``envsubst("${DATA}/x")`` substitutes each ``${VAR}`` from the
  environment trying ``WDS_VAR``, then ``CHUG_VAR``, then bare ``VAR``
  (the reference consults the ``WDS_``/``CHUG_`` prefixes; the bare
  fallback is our addition), iterating up to 10 rounds so substituted
  values may themselves contain ``${...}``. Missing variables raise
  ``KeyError``.
* ``split_sources("a::b", weights="1::2", num_samples="100::200")``
  splits ``::``-joined multi-source strings with per-source weights /
  sample counts (scalar weights broadcast), mirroring
  ``config.split_sources`` + ``expand_urls``: each source's urls are
  env-substituted then brace-expanded, and its weight is broadcast to
  every expanded url.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_ENV_PREFIXES = ("WDS_", "CHUG_", "")
_VAR_RE = re.compile(r"\$\{(\w+)\}")
_RANGE_RE = re.compile(r"^(-?\d+)\.\.(-?\d+)$")
_ALPHA_RANGE_RE = re.compile(r"^([a-zA-Z])\.\.([a-zA-Z])$")


def _env_value(name: str) -> str:
    for prefix in _ENV_PREFIXES:
        key = prefix + name
        if key in os.environ:
            return os.environ[key]
    raise KeyError(
        f"no WDS_{name} / CHUG_{name} / {name} in the environment"
    )


def envsubst(s: str, max_rounds: int = 10) -> str:
    """Substitute every ``${VAR}`` (prefix lookup, iterated).

    Raises when substitution stops making progress (circular env
    values) or exceeds ``max_rounds`` while ``${...}`` remain — an
    unresolved variable surfacing later as a FileNotFoundError on a
    literal '${DATA}/...' path is much harder to diagnose."""
    for _ in range(max_rounds):
        out = _VAR_RE.sub(lambda m: _env_value(m.group(1)), s)
        if out == s:
            break
        s = out
    if _VAR_RE.search(s):
        raise ValueError(
            f"unresolved ${{...}} after substitution: {s!r} — circular "
            "or too-deeply-nested environment values"
        )
    return s


def _find_group(s: str) -> tuple[int, int] | None:
    """(start, end) of the first balanced ``{...}`` group, else None."""
    start = s.find("{")
    while start != -1:
        depth = 0
        for i in range(start, len(s)):
            if s[i] == "{":
                depth += 1
            elif s[i] == "}":
                depth -= 1
                if depth == 0:
                    return start, i
        start = s.find("{", start + 1)
    return None


def _split_alternatives(body: str) -> list[str] | None:
    """Top-level comma split of a brace body; None when not alternation."""
    parts, depth, cur = [], 0, []
    has_comma = False
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            has_comma = True
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts if has_comma else None


def _expand_body(body: str) -> list[str] | None:
    """Expansions of one brace body, or None if it isn't expandable
    (bash leaves a non-pattern ``{...}`` literal)."""
    alts = _split_alternatives(body)
    if alts is not None:
        return alts
    m = _RANGE_RE.match(body)
    if m:
        a, b = m.group(1), m.group(2)
        width = 0
        if (a.lstrip("-") != str(int(a.lstrip("-")))) or (
            b.lstrip("-") != str(int(b.lstrip("-")))
        ):
            width = max(len(a.lstrip("-")), len(b.lstrip("-")))
        lo, hi = int(a), int(b)
        step = 1 if hi >= lo else -1
        nums = range(lo, hi + step, step)
        return [
            ("-" if n < 0 else "") + str(abs(n)).zfill(width) for n in nums
        ]
    m = _ALPHA_RANGE_RE.match(body)
    if m:
        a, b = ord(m.group(1)), ord(m.group(2))
        step = 1 if b >= a else -1
        return [chr(c) for c in range(a, b + step, step)]
    return None


def expand_braces(s: str) -> list[str]:
    """All bash-style expansions of ``s`` (left-to-right, recursive)."""
    grp = _find_group(s)
    if grp is None:
        return [s]
    start, end = grp
    head, body, tail = s[:start], s[start + 1 : end], s[end + 1 :]
    options = _expand_body(body)
    if options is None:
        # literal braces: keep them, expand only the tail
        return [head + "{" + body + "}" + t for t in expand_braces(tail)]
    out: list[str] = []
    for opt in options:
        for mid in expand_braces(opt):
            for t in expand_braces(mid + tail):
                out.append(head + t)
    return out


def expand_urls(
    urls: str | list[str], weights: float | str | list[float] | None = None
) -> tuple[list[str], list[float] | None]:
    """``::``-joined url string → flat expanded url list (+ per-url
    weights when given). Already-expanded lists pass through."""
    if not isinstance(urls, str):
        url_list = list(urls)
        if weights is None:
            return url_list, None
        if isinstance(weights, (int, float)):
            return url_list, [float(weights)] * len(url_list)
        if isinstance(weights, str):
            # same '::'-split parse as the string-urls branch — a bare
            # iteration would walk the string character by character
            weights = [float(w) for w in weights.split("::")]
        if len(weights) != len(url_list):
            raise ValueError(
                f"{len(url_list)} urls but {len(weights)} weights"
            )
        return url_list, [float(w) for w in weights]

    sources = urls.split("::")
    if weights is None:
        per_source: list[float | None] = [None] * len(sources)
    elif isinstance(weights, str):
        per_source = [float(w) for w in weights.split("::")]
    elif isinstance(weights, (int, float)):
        per_source = [float(weights)] * len(sources)
    else:
        per_source = [float(w) for w in weights]
    if len(per_source) != len(sources):
        raise ValueError(
            f"{len(sources)} sources but {len(per_source)} weights"
        )
    all_urls: list[str] = []
    all_weights: list[float] = []
    for src, w in zip(sources, per_source):
        expanded = expand_braces(envsubst(src))
        all_urls.extend(expanded)
        if w is not None:
            all_weights.extend([w] * len(expanded))
    return all_urls, (all_weights or None)


@dataclass
class SourceSpec:
    """One source of a multi-source string (mirrors the reference's
    SourceSpec: url pattern + optional sampling weight + sample count)."""

    url: str
    sampling_weight: float | None = None
    num_samples: int | None = None


def split_sources(
    source: str,
    sampling_weights: str | list[float] | None = None,
    num_samples: int | str | list[int] | None = None,
) -> tuple[list[SourceSpec], int | None]:
    """``::``-joined source string → per-source specs (+ total samples)."""
    parts = source.split("::")  # no '::' → [source] already
    n = len(parts)

    if sampling_weights is not None:
        if isinstance(sampling_weights, str):
            sampling_weights = [float(w) for w in sampling_weights.split("::")]
        if len(sampling_weights) != n:
            raise ValueError(
                f"{n} sources but {len(sampling_weights)} weights"
            )

    total: int | None = None
    per_samples: list[int | None] = [None] * n
    if num_samples is not None:
        if isinstance(num_samples, str):
            num_samples = [int(x) for x in num_samples.split("::")]
        if isinstance(num_samples, int):
            total = num_samples
        else:
            if len(num_samples) != n:
                raise ValueError(
                    f"{n} sources but {len(num_samples)} num_samples"
                )
            per_samples = list(num_samples)
            total = sum(num_samples)

    return [
        SourceSpec(
            url=parts[i],
            sampling_weight=None
            if sampling_weights is None
            else sampling_weights[i],
            num_samples=per_samples[i],
        )
        for i in range(n)
    ], total


def urldir(url: str) -> str:
    """Directory part of a url, scheme preserved (the reference's
    ``urldir``, `/root/reference/src/chug/wds/helpers.py:10-16`)."""
    from urllib.parse import urlparse

    parsed = urlparse(url)
    directory = os.path.dirname(parsed.path)
    return parsed._replace(path=directory).geturl()


def plan_files(pattern: str) -> list[str]:
    """Expand a source pattern to a concrete parquet file list: env
    substitution → brace expansion → per-entry directory listing. The
    driver-side planning step in front of ``ray.data.read_parquet``."""
    files: list[str] = []
    for url in expand_braces(envsubst(pattern)):
        if os.path.isdir(url):
            files.extend(
                sorted(
                    os.path.join(url, f)
                    for f in os.listdir(url)
                    if f.endswith(".parquet")
                )
            )
        else:
            files.append(url)
    return files
