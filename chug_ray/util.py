"""Deterministic hashing / RNG utilities.

All randomness in the engine is keyed by ``(job_seed, doc_id)`` through a
*stable* (process- and machine-independent) hash, so every result is
invariant to parallelism level, partitioning, iteration order, and resume.
This is a deliberate redesign of the reference's shared per-worker RNG
(``/root/reference/src/chug/doc/doc_processor.py:103-104``), whose output
depends on the order a worker happens to see samples — unreproducible in a
distributed setting (SURVEY.md §2.4 T3).
"""

from __future__ import annotations

import hashlib
import random


def stable_hash64(*parts: object) -> int:
    """64-bit stable hash of a tuple of str/int parts (blake2b-based).

    NOT Python's builtin ``hash`` — that is salted per process and would
    break cross-process determinism.
    """
    h = hashlib.blake2b(digest_size=8)
    for p in parts:
        h.update(str(p).encode("utf-8"))
        h.update(b"\x00")
    return int.from_bytes(h.digest(), "little")


def rng_for(seed: int | str, *parts: object) -> random.Random:
    """A ``random.Random`` deterministically keyed by (seed, *parts)."""
    return random.Random(stable_hash64(seed, *parts))


def round_away(x, digits: int = 4):
    """Vectorized half-away-from-zero rounding (numpy), matching SQL
    ``ROUND()`` — numpy's own ``round`` is half-to-even and would diverge
    from the DuckDB oracle on exact .5 boundaries."""
    import numpy as np

    factor = 10.0**digits
    return np.sign(x) * np.floor(np.abs(np.asarray(x, dtype=np.float64)) * factor + 0.5) / factor


def stable_hash_hex(*parts: object) -> str:
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(str(p).encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


def ray_session_key() -> str:
    """Identifier of the *current* Ray session, for keying driver-side
    caches of ``ray.put`` ObjectRefs: after a ``ray.shutdown()`` +
    ``ray.init()`` in the same process the old refs dangle, and a cache
    keyed only by path would hand them back. The anonymous namespace is
    a fresh UUID per driver session (job ids restart from 01000000 and
    would collide)."""
    import ray

    if not ray.is_initialized():
        return "uninitialized"
    return ray.get_runtime_context().namespace


def from_pandas_typed(df, string_cols=()):
    """``pa.Table.from_pandas`` with string columns pinned to arrow
    ``string``.

    pandas infers an EMPTY object column as arrow ``null``; a
    ``map_batches`` partial whose block filters/groups down to zero rows
    would then emit a block whose schema diverges from its non-empty
    siblings, corrupting the downstream union/groupby schema (the
    ``hot_band_rows`` / ``topk_partial`` latent class, fixed 48bfaa5).
    ``astype("string")`` yields the identical arrow type for empty and
    non-empty frames, so partials stay schema-stable on any block.
    """
    import pyarrow as pa

    cols = [
        c
        for c in string_cols
        if c in df.columns and df[c].dtype == object
    ]
    if cols:
        df = df.astype({c: "string" for c in cols})
    return pa.Table.from_pandas(df, preserve_index=False)
