"""PII detection and redaction over a text column — the scrubbing
stage every web-scale training-data pipeline runs before anything else
(emails, phone numbers, IP addresses → typed placeholders).

Everything is Arrow-vectorized RE2 (``pc.count_substring_regex`` /
``pc.replace_substring_regex``): zero Python-per-row work, zero
shuffle — a pure map stage that streams at input bandwidth. DuckDB's
regexp functions are RE2 too, so the oracle runs the IDENTICAL
patterns and replacement order and the redacted text matches
byte-for-byte.

The synthetic corpus contains no PII, so the query variant PLANTS
deterministic PII derived from doc_id on a fixed residue class before
scrubbing — the same planting expression runs in the SQL oracle, so
the oracle checks detection counts AND the redacted text against real
matches, not a vacuous all-zeros corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# pattern order matters: emails first (their domains contain dots an
# IP pattern could claim), then IPs, then phones. Kept in one list so
# the Ray stage and the SQL oracle are generated from the same source.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ips", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phones", r"\b555-[0-9]{4}\b", "[PHONE]"),
]


def redact_batch(text: pa.Array) -> dict[str, pa.Array]:
    """Count and redact every PII pattern in one vectorized pass.
    Returns ``{"n_<kind>": int64 counts..., "redacted": string}``."""
    out: dict[str, pa.Array] = {}
    red = text
    for kind, pat, repl in PII_PATTERNS:
        out[f"n_{kind}"] = pc.cast(
            pc.count_substring_regex(red, pat), pa.int64()
        )
        red = pc.replace_substring_regex(red, pat, repl)
    out["redacted"] = red
    return out


def _plant(batch: pa.Table) -> pa.Table:
    """Deterministically append PII to docs with doc_id % 7 == 3 —
    mirrored verbatim by the SQL oracle's planting CTE."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    text = batch["text"].to_pylist()
    for i in np.flatnonzero(ids % 7 == 3):
        d = int(ids[i])
        text[i] = (
            f"{text[i]} contact user{d}@example.com or call "
            f"555-{d % 10000:04d} from 10.0.{d % 256}.1"
        )
    return pa.table(
        {"doc_id": batch["doc_id"], "text": pa.array(text, pa.string())}
    )


def pii_redact(sf_dir: str):
    """Per-document PII counts plus the redacted text (planted-PII
    corpus; see module docstring). Map-only: no shuffle, column-pruned
    read, RE2 kernels — streams at any scale."""
    import ray.data

    def scrub(batch: pa.Table) -> pa.Table:
        batch = _plant(batch)
        cols = redact_batch(batch["text"])
        return pa.table({"doc_id": batch["doc_id"], **cols})

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scrub, batch_format="pyarrow")


def pii_oracle_sql() -> str:
    """DuckDB mirror: identical planting expression, identical RE2
    patterns, identical replacement order."""
    plant = (
        "CASE WHEN doc_id % 7 = 3 THEN text || ' contact user' || "
        "CAST(doc_id AS VARCHAR) || '@example.com or call 555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' "
        "ELSE text END"
    )
    counts, red = [], "text"
    for kind, pat, repl in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({red}, '{pat}')) AS BIGINT)"
            f" AS n_{kind}"
        )
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
        WITH p AS (SELECT doc_id, {plant} AS text FROM documents)
        SELECT doc_id, {', '.join(counts)}, {red} AS redacted
        FROM p
    """
