"""Sequential pure-Python oracle + golden pinning (SURVEY.md §5.2).

The oracle runs the whole-document sequential extractor over a corpus,
one doc at a time, no Ray — the ground truth the distributed pipeline
must reproduce under span-sequence equality (kind, text, media_ref,
order). Goldens are additionally pinned as JSON in ``tests/goldens`` so
a regression in the shared kernels is caught too.
"""

from __future__ import annotations

import json

import pyarrow as pa

from chug_ray.config import CorpusConfig, ExtractConfig
from chug_ray.kernels.extract import extract_doc
from chug_ray.schema import spans_to_tuples
from chug_ray.synth import generate_corpus


def oracle_extract_table(
    docs: pa.Table, media: pa.Table, cfg: ExtractConfig
) -> list[dict]:
    payloads = dict(zip(media["media_ref"].to_pylist(), media["payload"].to_pylist()))
    out = []
    for doc_id, spans in zip(docs["doc_id"].to_pylist(), docs["spans"].to_pylist()):
        out.append(extract_doc(doc_id, spans or [], payloads.get, cfg))
    return out


def oracle_extract_corpus(corpus: CorpusConfig, cfg: ExtractConfig) -> list[dict]:
    docs, media = generate_corpus(corpus)
    return oracle_extract_table(docs, media, cfg)


def canonical(rows: list[dict]) -> dict[str, dict]:
    """doc_id → comparable form: span tuples + parse + err stage."""
    out = {}
    for r in rows:
        out[r["doc_id"]] = {
            "spans": spans_to_tuples(r["spans"]),
            "parse": (
                {
                    "num_pages": r["parse"]["num_pages"],
                    "page_indices": list(r["parse"]["page_indices"]),
                }
                if r.get("parse") is not None
                else None
            ),
            "err_stage": r["err"]["stage"] if r.get("err") is not None else None,
        }
    return out


def diff(expected: dict[str, dict], actual: dict[str, dict], limit: int = 10):
    """Human-readable differences between two canonical outputs."""
    problems = []
    for doc_id, exp in expected.items():
        act = actual.get(doc_id)
        if act is None:
            problems.append(f"{doc_id}: missing from actual")
        elif exp != act:
            problems.append(f"{doc_id}: mismatch\n  expected={exp}\n  actual  ={act}")
        if len(problems) >= limit:
            break
    extra = set(actual) - set(expected)
    if extra:
        problems.append(f"unexpected docs in actual: {sorted(extra)[:5]}")
    return problems


def golden_dump(rows: list[dict], path: str) -> None:
    serializable = [
        {
            "doc_id": r["doc_id"],
            "spans": [
                {k: s[k] for k in ("kind", "text", "media_ref", "offset")}
                for s in (r["spans"] or [])
            ],
            "parse": r["parse"],
            "err": r["err"],
        }
        for r in sorted(rows, key=lambda r: r["doc_id"])
    ]
    with open(path, "w") as f:
        json.dump(serializable, f, indent=0, sort_keys=True)


def golden_load(path: str) -> list[dict]:
    with open(path) as f:
        return json.load(f)
