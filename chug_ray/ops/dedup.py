"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard,
embedding-cosine near-dup.

Scale patterns (per the Ray guide / SURVEY.md §2.6):
* exact: content-hash in a vectorized ``map_batches`` →
  ``groupby(hash).aggregate(Min(doc_id))`` — one shuffle over (hash, id)
  pairs, never the texts.
* MinHash-LSH: per-batch numpy signatures → explode to
  (band, band_hash, doc_id) rows → ``groupby`` band buckets → candidate
  pairs → Jaccard verify. Only the tiny signature rows shuffle.
* blocked pairwise ops use an explicit blocking key (lang/source or
  label) so the quadratic part stays inside small groups.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from chug_ray.ops.textstats import TOKEN_RE
from chug_ray.util import round_away

_TOKEN_RE = re.compile(TOKEN_RE)

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str):
    """One surviving doc_id (the minimum) per distinct text."""
    from ray.data.aggregate import Count, Min

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"fp_md5": pa.array(fps, pa.string()), "doc_id": batch["doc_id"]}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups"))
    )


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(0xC0FFEE)  # fixed: signatures are stable
    a = rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.uint64)
    return a, b


def _minhash_signature(shingles: list[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    h = np.array(
        [
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in shingles
        ],
        dtype=np.uint64,
    )
    # (a*h + b) mod p, vectorized over perms × shingles (object math avoids
    # uint64 overflow; N_PERM×|shingles| stays small per doc)
    hh = h.astype(object)
    sig = np.empty(N_PERM, dtype=np.uint64)
    for i in range(N_PERM):
        sig[i] = np.uint64(((int(a[i]) * hh + int(b[i])) % _MERSENNE).min())
    return sig


class MinHasher:
    """Actor: permutation params built once, signatures per batch."""

    def __init__(self):
        self.a, self.b = _perm_params()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = _minhash_signature(_shingles(text), self.a, self.b)
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                bands.append(band)
                band_hashes.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
            }
        )


def _token_set(text: str) -> set:
    return set(_TOKEN_RE.findall(text.lower()))


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.6):
    """Near-dup candidate pairs via MinHash banding, Jaccard-verified.

    Verification joins texts back by broadcast (documents is the small
    side here; at scale this is a hash join of pairs × docs on doc_id).
    """
    import ray

    docs_tbl = (
        _docs(sf_dir, ["doc_id", "text"]).to_arrow_refs()
    )
    texts: dict[int, str] = {}
    for ref in docs_tbl:
        t = ray.get(ref)
        texts.update(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    texts_ref = ray.put(texts)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        rows = [
            {"doc_a": ids[i], "doc_b": ids[j]}
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        ]
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"])

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(texts_ref)
        jac = [
            _jaccard(_token_set(tx[a]), _token_set(tx[b]))
            for a, b in zip(batch["doc_a"], batch["doc_b"])
        ]
        batch = batch.assign(jaccard=round_away(jac, 4))
        return batch[batch["jaccard"] >= threshold]

    candidates = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 4))
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])  # dedup pairs found in multiple bands
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
    return candidates.map_batches(verify, batch_format="pandas")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8):
    """Blocked pairwise token-set Jaccard: pairs within the same
    (lang, source) block with similarity ≥ threshold. SQL-oracle-able."""

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sets = [_token_set(t) for t in g["text"]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = _jaccard(sets[i], sets[j])
                if jac >= threshold:
                    rows.append(
                        {
                            "doc_a": ids[i],
                            "doc_b": ids[j],
                            "jaccard": float(round_away(jac, 4)),
                        }
                    )
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    return (
        _docs(sf_dir, ["doc_id", "text", "lang", "source"])
        .groupby(["lang", "source"])
        .map_groups(block_pairs, batch_format="pandas")
    )


def embedding_near_dup(sf_dir: str, threshold: float = 0.3):
    """Embedding-cosine near-dup pairs, blocked by label (same-label
    pairs only — the explicit blocking key keeps the quadratic part
    inside groups)."""
    import ray.data

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        kept = sims[ii, jj][keep]
        # integer 1e-4 similarity units: float round() ulps differ between
        # engines, integers hash identically
        sim_e4 = (np.sign(kept) * np.floor(np.abs(kept) * 1e4 + 0.5)).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_a": ids[ii[keep]],
                "vec_b": ids[jj[keep]],
                "cos_sim_e4": sim_e4,
            },
            columns=["vec_a", "vec_b", "cos_sim_e4"],
        )

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return emb.groupby("label").map_groups(block_pairs, batch_format="pandas")
