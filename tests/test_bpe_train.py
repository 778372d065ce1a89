"""Distributed BPE merge induction pinned against a sequential
reference implementation, plus partition/row-order invariance.

The reference side is the classic sequential BPE loop (Sennrich-style:
word-frequency table, count adjacent symbol pairs, merge the argmax,
repeat) with the same tokenization, ``</w>`` end-marker, and
(count desc, left asc, right asc) tie-break as the distributed op."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from chug_ray.ops.tokenize import bpe_train

SF = "/root/testdata/sf0.001"
TOKEN_RE = re.compile(r"[a-z0-9]+")


def _sequential_bpe(sf_dir: str, n_merges: int, min_freq: int = 2):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    wc: Counter = Counter()
    for text in tbl["text"].to_pylist():
        wc.update(TOKEN_RE.findall(text.lower()))
    words = [
        (list(w[:-1]) + [w[-1] + "</w>"], n) for w, n in wc.items()
    ]
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in words:
            for l, r in zip(syms, syms[1:]):
                pairs[(l, r)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n_best = best
        if n_best < min_freq:
            break
        merges.append((rank, a, b, a + b, n_best))
        new_words = []
        for syms, n in words:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_words.append((merged, n))
        words = new_words
    return merges


def test_bpe_matches_sequential_reference(ray_session):
    got = bpe_train(SF, n_merges=12)
    want = _sequential_bpe(SF, n_merges=12)
    assert len(got) == len(want)
    got_rows = [
        (int(r["rank"]), r["left"], r["right"], r["merged"], int(r["n"]))
        for _, r in got.iterrows()
    ]
    assert got_rows == want
    # sanity: merges actually nest (later merges may consume earlier ones)
    assert len(want) == 12


def test_bpe_partitioning_invariance(ray_session, tmp_path):
    """Reversed row order + tiny row groups must yield the identical
    merge sequence — the pair-count reduction is integer-exact and the
    argmax tie-break is total."""
    src = pq.read_table(f"{SF}/documents.parquet")
    b_dir = tmp_path / "b"
    b_dir.mkdir()
    rev = src.take(list(range(src.num_rows - 1, -1, -1)))
    pq.write_table(
        rev, str(b_dir / "documents.parquet"), row_group_size=13
    )
    a = bpe_train(SF, n_merges=6)
    b = bpe_train(str(b_dir), n_merges=6)
    assert a.equals(b)
