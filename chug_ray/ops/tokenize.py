"""Tokenization operators (reference §2.12 re-expressed Ray-Data-first).

The reference binds an HF tokenizer once per worker process and maps
``tokenize → pad/truncate → target-mask`` per sample
(`/root/reference/src/chug/text/tokenization.py:42-96`); transformers is
absent here, so the tokenizer itself is a deterministic corpus vocab:
token = ``[a-z0-9]+`` over lowercased text, id = 1-based alphabetical
rank (pad = 0).  What carries over 1:1 is the *shape* of the ops:

* vocab built distributed (per-batch local dedup → global ``unique``),
  then ``ray.put`` once and read per actor — the broadcast-small-side
  pattern; a production run would ship a pre-trained vocab file the same
  way (reference loads ``AutoTokenizer`` per worker, tokenization.py:
  110-129).
* ``tokenize_ids`` — explode to ``(doc_id, pos, token_id)`` truncated at
  ``max_len`` (reference ``tokenize`` truncation, tokenization.py:42-58).
* ``text_targets`` — fixed-length grid per doc: pad positions → id 0,
  target = -100 on pads AND on every position ≤ the *last* occurrence of
  the doc's first token (the reference masks the prompt prefix up to the
  last ``prompt_end`` token and sets pad targets to -100,
  tokenization.py:7-39; our "prompt end token" is the doc's first token).

Both have exact DuckDB oracles in ``__ray_entry__``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = "[a-z0-9]+"
PAD_ID = 0
MASK_ID = -100


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


_VOCAB_CACHE: dict = {}


def build_vocab_ref(sf_dir: str):
    """Distributed vocab build → broadcast handle.

    Per-batch local dedup (the combiner) keeps the global ``unique``
    exchange small; the sorted vocab is ``ray.put`` once and cached per
    corpus dir, so every tokenization op over the same corpus reuses one
    broadcast object."""
    import ray

    from chug_ray.util import ray_session_key

    cache_key = (ray_session_key(), sf_dir)
    if cache_key in _VOCAB_CACHE:
        return _VOCAB_CACHE[cache_key]

    compiled = re.compile(TOKEN_RE)

    def local_unique(batch: pa.Table) -> pa.Table:
        seen = set()
        for text in batch["text"].to_pylist():
            seen.update(compiled.findall(text.lower()))
        return pa.table({"token": pa.array(sorted(seen), pa.string())})

    tokens = _docs(sf_dir).map_batches(local_unique, batch_format="pyarrow")
    vocab = {t: i + 1 for i, t in enumerate(sorted(tokens.unique("token")))}
    ref = ray.put(vocab)
    _VOCAB_CACHE[cache_key] = ref
    return ref


def save_vocab(sf_dir: str, path: str) -> str:
    """Materialize the corpus vocab as a JSON artifact (token → id).

    The production seam: a run over a huge corpus ships a pre-built
    vocab file exactly like the reference ships a tokenizer name to
    ``AutoTokenizer.from_pretrained`` per worker
    (`/root/reference/src/chug/text/tokenization.py:99-130`)."""
    import json

    import ray

    vocab = ray.get(build_vocab_ref(sf_dir))
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(vocab, f)
    return path


class TokenizerActor:
    """Stateful stage: vocab loaded + regex compiled once per actor
    (the reference's once-per-worker tokenizer load, T1).

    ``vocab_src`` is either a ``ray.put`` handle to the broadcast
    corpus-built vocab, or a *path* to a pre-built vocab JSON which each
    actor loads in ``__init__`` — the file seam removes the driver-side
    vocab build entirely at scale."""

    def __init__(self, vocab_src, max_len: int):
        if isinstance(vocab_src, str):
            import json

            with open(vocab_src) as f:
                self.vocab = json.load(f)
        else:
            import ray

            self.vocab = ray.get(vocab_src)
        self.max_len = max_len
        self.token_re = re.compile(TOKEN_RE)

    def _ids(self, text: str) -> list[int]:
        toks = self.token_re.findall(text.lower())[: self.max_len]
        return [self.vocab[t] for t in toks]


class TokenizeIds(TokenizerActor):
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, positions, ids = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for pos, tid in enumerate(self._ids(text)):
                doc_ids.append(doc_id)
                positions.append(pos)
                ids.append(tid)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(positions, pa.int64()),
                "token_id": pa.array(ids, pa.int64()),
            }
        )


class TextTargets(TokenizerActor):
    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        n = len(batch)
        max_len = self.max_len
        input_ids = np.full((n, max_len), PAD_ID, dtype=np.int64)
        targets = np.full((n, max_len), MASK_ID, dtype=np.int64)
        for r, text in enumerate(batch["text"].to_pylist()):
            ids = self._ids(text)
            if not ids:
                continue
            k = len(ids)
            arr = np.asarray(ids, dtype=np.int64)
            input_ids[r, :k] = arr
            targets[r, :k] = arr
            # prompt prefix mask: everything up to (incl.) the LAST
            # occurrence of the first token — reference masks through the
            # last prompt_end token (tokenization.py:7-9, 30-35)
            prompt_end = int(np.nonzero(arr == arr[0])[0].max())
            targets[r, : prompt_end + 1] = MASK_ID
        doc = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), max_len
        )
        pos = np.tile(np.arange(max_len, dtype=np.int64), n)
        return pd.DataFrame(
            {
                "doc_id": doc,
                "pos": pos,
                "input_id": input_ids.ravel(),
                "target_id": targets.ravel(),
            }
        )


def tokenize_ids(sf_dir: str, max_len: int = 32, vocab_path: str | None = None):
    """(doc_id, pos, token_id) — truncated tokenization to vocab ids.

    ``vocab_path`` points at a pre-built vocab JSON loaded per actor
    (the scale path); default builds + broadcasts the corpus vocab."""
    src = vocab_path if vocab_path else build_vocab_ref(sf_dir)
    return _docs(sf_dir).map_batches(
        TokenizeIds,
        fn_constructor_args=(src, max_len),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def text_targets(sf_dir: str, max_len: int = 32, vocab_path: str | None = None):
    """Fixed-length (doc_id, pos, input_id, target_id) grid with pad +
    prompt-prefix target masking."""
    src = vocab_path if vocab_path else build_vocab_ref(sf_dir)
    return _docs(sf_dir).map_batches(
        TextTargets,
        fn_constructor_args=(src, max_len),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
