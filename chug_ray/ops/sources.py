"""Source composition + projection operators (reference S2/S3, M4/M5/M9,
D8 re-expressed Ray-Data-first).

* ``shuffled_files`` — the plan-time analog of the reference's
  deterministic shard shuffle (`/root/reference/src/chug/wds/
  shardlists.py:10-59`): seeded permutation of the input file list
  before ``read_parquet``; the work itself is order-independent.
* ``weighted_union`` — the reference's weighted multi-source sampling
  (`shardlists.py:62-119`, config ``::``-joined sources) as a
  deterministic per-source hash-sample + ``Dataset.union``; keyed by
  row id, so the selection is invariant to partitioning/parallelism
  (the T3 redesign rule) and SQL-checkable.
* ``flatten_props`` — json member decode + flatten into the row
  (`/root/reference/src/chug/doc/doc_processor.py:184-190`,
  ``wds/filters.py:129-142``) with first-present-key-wins fallback
  (``doc_processor.py:48-56``).
* ``vqa_prompt`` — the doc-VQA prompt assembly
  (`/root/reference/src/chug/doc/doc_vqa_processor.py:66-105`):
  ``<s_question> q </s_question><s_answer>`` (+ answer in train mode);
  the reference's ``random.choice`` over answers becomes a
  deterministic keyed choice so output is partition-invariant.
"""

from __future__ import annotations

import json

import pyarrow as pa

from chug_ray.util import from_pandas_typed
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def shuffled_files(paths: list[str], seed: int) -> list[str]:
    """Deterministic seeded permutation of a file/shard list (plan-time)."""
    import random

    out = list(paths)
    random.Random(seed).shuffle(out)
    return out


def weighted_union(sf_dir: str, a_pct: int = 70, other_pct: int = 30):
    """Deterministic weighted union of two sources.

    Source A = ``src0`` documents sampled at ``a_pct``%, source B =
    the rest at ``other_pct``%; membership is ``doc_id % 100`` so any worker
    layout picks the same rows. At cluster scale each side is its own
    pruned read — no shuffle, union is streaming concat."""

    def sample(keep_a: bool, pct: int):
        def fn(batch: pa.Table) -> pa.Table:
            is_a = pc.equal(batch["source"], "src0")
            side = is_a if keep_a else pc.invert(is_a)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            in_pct = pa.array(ids % 100 < pct)
            return batch.filter(pc.and_(side, in_pct))

        return fn

    cols = ["doc_id", "source", "lang"]
    a = _read(sf_dir, "documents", cols).map_batches(
        sample(True, a_pct), batch_format="pyarrow"
    )
    other = _read(sf_dir, "documents", cols).map_batches(
        sample(False, other_pct), batch_format="pyarrow"
    )
    return a.union(other)


def flatten_props(sf_dir: str):
    """Decode the json ``props`` member and flatten it into the row, with
    multi-key priority fallback ``k;key;value`` → -1 when absent."""
    FALLBACK_KEYS = ("k", "key", "value")

    def fn(batch: pa.Table) -> pa.Table:
        ks = []
        for raw in batch["props"].to_pylist():
            try:
                obj = json.loads(raw) if raw else {}
            except json.JSONDecodeError:
                obj = {}
            if not isinstance(obj, dict):
                obj = {}  # scalar/list JSON: same fallback as malformed
            val = next(
                (obj[k] for k in FALLBACK_KEYS if k in obj and obj[k] is not None),
                -1,
            )
            try:
                ks.append(int(val))
            except (TypeError, ValueError):
                ks.append(-1)  # non-int-coercible value: lenient like the rest
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "k": pa.array(ks, pa.int64()),
            }
        )

    return _read(sf_dir, "events", ["event_id", "event_type", "props"]).map_batches(
        fn, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# hfds-shaped source (reference S6: hf-datasets loader re-expressed)
# --------------------------------------------------------------------------
# The reference's HF path (`/root/reference/src/chug/hfds/loader.py:32-189`)
# loads a dataset snapshot (parquet-backed), disables eager image/audio
# decode via cast_column, and wraps map-style access in SafeDataset
# (`hfds/wrappers.py:5-27`) which skips forward past corrupt rows.
# Ray-native equivalents: snapshots ARE parquet → read the split's shard
# files directly (decode-disable is inherent — binary columns stay opaque
# bytes in Arrow); SafeDataset's skip-forward becomes the engine's row
# error policy (failing rows are masked out of the batch and the pipeline
# continues — same observable stream as "retry with the next index").


def hfds_snapshot_files(snapshot_dir: str, split: str = "train") -> list[str]:
    """The parquet shards of one split in an HF-datasets-style snapshot
    (``data/{split}-NNNNN-of-NNNNN.parquet``, or flat in the root)."""
    import os

    for base in (os.path.join(snapshot_dir, "data"), snapshot_dir):
        if not os.path.isdir(base):
            continue
        files = sorted(
            os.path.join(base, f)
            for f in os.listdir(base)
            if f.startswith(f"{split}-") and f.endswith(".parquet")
        )
        if files:
            return files
    raise FileNotFoundError(
        f"no parquet shards for split {split!r} under {snapshot_dir}"
    )


def make_hfds_snapshot(
    src_parquet: str, dst_dir: str, split: str = "train", shards: int = 2
) -> str:
    """Materialize a parquet table as an HF-style snapshot dir (demo /
    test helper; a real snapshot comes from ``huggingface_hub``)."""
    import os

    import pyarrow.parquet as pq

    # crash-safe: build under a temp name, rename "data" into place last
    # (a partially written snapshot must never pass the isdir check)
    tmp_dir = os.path.join(dst_dir, "_data.tmp")
    data_dir = os.path.join(dst_dir, "data")
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    tbl = pq.read_table(src_parquet)
    n = tbl.num_rows
    per = (n + shards - 1) // shards
    for s in range(shards):
        pq.write_table(
            tbl.slice(s * per, per),
            os.path.join(tmp_dir, f"{split}-{s:05d}-of-{shards:05d}.parquet"),
        )
    os.rename(tmp_dir, data_dir)
    return dst_dir


def hfds_source(
    snapshot_dir: str,
    split: str = "train",
    columns=None,
    decode_fn=None,
    error_policy: str = "skip",
):
    """Read an HF-datasets-style parquet snapshot as a Dataset.

    ``decode_fn`` (row dict → row dict, schema-preserving) runs per row
    with SafeDataset semantics: under ``error_policy="skip"`` a raising
    row is dropped and the stream continues; ``"raise"`` propagates
    (test mode)."""
    from chug_ray.io import read_table_dataset

    ds = read_table_dataset(hfds_snapshot_files(snapshot_dir, split), columns=columns)
    if decode_fn is None:
        return ds

    def apply(batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            try:
                out_rows.append(decode_fn(row))
            except Exception:
                if error_policy == "raise":
                    raise
        return pa.Table.from_pylist(out_rows, schema=batch.schema)

    return ds.map_batches(apply, batch_format="pyarrow")


def _docs_snapshot(sf_dir: str) -> str:
    """The corpus's documents table as a cached HF-style snapshot dir
    (keyed on path + mtime so a regenerated corpus re-snapshots)."""
    import os

    from chug_ray.util import stable_hash_hex

    src = f"{sf_dir}/documents.parquet"
    snap = os.path.join(
        "/tmp/chug_ray_hfds", stable_hash_hex(src, os.path.getmtime(src))
    )
    if not os.path.isdir(os.path.join(snap, "data")):
        make_hfds_snapshot(src, snap)
    return snap


_DOC_COLS = ["doc_id", "lang", "source", "n_chars"]


def _project_docs(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "source": batch["source"],
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
        }
    )


def hfds_docs(sf_dir: str):
    """Documents round-tripped through a synthetic HF snapshot (cached
    per corpus) and read back via ``hfds_source`` — SQL-oracle-able
    because the snapshot holds exactly the documents rows."""
    return hfds_source(_docs_snapshot(sf_dir), columns=_DOC_COLS).map_batches(
        _project_docs, batch_format="pyarrow"
    )


# prompt template tokens — same shape as the reference defaults
# (doc_vqa_processor.py:21-24: '<s_question>', '</s_question><s_answer>')
Q_PRE = "<s_question>"
Q_SUF = "</s_question>"
A_PRE = "<s_answer>"
A_SUF = "</s_answer>"


def vqa_prompt(sf_dir: str):
    """Assemble train/eval VQA prompts per document (vectorized string
    concat). The answer pick over the candidate list [lang, source] is
    keyed on ``n_chars % 2`` — deterministic stand-in for the
    reference's ``random.choice(answers)`` (doc_vqa_processor.py:78)."""

    def fn(batch: pa.Table) -> pa.Table:
        question = pc.binary_join_element_wise(
            pa.array(["what is the language of doc"] * len(batch)),
            pc.cast(batch["doc_id"], pa.string()),
            " ",
        )
        pick_first = pa.array(
            batch["n_chars"].to_numpy(zero_copy_only=False) % 2 == 0
        )
        answer = pc.if_else(pick_first, batch["lang"], batch["source"])
        eval_prompt = pc.binary_join_element_wise(
            Q_PRE, question, Q_SUF, A_PRE, ""
        )
        train_prompt = pc.binary_join_element_wise(
            eval_prompt, answer, A_SUF, ""
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "question": question,
                "answer": answer,
                "prompt_eval": eval_prompt,
                "prompt_train": train_prompt,
            }
        )

    return _read(
        sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]
    ).map_batches(fn, batch_format="pyarrow")


def stratified_sample(sf_dir: str, rates: dict[str, int] | None = None):
    """Deterministic stratified sample: per-lang sampling rates applied
    via hash membership (``doc_id % 10 < rate_decile``), so the selection
    is invariant to partitioning/parallelism (the T3 determinism rule)
    and needs no shuffle — each batch filters itself. The per-stratum
    keep-rate table is the tiny side: a plan-time constant here, a
    broadcast dict when strata are dynamic."""
    # `is None`, not falsy: an explicit empty dict means "no overrides"
    rates = {"en": 5, "fr": 3} if rates is None else rates

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pylist()
        keep_rate = np.array([rates.get(l, 1) for l in langs], dtype=np.int64)
        return batch.filter(pa.array(ids % 10 < keep_rate))

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        fn, batch_format="pyarrow"
    )


def uniform_sample_k(sf_dir: str, k: int = 100):
    """Exact uniform k-sample without replacement, distributed: keep the
    k documents with the smallest ``md5(doc_id)`` — bottom-k hashing,
    the order-free equivalent of reservoir sampling. Each batch emits
    only its local bottom-k (one tiny row per candidate), the driver
    merges ``blocks × k`` short rows — never the corpus. Deterministic
    and exactly SQL-expressible (``ORDER BY md5(...) LIMIT k``), unlike
    an order-dependent reservoir."""
    import hashlib

    import numpy as np

    def local_bottom_k(batch: pa.Table) -> pa.Table:
        h = np.array(
            [
                hashlib.md5(str(d).encode()).hexdigest()
                for d in batch["doc_id"].to_pylist()
            ]
        )
        order = np.argsort(h, kind="stable")[:k]
        return batch.append_column("h", pa.array(h)).take(pa.array(order))

    def global_bottom_k(batch: pa.Table) -> pa.Table:
        order = np.argsort(
            batch["h"].to_numpy(zero_copy_only=False), kind="stable"
        )[:k]
        return batch.take(pa.array(order)).drop_columns(["h"])

    # the merge input is ≤ blocks × k short rows: repartition(1) makes
    # the final exact cut a single tiny task, not a driver loop
    return (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(local_bottom_k, batch_format="pyarrow")
        .repartition(1)
        .map_batches(global_bottom_k, batch_format="pyarrow")
    )


def _stream_shard_order(n_files: int, seed: int, epoch: int):
    """Deterministic shard permutation: ``epoch`` folds into the seed
    exactly like the reference's ``set_epoch`` reseeds the iterable.
    Pure function — pinned directly in tests."""
    import hashlib as _hl

    import numpy as np

    rng = np.random.default_rng(
        int.from_bytes(
            _hl.blake2b(
                f"hfds-stream:{seed}:{epoch}".encode(), digest_size=8
            ).digest(),
            "little",
        )
    )
    return rng.permutation(n_files)


def _buffer_shuffle_block(
    batch: pa.Table, seed: int, epoch: int, buffer_size: int
) -> pa.Table:
    """Keyed within-block buffer shuffle: rows permute inside
    ``buffer_size``-wide spans (a reservoir's displacement bound), RNG
    keyed on (seed, epoch, block shape + head content). Pure per-block
    — pinned directly in tests."""
    import hashlib as _hl

    import numpy as np

    head = str(batch.slice(0, 1).to_pylist())
    bseed = int.from_bytes(
        _hl.blake2b(
            f"{seed}:{epoch}:{batch.num_rows}:{head}".encode(),
            digest_size=8,
        ).digest(),
        "little",
    )
    brng = np.random.default_rng(bseed)
    idx = np.arange(batch.num_rows)
    for lo in range(0, batch.num_rows, buffer_size):
        span = idx[lo : lo + buffer_size]
        brng.shuffle(span)
    return batch.take(pa.array(idx))


def hfds_stream_source(
    snapshot_dir: str,
    split: str = "train",
    seed: int = 0,
    epoch: int = 0,
    buffer_size: int = 2000,
    columns=None,
    override_num_blocks=None,
):
    """Streaming-iterable read of an HF snapshot with the reference's
    ``streaming=True`` shuffle semantics re-expressed for Ray Data
    (reference: /root/reference/src/chug/hfds/loader.py:100-137 shard
    split + ``.shuffle(seed, buffer_size)``, wrappers.py:31-53
    ``set_epoch``):

    * **shard order**: :func:`_stream_shard_order` — a seeded
      permutation of the shard list, ``epoch`` folded into the seed
      like ``set_epoch``.
    * **buffer shuffle**: :func:`_buffer_shuffle_block` per block —
      rows move at most ``buffer_size`` positions within their block.

    Ordering contract (same level as the reference's multi-worker
    loader, whose buffer order is worker-count- and arrival-dependent):
    the *row set* is exactly the snapshot at every epoch
    (oracle-checked via set equality) and each component of the
    reordering is deterministic, but the globally observed order
    depends on Ray's block splits and completion order — set
    ``DataContext.execution_options.preserve_order`` and a fixed
    ``override_num_blocks`` on the read for bit-reproducible order.

    An infinite ``set_epoch`` training loop has no analog in a one-pass
    batch engine; epochs are explicit calls with different ``epoch``."""
    from chug_ray.io import read_table_dataset

    files = hfds_snapshot_files(snapshot_dir, split)
    order = _stream_shard_order(len(files), seed, epoch)
    ds = read_table_dataset(
        [files[i] for i in order],
        columns=columns,
        override_num_blocks=override_num_blocks,
    )

    def buffer_shuffle(batch: pa.Table) -> pa.Table:
        return _buffer_shuffle_block(batch, seed, epoch, buffer_size)

    # batch_size=None → whole-block batches (don't merge blocks in
    # scheduler-dependent arrival order before permuting)
    return ds.map_batches(
        buffer_shuffle, batch_format="pyarrow", batch_size=None
    )


def hfds_stream_docs(sf_dir: str, epoch: int = 1):
    """Documents via the streaming-shuffle snapshot path. The oracle is
    the same SELECT as ``hfds_docs``: the driver compare sorts rows, so
    a hash match proves the shuffled stream is exactly the document
    set (reordered, nothing dropped or duplicated)."""
    return hfds_stream_source(
        _docs_snapshot(sf_dir), seed=0, epoch=epoch, columns=_DOC_COLS
    ).map_batches(_project_docs, batch_format="pyarrow")


def temperature_mixture(sf_dir: str, alpha: float = 0.5, strength: float = 2.0):
    """Temperature-flattened source mixing — the data-mixing step of a
    multi-corpus pretraining pipeline: downsample abundant sources so
    the mixture follows ``p(source) ∝ count^alpha`` (alpha < 1 flattens,
    the multilingual-sampling rule), implemented as a per-source keep
    probability ``min(1, strength · count^(alpha-1))`` so rare sources
    survive untouched while head sources thin out.

    Scale shape: per-source counts come from one combiner groupby over
    the bounded source domain; the driver folds each probability into an
    integer hash threshold ``floor(p · 2^32)`` (float expression tree
    mirrored exactly by the SQL oracle — pow/multiply/floor only, no
    float sum anywhere, so the cut is bit-deterministic); the corpus
    then streams through a map-only hash filter
    (``(doc_id·2654435761) mod 2^32 < threshold``) — deterministic,
    partitioning-invariant, zero data shuffle."""
    import math

    import numpy as np
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .take_all()  # bounded: one row per source
    )
    thr = {
        r["source"]: int(
            math.floor(
                min(1.0, strength * math.pow(float(r["n"]), alpha - 1.0))
                * 4294967296.0
            )
        )
        for r in counts
    }

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        t = np.array(
            [thr.get(s, 0) for s in batch["source"].to_pylist()], np.uint64
        )
        return batch.filter(pa.array(h < t))

    return _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow"
    )


def sample_per_group(sf_dir: str, k: int = 10):
    """Exact per-group uniform k-sample without replacement: the k
    documents with the smallest ``md5(doc_id)`` WITHIN EACH lang — the
    stratified counterpart of :func:`uniform_sample_k` (equal absolute
    depth per stratum; :func:`stratified_sample` keeps proportions
    instead). Deterministic, seed-free, resharding-proof.

    Each batch emits its local per-group bottom-k (≤ |langs|·k tiny
    rows — the combiner), the single merge task cuts the global
    per-group k over ≤ blocks·|langs|·k rows. The grouped sort never
    touches the corpus; group count is the lang domain, documented
    bounded."""
    import hashlib

    import numpy as np
    import pandas as pd

    def local_bottom_k(batch: pa.Table) -> pa.Table:
        h = np.array(
            [
                hashlib.md5(str(d).encode()).hexdigest()
                for d in batch["doc_id"].to_pylist()
            ]
        )
        df = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "lang": batch["lang"].to_pandas(),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
                "h": h,
            }
        )
        top = df.sort_values(["lang", "h"], kind="stable").groupby(
            "lang", as_index=False
        ).head(k)
        return from_pandas_typed(top, ("lang",))

    def global_bottom_k(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        top = df.sort_values(["lang", "h"], kind="stable").groupby(
            "lang", as_index=False
        ).head(k)
        return from_pandas_typed(top.drop(columns=["h"]), ("lang",))

    return (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(local_bottom_k, batch_format="pyarrow")
        .repartition(1)  # merge input ≤ blocks·|langs|·k short rows
        .map_batches(global_bottom_k, batch_format="pyarrow")
    )
