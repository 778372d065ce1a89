"""Training-batch consumer adapter — the torch-side seam.

The reference's output surface is a collated batch iterator whose dict
collate skips ``__``-prefixed keys, keeps ``_``-prefixed keys as plain
Python lists (no tensorization), and stacks everything else
(/root/reference/src/chug/common/collate.py:27-43, consumed through
wds.batched in /root/reference/src/chug/wds/pipeline.py:109-118).

SURVEY §1.6 maps that surface to ``Dataset.iter_batches`` ("we never
leave Arrow"); this module is the thin adapter that mirrors the collate
KEY semantics on top of it for a torch-side consumer: a training loop
swaps ``np.stack`` results for tensors with one ``torch.as_tensor``
call per value. No torch import — the adapter stays numpy-only and the
stacking rules match torch's ``default_collate`` shape behavior."""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pyarrow as pa


def collate_arrow_batch(batch: pa.Table) -> dict[str, Any]:
    """Collate ONE Arrow batch into the reference's batch-dict shape.

    - ``__key``-style columns (``__``-prefixed) are dropped;
    - ``_``-prefixed columns stay Python lists of per-row values;
    - numeric / boolean / temporal columns stack to 1-D numpy arrays;
    - list columns of uniform length with numeric items stack to 2-D
      arrays (the tensor-batch shape), ragged or non-numeric lists stay
      Python lists;
    - strings/binary (torch keeps these un-tensorized too) stay lists.
    """
    out: dict[str, Any] = {}
    for name in batch.column_names:
        if name.startswith("__"):
            continue
        col = batch[name]
        if name.startswith("_"):
            out[name] = col.to_pylist()
            continue
        typ = col.type
        if (
            pa.types.is_integer(typ)
            or pa.types.is_floating(typ)
            or pa.types.is_boolean(typ)
            or pa.types.is_temporal(typ)
        ):
            if col.null_count and not pa.types.is_floating(typ):
                # a null in an int/bool column would silently promote
                # the whole batch to float64-with-NaN, flipping dtype
                # between batches and feeding NaN into the loss; stay a
                # Python list (torch's default_collate errors on None —
                # the consumer decides, the seam never masks it)
                out[name] = col.to_pylist()
            else:
                out[name] = col.to_numpy(zero_copy_only=False)
        elif (
            pa.types.is_list(typ)
            or pa.types.is_large_list(typ)
            or pa.types.is_fixed_size_list(typ)
        ) and (
            pa.types.is_integer(typ.value_type)
            or pa.types.is_floating(typ.value_type)
        ):
            # vectorized uniform check on the Arrow offsets — the hot
            # path (every batch of every epoch) must not allocate one
            # Python list + ndarray per row
            if isinstance(col, pa.ChunkedArray):
                arr = (
                    col.chunk(0)
                    if col.num_chunks == 1
                    else pa.concat_arrays(
                        col.chunks or [pa.array([], typ)]
                    )
                )
            else:
                arr = col
            if pa.types.is_fixed_size_list(typ):
                uniform = arr.null_count == 0
                width = typ.list_size
            else:
                offs = np.asarray(arr.offsets)
                lens = np.diff(offs)
                uniform = (
                    arr.null_count == 0
                    and len(lens) > 0
                    and bool((lens == lens[0]).all())
                )
                width = int(lens[0]) if len(lens) else 0
            if uniform and arr.values.null_count == 0:
                flat = arr.values.to_numpy(zero_copy_only=False)
                # a sliced array's .values returns the FULL unsliced
                # child buffer (both list kinds) — trim to the view
                if pa.types.is_fixed_size_list(typ):
                    start = arr.offset * width
                    flat = flat[start : start + len(arr) * width]
                else:
                    flat = flat[offs[0] : offs[-1]]
                out[name] = flat.reshape(len(arr), width)
            else:
                out[name] = col.to_pylist()  # ragged/null: per-row
        else:
            out[name] = col.to_pylist()
    return out


def iter_training_batches(
    ds,
    batch_size: int,
    *,
    drop_last: bool = False,
) -> Iterator[dict[str, Any]]:
    """Stream collated training batches off a ``ray.data.Dataset``.

    Thin wrapper over ``ds.iter_batches`` (streaming, backpressured —
    nothing materializes) applying :func:`collate_arrow_batch` to each
    Arrow batch. This is the intended integration point for a torch
    dataloader-style consumer of the extraction output."""
    for batch in ds.iter_batches(
        batch_size=batch_size,
        batch_format="pyarrow",
        drop_last=drop_last,
    ):
        yield collate_arrow_batch(batch)
