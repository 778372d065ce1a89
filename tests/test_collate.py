"""Training-batch consumer adapter (chug_ray/collate.py) — mirrors the
reference collate key semantics (skip ``__`` keys, ``_`` keys as lists,
stack the rest; /root/reference/src/chug/common/collate.py:27-43)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chug_ray.collate import collate_arrow_batch, iter_training_batches


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "__key__": pa.array(["s0", "s1", "s2"]),
            "_parse": pa.array(
                [{"p": 1}, {"p": 2}, {"p": 3}],
                pa.struct([("p", pa.int64())]),
            ),
            "doc_id": pa.array(["a", "b", "c"]),
            "n_spans": pa.array([2, 0, 5], pa.int64()),
            "score": pa.array([0.5, 1.5, 2.5]),
            "embed": pa.array(
                [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                pa.list_(pa.float64()),
            ),
            "ragged": pa.array(
                [[1], [2, 3], []], pa.list_(pa.int64())
            ),
        }
    )


def test_collate_hand_built_expected_batch():
    out = collate_arrow_batch(_sample_table())
    # __-prefixed keys are skipped
    assert "__key__" not in out
    # _-prefixed keys stay Python lists, untouched per row
    assert out["_parse"] == [{"p": 1}, {"p": 2}, {"p": 3}]
    # numerics stack to 1-D arrays
    np.testing.assert_array_equal(out["n_spans"], np.array([2, 0, 5]))
    np.testing.assert_array_equal(
        out["score"], np.array([0.5, 1.5, 2.5])
    )
    # uniform numeric lists stack to the (batch, n) tensor shape
    np.testing.assert_array_equal(
        out["embed"], np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    )
    assert out["embed"].shape == (3, 2)
    # ragged lists and strings stay per-row Python lists
    assert out["ragged"] == [[1], [2, 3], []]
    assert out["doc_id"] == ["a", "b", "c"]


def test_iter_training_batches_streams(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "__key__": pa.array([f"k{i}" for i in range(10)]),
                "x": pa.array(list(range(10)), pa.int64()),
                "_meta": pa.array([str(i) for i in range(10)]),
            }
        )
    )
    batches = list(iter_training_batches(ds, batch_size=4))
    assert [len(b["x"]) for b in batches] == [4, 4, 2]
    assert all("__key__" not in b for b in batches)
    assert batches[0]["_meta"] == ["0", "1", "2", "3"]
    got = np.concatenate([b["x"] for b in batches])
    np.testing.assert_array_equal(np.sort(got), np.arange(10))
    # drop_last trims the tail partial batch
    full = list(iter_training_batches(ds, batch_size=4, drop_last=True))
    assert [len(b["x"]) for b in full] == [4, 4]


def test_collate_sliced_list_columns():
    """A sliced array's .values spans the FULL unsliced child buffer for
    both list kinds — collate must trim to the view (offset bug pin)."""
    var = pa.array(
        [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [6.0, 7.0]],
        pa.list_(pa.float64()),
    )
    fixed = var.cast(pa.list_(pa.float64(), 2))
    tbl = pa.table({"var": var, "fixed": fixed}).slice(1, 2)
    out = collate_arrow_batch(tbl)
    expect = np.array([[2.0, 3.0], [4.0, 5.0]])
    np.testing.assert_array_equal(out["var"], expect)
    np.testing.assert_array_equal(out["fixed"], expect)
    assert out["fixed"].shape == (2, 2)


# --- property: collate over arbitrary mixed tables (pure function) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _tables(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    cols = {
        "__skip": ["x"] * n,
        "_keep": draw(
            st.lists(st.text(max_size=5), min_size=n, max_size=n)
        ),
        "num": draw(
            st.lists(
                st.integers(min_value=-(2**40), max_value=2**40),
                min_size=n,
                max_size=n,
            )
        ),
        "txt": draw(
            st.lists(st.text(max_size=8), min_size=n, max_size=n)
        ),
        "lst": draw(
            st.lists(
                st.lists(
                    st.floats(allow_nan=False, allow_infinity=False,
                              width=64),
                    max_size=4,
                ),
                min_size=n,
                max_size=n,
            )
        ),
    }
    return pa.table(
        {
            "__skip": pa.array(cols["__skip"], pa.string()),
            "_keep": pa.array(cols["_keep"], pa.string()),
            "num": pa.array(cols["num"], pa.int64()),
            "txt": pa.array(cols["txt"], pa.string()),
            "lst": pa.array(cols["lst"], pa.list_(pa.float64())),
        }
    )


@settings(max_examples=60, deadline=None)
@given(_tables())
def test_collate_properties(tbl):
    out = collate_arrow_batch(tbl)
    n = len(tbl)
    assert "__skip" not in out
    assert out["_keep"] == tbl["_keep"].to_pylist()
    assert isinstance(out["num"], np.ndarray) and len(out["num"]) == n
    assert out["txt"] == tbl["txt"].to_pylist()
    rows = tbl["lst"].to_pylist()
    lens = {len(r) for r in rows}
    if n and len(lens) == 1:
        assert isinstance(out["lst"], np.ndarray)
        assert out["lst"].shape == (n, lens.pop())
    else:
        assert out["lst"] == rows
    # every non-__ column survives with all n rows, in order
    assert set(out) == {"_keep", "num", "txt", "lst"}
