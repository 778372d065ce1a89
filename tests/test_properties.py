"""Property-based kernel tests (SURVEY.md §5.2.5): container round-trips,
page-selection invariants, and parser totality/determinism on arbitrary
inputs (§7.4 "deterministic and total — never hang on adversarial
bytes")."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chug_ray.kernels import pages, simg, spdf
from chug_ray.kernels.html import extract_main_text

lines_st = st.lists(
    st.text(alphabet=st.characters(codec="utf-8"), max_size=40), max_size=6
)
pages_st = st.lists(lines_st, min_size=0, max_size=10)


@settings(max_examples=60, deadline=None)
@given(pages_st)
def test_spdf_roundtrip(doc_pages):
    payload = spdf.encode(doc_pages)
    header = spdf.read_header(payload)
    assert header.n_pages == len(doc_pages)
    assert list(header.n_lines) == [len(p) for p in doc_pages]
    for i, p in enumerate(doc_pages):
        assert spdf.read_page(payload, header, i) == p
    assert spdf.read_all_pages(payload) == doc_pages


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 64),
            st.integers(1, 64),
            st.integers(0, 2**32 - 1),
            st.lists(st.text(max_size=20), max_size=4),
        ),
        max_size=5,
    )
)
def test_simg_roundtrip(frame_specs):
    frames = [
        simg.Frame(w, h, seed, tuple(lines)) for w, h, seed, lines in frame_specs
    ]
    assert simg.decode(simg.encode(frames)) == frames


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_containers_total_on_garbage(data):
    """Arbitrary bytes either decode or raise the typed error — never
    hang, never raise anything else."""
    for decoder, err in ((spdf.read_all_pages, spdf.SpdfError),
                         (simg.decode, simg.SimgError)):
        try:
            decoder(data)
        except err:
            pass
        except UnicodeDecodeError:
            pass  # line bytes that aren't valid utf-8 — typed decode error


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.booleans(), min_size=1, max_size=30),
    st.sampled_from(pages.VALID_POLICIES),
    st.integers(0, 2**31 - 1),
)
def test_select_pages_invariants(valid_mask, policy, seed):
    rng = random.Random(seed)
    try:
        idx = pages.select_pages(policy, valid_mask, rng)
    except pages.NoValidPagesError:
        # only possible when no page is valid (or the scan gave up within
        # its 10-retry budget on a long mostly-invalid mask)
        assert not any(valid_mask) or len(valid_mask) > 10
        return
    assert idx, "selection must be non-empty when it returns"
    assert all(0 <= i < len(valid_mask) for i in idx)
    if policy == "all":
        assert idx == list(range(len(valid_mask)))
    else:
        assert all(valid_mask[i] for i in idx)
    if policy in ("first", "all_valid"):
        # deterministic policies: same inputs → same output
        assert idx == pages.select_pages(policy, valid_mask, random.Random(0))
    if policy == "first":
        assert len(idx) == 1 and idx[0] == valid_mask.index(True)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_html_extract_total_and_deterministic(source):
    a = extract_main_text(source)
    b = extract_main_text(source)
    assert a == b
    assert all(isinstance(x, str) for x in a)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(
    ["<div>", "</div>", "<p>", "</p>", "<script>", "</script>", "<a href=x>",
     "</a>", "text one two three. ", "<nav>", "</nav>", "<b", ">", "&amp;",
     "<!--", "-->", "<span class='x'>", "</span>"]),
    max_size=40,
))
def test_html_extract_total_on_tag_soup(parts):
    source = "".join(parts)
    assert extract_main_text(source) == extract_main_text(source)


def test_anti_join_with_empty_events_passes_all_customers(
    ray_session, tmp_path
):
    """ADVICE regression: an empty events table must early-return (every
    customer passes), not IndexError on the empty key array."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.relational import customers_without_events

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_mktsegment": pa.array(["A", "B", "A"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = customers_without_events(str(tmp_path)).take_all()
    assert sorted(r["c_custkey"] for r in out) == [1, 2, 3]


# --- Morton interleave: magic-number spread vs naive per-bit reference ---

import numpy as np

from chug_ray.ops.selection import _part1by1


def _part1by1_naive(v: int) -> int:
    out = 0
    for bit in range(16):
        out |= ((v >> bit) & 1) << (2 * bit)
    return out


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**16 - 1), min_size=1, max_size=64))
def test_part1by1_matches_naive_interleave(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    spread = _part1by1(arr)
    assert spread.tolist() == [_part1by1_naive(v) for v in vals]
    # interleaving two 16-bit halves is injective: codes round-trip
    x, y = arr[: len(arr) // 2], arr[len(arr) // 2 :]
    n = min(len(x), len(y))
    if n:
        code = (_part1by1(x[:n]) << np.uint64(1)) | _part1by1(y[:n])
        # de-interleave by collecting alternating bits
        def gather(c, phase):
            return sum(((int(c) >> (2 * b + phase)) & 1) << b for b in range(16))
        assert [gather(c, 1) for c in code] == x[:n].tolist()
        assert [gather(c, 0) for c in code] == y[:n].tolist()


# --- brace expansion: structural invariants on generated patterns ---

from chug_ray.urls import expand_braces

_atom = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), max_size=3
)


@st.composite
def _brace_patterns(draw):
    """Build a pattern from literal atoms, alternative groups and numeric
    ranges; return (pattern, expected_count)."""
    n_parts = draw(st.integers(1, 4))
    pattern, count = "", 1
    for _ in range(n_parts):
        kind = draw(st.sampled_from(["lit", "alts", "range"]))
        if kind == "lit":
            pattern += draw(_atom)
        elif kind == "alts":
            alts = draw(st.lists(_atom, min_size=2, max_size=4))
            pattern += "{" + ",".join(alts) + "}"
            count *= len(alts)
        else:
            lo = draw(st.integers(0, 30))
            hi = draw(st.integers(0, 30))
            pattern += "{%d..%d}" % (lo, hi)
            count *= abs(hi - lo) + 1
    return pattern, count


@settings(max_examples=100, deadline=None)
@given(_brace_patterns())
def test_expand_braces_count_and_shape(pat_count):
    pattern, count = pat_count
    out = expand_braces(pattern)
    assert len(out) == count
    assert all("{" not in u and "}" not in u for u in out)
    # no expansion groups → identity; deterministic across calls
    assert expand_braces(pattern) == out


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 50), st.integers(0, 50), st.integers(1, 3))
def test_expand_braces_zero_padded_range(lo, hi, width):
    a, b = str(lo).zfill(width), str(hi).zfill(width)
    out = expand_braces("s-{%s..%s}" % (a, b))
    step = 1 if hi >= lo else -1
    expect_w = width if (len(a) > len(str(lo)) or len(b) > len(str(hi))) else 0
    assert out == [
        "s-" + str(n).zfill(expect_w) for n in range(lo, hi + step, step)
    ]


def test_from_pandas_typed_schema_stability():
    """Empty partials keep arrow string for object columns (the
    all-filtered-block schema-divergence class), and listed columns
    that are NOT object dtype (e.g. an int label) are left untouched."""
    import pandas as pd
    import pyarrow as pa

    from chug_ray.util import from_pandas_typed

    df = pd.DataFrame({"k": ["a", "b"], "n": [1, 2]})
    full = from_pandas_typed(df, ("k",))
    empty = from_pandas_typed(df.iloc[0:0], ("k",))
    assert full.schema.field("k").type == pa.string()
    assert empty.schema.field("k").type == pa.string()  # not null
    assert empty.schema == full.schema

    ints = pd.DataFrame({"label": [3, 4], "v": [0.5, 1.5]})
    out = from_pandas_typed(ints, ("label",))
    assert out.schema.field("label").type == pa.int64()  # never cast
