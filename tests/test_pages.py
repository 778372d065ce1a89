"""Page-selection semantics vs the reference (SURVEY.md §5.2.3).

Mirrors /root/reference/src/chug/doc/doc_processor.py:18-45 and
doc_read_processor.py:52-73 exactly, including quirks.
"""

import random

import pytest

from chug_ray.kernels.pages import (
    NoValidPagesError,
    PageScanError,
    get_next_valid_page_index,
    select_pages,
    select_pages_decodedoc,
)


def _reference_get_next_valid(current_index, num_pages, annos, retries=10):
    """Literal restatement of the reference scan for differential testing."""
    for _ in range(retries):
        current_index = (current_index + 1) % num_pages
        if annos[current_index]:
            return current_index
    raise RuntimeError


@pytest.mark.parametrize("seed", range(20))
def test_scan_differential_vs_reference(seed):
    rng = random.Random(seed)
    num_pages = rng.randint(1, 30)
    mask = [rng.random() < 0.6 for _ in range(num_pages)]
    start = rng.randrange(-1, num_pages)
    try:
        expected = _reference_get_next_valid(start, num_pages, mask)
    except RuntimeError:
        expected = None
    if expected is None:
        with pytest.raises(PageScanError):
            get_next_valid_page_index(start, num_pages, mask)
    else:
        assert get_next_valid_page_index(start, num_pages, mask) == expected


def test_first_returns_first_valid():
    assert select_pages("first", [False, False, True, True], random.Random(0)) == [2]


def test_first_more_than_ten_leading_invalid_fails():
    # reference: ≤10 retries from -1, so a valid page at index 12 is
    # unreachable and the doc errors out (quirk mirrored deliberately)
    mask = [False] * 12 + [True]
    with pytest.raises(NoValidPagesError):
        select_pages("first", mask, random.Random(0))


def test_all_valid_duplicates_on_wraparound():
    # reference all_valid runs the scan num_pages times; with invalid
    # pages present it wraps and revisits valid ones: [v,i,v] → [0,2,0]
    assert select_pages("all_valid", [True, False, True], random.Random(0)) == [0, 2, 0]


def test_all_valid_all_pages_valid_is_identity():
    assert select_pages("all_valid", [True] * 5, random.Random(0)) == [0, 1, 2, 3, 4]


def test_all_ignores_validity():
    assert select_pages("all", [True, False, True], random.Random(0)) == [0, 1, 2]


def test_all_empty_doc():
    with pytest.raises(NoValidPagesError):
        select_pages("first", [], random.Random(0))


def test_random_matches_reference_draw():
    # reference: current = rng.randrange(-1, num_pages - 1) then one scan
    mask = [True] * 7
    for seed in range(30):
        r1, r2 = random.Random(seed), random.Random(seed)
        got = select_pages("random", mask, r1)
        start = r2.randrange(-1, len(mask) - 1)
        expected = [_reference_get_next_valid(start, len(mask), mask)]
        assert got == expected


def test_random_single_page():
    assert select_pages("random", [True], random.Random(1)) == [0]


def test_all_valid_partial_on_scan_failure():
    # an 11-invalid-run mid-doc exhausts the retry budget; the partial
    # prefix of indices is kept (reference catches RuntimeError and keeps)
    mask = [True] + [False] * 11 + [True]
    got = select_pages("all_valid", mask, random.Random(0))
    assert got[0] == 0 and len(got) >= 1


def test_decodedoc_first_last_random():
    assert select_pages_decodedoc("first", 5, random.Random(0)) == [0]
    assert select_pages_decodedoc("last", 5, random.Random(0)) == [4]  # -1 % 5
    r1, r2 = random.Random(3), random.Random(3)
    assert select_pages_decodedoc("random", 5, r1) == [r2.choice(range(5))]


def test_unknown_policy():
    with pytest.raises(ValueError):
        select_pages("zigzag", [True], random.Random(0))
