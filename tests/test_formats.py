"""SPDF / SIMG container format unit tests (FIXTURES.md F2)."""

import pytest

from chug_ray.kernels import simg, spdf


def test_spdf_roundtrip():
    pages = [["line one", "line two"], [], ["única línea ünïcode"]]
    data = spdf.encode(pages)
    assert spdf.read_all_pages(data) == pages
    header = spdf.read_header(data)
    assert header.n_pages == 3
    assert header.valid_mask == (True, False, True)


def test_spdf_header_only_is_cheap():
    pages = [[f"l{i}"] for i in range(1000)]
    data = spdf.encode(pages)
    header = spdf.read_header(data)
    assert header.n_pages == 1000
    # random access to a late page without touching others
    assert spdf.read_page(data, header, 999) == ["l999"]


def test_spdf_empty_string_line_is_valid_page():
    # reference semantics: a page with a non-empty *list* of lines is valid
    # even if the joined text is '' (doc_processor.py:43)
    data = spdf.encode([[""]])
    header = spdf.read_header(data)
    assert header.valid_mask == (True,)
    assert spdf.read_page(data, header, 0) == [""]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[:3],  # truncated header
        lambda d: b"XPDF" + d[4:],  # bad magic
        lambda d: d[: len(d) // 2],  # truncated body/index
        lambda d: d[:4] + bytes([99]) + d[5:],  # bad version
    ],
)
def test_spdf_corruption_raises(mutate):
    data = spdf.encode([["hello world"], ["second page line"]])
    with pytest.raises(spdf.SpdfError):
        spdf.read_all_pages(mutate(data))


def test_spdf_out_of_range_page():
    data = spdf.encode([["x"]])
    header = spdf.read_header(data)
    with pytest.raises(spdf.SpdfError):
        spdf.read_page(data, header, 5)


def test_simg_roundtrip():
    frames = [
        simg.Frame(16, 8, 1234, ("a line", "b line")),
        simg.Frame(4, 4, 99, ()),
    ]
    data = simg.encode(frames)
    assert simg.decode(data) == frames


def test_simg_render_deterministic():
    f = simg.Frame(8, 6, 4242, ())
    a = simg.render_frame(f)
    b = simg.render_frame(f)
    assert a.shape == (6, 8)
    assert (a == b).all()


@pytest.mark.parametrize(
    "mutate",
    [lambda d: d[:2], lambda d: b"XIMG" + d[4:], lambda d: d[: len(d) - 3]],
)
def test_simg_corruption_raises(mutate):
    data = simg.encode([simg.Frame(8, 8, 7, ("text",))])
    with pytest.raises(simg.SimgError):
        simg.decode(mutate(data))
