"""HTML boilerplate-strip kernel (SURVEY.md §2.3 D9 semantics)."""

from chug_ray.kernels.html import extract_blocks, extract_main_text


def test_strips_structural_boilerplate():
    html = (
        "<html><head><style>p{}</style><script>x()</script></head><body>"
        "<nav><a href='/'>home</a><a href='/x'>about us now</a></nav>"
        "<header>site branding words here</header>"
        "<p>the actual main content paragraph with plenty of words</p>"
        "<footer>copyright words in the footer area</footer>"
        "</body></html>"
    )
    assert extract_main_text(html) == [
        "the actual main content paragraph with plenty of words"
    ]


def test_link_farm_dropped_by_link_density():
    html = (
        "<body><div><a href='1'>one link</a> <a href='2'>two link</a> "
        "<a href='3'>three link</a></div>"
        "<p>real content paragraph has enough words to keep</p></body>"
    )
    assert extract_main_text(html) == [
        "real content paragraph has enough words to keep"
    ]


def test_heading_kept_with_one_word():
    html = "<body><h1>Title</h1><p>body text with several words</p></body>"
    assert extract_main_text(html) == ["Title", "body text with several words"]


def test_short_non_heading_dropped():
    html = "<body><p>too short</p><p>this one is long enough</p></body>"
    assert extract_main_text(html) == ["this one is long enough"]


def test_inline_elements_merge():
    html = "<body><p>text with <b>bold</b> and <em>emphasis</em> inline</p></body>"
    assert extract_main_text(html) == ["text with bold and emphasis inline"]


def test_moderate_links_kept():
    html = (
        "<body><p>a paragraph that mentions <a href='/x'>a link</a> but is "
        "mostly prose with many ordinary words around it</p></body>"
    )
    assert len(extract_main_text(html)) == 1


def test_whitespace_normalized():
    html = "<body><p>spaced   out\n\n  words   here</p></body>"
    assert extract_main_text(html) == ["spaced out words here"]


def test_entities_resolved():
    html = "<body><p>salt &amp; pepper &lt;tags&gt; resolved fine</p></body>"
    assert extract_main_text(html) == ["salt & pepper <tags> resolved fine"]


def test_unclosed_tags_recovered():
    html = "<body><p>first paragraph never closed<p>second paragraph is here too"
    got = extract_main_text(html)
    assert got == ["first paragraph never closed", "second paragraph is here too"]


def test_document_order_preserved():
    html = (
        "<body><div><p>alpha block content words</p></div>"
        "<section><p>beta block content words</p>"
        "<p>gamma block content words</p></section></body>"
    )
    assert extract_main_text(html) == [
        "alpha block content words",
        "beta block content words",
        "gamma block content words",
    ]


def test_leaf_div_text_is_a_block():
    html = "<body><div>bare div text with sufficient words</div></body>"
    assert extract_main_text(html) == ["bare div text with sufficient words"]


def test_empty_and_garbage_inputs_are_total():
    assert extract_main_text("") == []
    assert extract_main_text("<<<>><p") == []
    assert extract_blocks("<p>" + "a" * 10) is not None


def test_list_items_extracted():
    html = (
        "<body><ul><li>first item with enough words</li>"
        "<li>second item with enough words</li></ul></body>"
    )
    assert extract_main_text(html) == [
        "first item with enough words",
        "second item with enough words",
    ]
